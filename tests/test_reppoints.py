"""RepPoints family: dense PointAssigner, moment transform, deformable
sampling conv, and the two-stage point train/eval steps (parity
targets: reference reppoints_head.py / point_assigner.py, cited in
aod_meh_hua_tpu/models/reppoints.py and engine/reppoints.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_reppoints_config


def test_point_assign_semantics():
    """Level routing + nearest-point + earlier-gt-wins-ties
    (point_assigner.py:72-121)."""
    from aod_meh_hua_tpu.engine.reppoints import point_assign

    # two levels: stride 8 (4 points) and stride 16 (2 points)
    pts = np.array([
        [0, 0, 8], [8, 0, 8], [0, 8, 8], [8, 8, 8],
        [0, 0, 16], [16, 0, 16],
    ], np.float32)
    # gt A: 32x32 box -> lvl = log2(32/4) = 3 -> stride-8 level;
    # centered at (6, 6): nearest stride-8 point is (8, 8)
    gt = np.array([[(6 - 16), (6 - 16), (6 + 16), (6 + 16)],
                   [0, 0, 0, 0]], np.float32)
    valid = np.array([True, False])
    a = np.asarray(point_assign(jnp.asarray(pts), jnp.asarray(gt),
                                jnp.asarray(valid),
                                jnp.ones(len(pts), bool), scale=4, pos_num=1))
    assert a[3] == 1 and (a == 1).sum() == 1  # exactly pos_num positives
    assert (a[[0, 1, 2, 4, 5]] == 0).all()

    # identical second gt: the tie goes to the EARLIER gt
    gt2 = np.stack([gt[0], gt[0]])
    a2 = np.asarray(point_assign(jnp.asarray(pts), jnp.asarray(gt2),
                                 jnp.asarray(np.array([True, True])),
                                 jnp.ones(len(pts), bool), 4, 1))
    assert a2[3] == 1

    # a 130x130 gt -> lvl clamps to the coarsest (stride 16)
    big = np.array([[0, 0, 130, 130], [0, 0, 0, 0]], np.float32)
    a3 = np.asarray(point_assign(jnp.asarray(pts), jnp.asarray(big),
                                 jnp.asarray(valid),
                                 jnp.ones(len(pts), bool), 4, 1))
    assert a3[:4].max() == 0 and a3[4:].max() == 1


def test_points2bbox_moment():
    from aod_meh_hua_tpu.engine.reppoints import points2bbox_moment

    pts = np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 3.0]], np.float32)
    box = np.asarray(points2bbox_moment(jnp.asarray(pts), jnp.zeros(2)))
    mx, my = 1.0, 1.0
    sx = np.std(pts[:, 0], ddof=1)  # torch.std: unbiased
    sy = np.std(pts[:, 1], ddof=1)
    np.testing.assert_allclose(box, [mx - sx, my - sy, mx + sx, my + sy],
                               rtol=1e-5)


def test_deform_conv_zero_offsets_is_plain_conv():
    """With zero dcn offsets the deformable conv samples the integer
    3x3 taps: must equal lax.conv with the same kernel (zero padding)."""
    from aod_meh_hua_tpu.models.reppoints import DeformConv3x3, _BASE_YX

    rng = np.random.RandomState(0)
    x = rng.randn(1, 6, 7, 4).astype(np.float32)
    off = np.zeros((1, 6, 7, 18), np.float32)
    m = DeformConv3x3(features=5)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(off))
    y = np.asarray(m.apply(v, jnp.asarray(x), jnp.asarray(off)))

    k9 = np.asarray(v["params"]["kernel"])  # [9, Cin, Cout]
    hwio = np.zeros((3, 3, 4, 5), np.float32)
    for k in range(9):
        ky, kx = _BASE_YX[k]
        hwio[ky + 1, kx + 1] = k9[k]
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(hwio), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(ref) + np.asarray(v["params"]["bias"])
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def reppoints_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.reppoints import make_reppoints_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_reppoints_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_reppoints_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:40, 8:56] = rng.randn(32, 48, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [8, 8, 56, 40]
    labels[0, 0] = 1
    images[1, 20:60, 60:124] = rng.randn(40, 64, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [60, 20, 124, 60]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, state, train_step, eval_step, batch


def test_reppoints_train_step_runs(reppoints_setup):
    cfg, state, train_step, eval_step, batch = reppoints_setup
    own = jax.tree.map(jnp.array, state)
    mt_before = np.asarray(own.params["head"]["moment_transfer"]).copy()
    state1, aux = train_step(own, batch)  # donates `own`
    for k in ("loss", "loss_cls", "loss_pts_init", "loss_pts_refine"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) >= 2.0
    # moment_transfer is trainable (moment_mul gradient path)
    mt_after = np.asarray(state1.params["head"]["moment_transfer"])
    assert np.isfinite(mt_after).all()
    assert not np.array_equal(mt_before, mt_after)


def test_reppoints_overfits_and_detects(reppoints_setup):
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg, state, train_step, eval_step, batch = reppoints_setup
    state = jax.tree.map(jnp.array, state)
    for _ in range(250):
        state, aux = train_step(state, batch)
    assert float(aux["loss"]) < 1.0

    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, eb)
    bx, sc = np.asarray(dets.boxes), np.asarray(dets.scores)
    lb, ok = np.asarray(dets.labels), np.asarray(dets.valid)
    for b, (gt, lab) in enumerate([([8, 8, 56, 40], 1), ([60, 20, 124, 60], 3)]):
        i = np.where(ok[b], sc[b], -np.inf).argmax()
        iou = np.asarray(bbox_overlaps(jnp.asarray([gt], jnp.float32),
                                       jnp.asarray(bx[b, i:i + 1])))[0, 0]
        assert iou > 0.5, (b, bx[b, i], iou)
        assert lb[b, i] == lab
        assert sc[b, i] > 0.3
