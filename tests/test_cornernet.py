"""CornerNet family: corner pooling, corner targets, associative
embedding loss, soft-NMS, and the train/decode steps (parity targets:
reference corner_head.py / ae_loss.py / mmcv CornerPool, cited in
aod_meh_hua_tpu/models/cornernet.py and engine/cornernet.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_cornernet_config


def test_corner_pool_matches_sequential_scan():
    """corner_pool == the CUDA kernel's running-max semantics."""
    from aod_meh_hua_tpu.ops import corner_pool

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    ref = {
        "top": np.maximum.accumulate(x[:, ::-1], axis=1)[:, ::-1],
        "bottom": np.maximum.accumulate(x, axis=1),
        "left": np.maximum.accumulate(x[:, :, ::-1], axis=2)[:, :, ::-1],
        "right": np.maximum.accumulate(x, axis=2),
    }
    for d, want in ref.items():
        np.testing.assert_allclose(np.asarray(corner_pool(jnp.asarray(x), d)),
                                   want, rtol=1e-6)


def test_corner_targets_geometry():
    """tl/br peaks at the truncated scaled corners, sub-pixel offsets at
    the corner pixels, flat indices consistent (corner_head.py:420-462)."""
    from aod_meh_hua_tpu.engine.cornernet import corner_targets_single

    cfg = tiny_cornernet_config()
    g = cfg.max_gt
    boxes = np.zeros((g, 4), np.float32)
    labels = np.zeros((g,), np.int32)
    valid = np.zeros((g,), bool)
    boxes[0] = [10, 6, 45, 37]  # stride 4: tl (2.5, 1.5) -> (2, 1)
    labels[0] = 3
    valid[0] = True
    t = jax.tree.map(np.asarray, corner_targets_single(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid), cfg))
    assert t["tl_heat"][1, 2, 3] == 1.0          # (y=1, x=2)
    assert t["br_heat"][9, 11, 3] == 1.0         # br (11.25, 9.25) -> (11, 9)
    assert t["tl_heat"][:, :, [0, 1, 2, 4, 5]].max() == 0.0
    np.testing.assert_allclose(t["tl_off"][1, 2], [0.5, 0.5])
    np.testing.assert_allclose(t["br_off"][9, 11], [0.25, 0.25])
    assert t["tl_mask"].sum() == 1.0 and t["br_mask"].sum() == 1.0
    fw = cfg.input_size // cfg.out_stride
    assert t["tl_idx"][0] == 1 * fw + 2
    assert t["br_idx"][0] == 9 * fw + 11
    # all-invalid: empty heatmaps and masks
    t0 = jax.tree.map(np.asarray, corner_targets_single(
        jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(np.zeros(g, bool)), cfg))
    assert t0["tl_heat"].max() == 0.0 and t0["tl_mask"].sum() == 0.0


def test_ae_loss_pull_push():
    """Hand case vs ae_loss.py:10-72: two objects, known embeddings."""
    from aod_meh_hua_tpu.engine.cornernet import _ae_loss_single

    fh = fw = 4
    tl = np.zeros((fh, fw), np.float32)
    br = np.zeros((fh, fw), np.float32)
    # object A: tl at (0,0)=1.0, br at (1,1)=3.0 -> mean 2, pull (1+1)=2
    # object B: tl at (2,2)=2.0, br at (3,3)=2.0 -> mean 2, pull 0
    tl[0, 0], br[1, 1] = 1.0, 3.0
    tl[2, 2], br[3, 3] = 2.0, 2.0
    tl_idx = np.array([0 * fw + 0, 2 * fw + 2, 0], np.int32)
    br_idx = np.array([1 * fw + 1, 3 * fw + 3, 0], np.int32)
    valid = np.array([True, True, False])
    pull, push = _ae_loss_single(jnp.asarray(tl), jnp.asarray(br),
                                 jnp.asarray(tl_idx), jnp.asarray(br_idx),
                                 jnp.asarray(valid),
                                 pull_weight=1.0, push_weight=1.0)
    np.testing.assert_allclose(float(pull), (2.0 + 0.0) / 2, rtol=1e-6)
    # push: means equal -> relu(1 - 0) = 1 for both ordered pairs; /N(N-1)=2
    np.testing.assert_allclose(float(push), 1.0, rtol=1e-6)
    # single object: push must be exactly 0
    v1 = np.array([True, False, False])
    _, push1 = _ae_loss_single(jnp.asarray(tl), jnp.asarray(br),
                               jnp.asarray(tl_idx), jnp.asarray(br_idx),
                               jnp.asarray(v1), 1.0, 1.0)
    assert float(push1) == 0.0


def test_soft_nms_gaussian_decays_duplicates():
    from aod_meh_hua_tpu.engine.cornernet import soft_nms_gaussian

    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    labels = jnp.zeros(3, jnp.int32)
    idx, sel, ok = soft_nms_gaussian(boxes, scores, labels, 3)
    idx, sel = np.asarray(idx), np.asarray(sel)
    assert idx[0] == 0 and sel[0] == pytest.approx(0.9)
    # the exact duplicate decays by exp(-1/0.5) ~= 0.135 -> 0.108,
    # so the far box (0.7) is selected second
    assert idx[1] == 2 and sel[1] == pytest.approx(0.7)
    assert idx[2] == 1 and sel[2] == pytest.approx(0.8 * np.exp(-1 / 0.5), rel=1e-4)
    # different class: no suppression between classes
    labels2 = jnp.asarray([0, 1, 0], jnp.int32)
    _, sel2, _ = soft_nms_gaussian(boxes, scores, labels2, 3)
    assert np.asarray(sel2)[1] == pytest.approx(0.8)


@pytest.fixture(scope="module")
def cornernet_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.cornernet import make_cornernet_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_cornernet_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.005, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_cornernet_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:32, 8:32] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [8, 8, 32, 32]
    labels[0, 0] = 1
    images[1, 30:62, 28:60] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [28, 30, 60, 62]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, state, train_step, eval_step, batch


def test_cornernet_train_step_runs_and_updates_bn(cornernet_setup):
    cfg, state, train_step, eval_step, batch = cornernet_setup
    own = jax.tree.map(jnp.array, state)
    before = np.asarray(
        own.batch_stats["backbone"]["stem_conv"]["bn"]["mean"]).copy()
    state1, aux = train_step(own, batch)
    for k in ("loss", "loss_det", "loss_off", "loss_pull", "loss_push"):
        assert np.isfinite(float(aux[k])), k
    after = np.asarray(state1.batch_stats["backbone"]["stem_conv"]["bn"]["mean"])
    assert not np.allclose(before, after)  # hourglass BN trains


def test_cornernet_overfits_and_detects(cornernet_setup):
    """400 steps recover both synthetic boxes from paired corners."""
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg, state, train_step, eval_step, batch = cornernet_setup
    state = jax.tree.map(jnp.array, state)
    for _ in range(400):
        state, aux = train_step(state, batch)
    assert float(aux["loss"]) < 2.0

    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, eb)
    bx, sc = np.asarray(dets.boxes), np.asarray(dets.scores)
    lb, ok = np.asarray(dets.labels), np.asarray(dets.valid)
    for b, (gt, lab) in enumerate([([8, 8, 32, 32], 1), ([28, 30, 60, 62], 3)]):
        i = np.where(ok[b], sc[b], -np.inf).argmax()
        iou = np.asarray(bbox_overlaps(jnp.asarray([gt], jnp.float32),
                                       jnp.asarray(bx[b, i:i + 1])))[0, 0]
        assert iou > 0.5, (b, bx[b, i], iou)
        assert lb[b, i] == lab
