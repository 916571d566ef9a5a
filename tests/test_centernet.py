"""CenterNet family: gaussian radius/targets, gaussian focal loss, and
the fused train / pooling-NMS eval steps (parity targets: reference
centernet_head.py / gaussian_target.py / gaussian_focal_loss.py, cited
in aod_meh_hua_tpu/models/centernet.py and engine/centernet.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_centernet_config


def _reference_radius(height, width, min_overlap):
    """Direct transcription of gaussian_target.py:166-186 (ground truth
    for the vectorized port)."""
    from math import sqrt

    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - sqrt(b1 ** 2 - 4 * c1)) / 2
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 - sqrt(b2 ** 2 - 16 * c2)) / 8
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (-b3 + sqrt(b3 ** 2 - 4 * a3 * c3)) / (2 * a3)
    return min(r1, r2, r3)


def test_gaussian_radius_matches_reference():
    from aod_meh_hua_tpu.engine.centernet import gaussian_radius

    rng = np.random.RandomState(0)
    for _ in range(50):
        h = float(rng.uniform(0.5, 60))
        w = float(rng.uniform(0.5, 60))
        ours = float(gaussian_radius(jnp.asarray(h), jnp.asarray(w), 0.3))
        np.testing.assert_allclose(ours, _reference_radius(h, w, 0.3),
                                   rtol=1e-5)


def test_targets_single_peak_window_and_center_values():
    from aod_meh_hua_tpu.engine.centernet import _targets_single

    cfg = tiny_centernet_config()
    g = cfg.max_gt
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_labels = np.zeros((g,), np.int32)
    gt_valid = np.zeros((g,), bool)
    gt_boxes[0] = [8, 8, 40, 40]  # center (24, 24) -> cell (6, 6), wh 8x8
    gt_labels[0] = 2
    gt_valid[0] = True
    heat, wh, off, wt = _targets_single(
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        cfg)
    heat = np.asarray(heat)
    assert heat[6, 6, 2] == 1.0  # exact peak (avg_factor counts these)
    assert heat[:, :, [0, 1, 3, 4, 5]].max() == 0.0
    r = int(_reference_radius(8.0, 8.0, 0.3))
    assert heat[6 + r + 1:, :, 2].max() == 0.0  # windowed paste
    assert heat[6 + r, 6, 2] > 0.0
    np.testing.assert_allclose(np.asarray(wh)[6, 6], [8.0, 8.0])
    np.testing.assert_allclose(np.asarray(off)[6, 6], [0.0, 0.0])
    assert float(np.asarray(wt).sum()) == 1.0
    # all-invalid -> empty targets
    h0, _, _, w0 = _targets_single(
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(np.zeros((g,), bool)), cfg)
    assert float(np.asarray(h0).max()) == 0.0
    assert float(np.asarray(w0).sum()) == 0.0


def test_gaussian_focal_loss_fixture():
    """Hand-computed: pos term at target==1, (1-t)^4-weighted neg."""
    from aod_meh_hua_tpu.engine.centernet import gaussian_focal_loss

    p = jnp.asarray([0.9, 0.2])
    t = jnp.asarray([1.0, 0.5])
    out = np.asarray(gaussian_focal_loss(p, t))
    exp_pos = -np.log(0.9 + 1e-12) * (1 - 0.9) ** 2
    exp_neg0 = 0.0  # (1-1)^4 = 0
    exp1 = -np.log(1 - 0.2 + 1e-12) * 0.2 ** 2 * 0.5 ** 4
    np.testing.assert_allclose(out[0], exp_pos + exp_neg0, rtol=1e-6)
    np.testing.assert_allclose(out[1], exp1, rtol=1e-6)


@pytest.fixture(scope="module")
def centernet_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.centernet import make_centernet_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_centernet_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_centernet_train_step(model, cfg, tx)
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


def test_centernet_train_step_runs_and_updates_bn(centernet_setup):
    cfg, state, train_step, eval_step, batch = centernet_setup
    own = jax.tree.map(jnp.array, state)
    before = np.asarray(own.batch_stats["backbone"]["bn1"]["mean"]).copy()
    state1, aux = train_step(own, batch)
    for k in ("loss", "loss_heatmap", "loss_wh", "loss_offset"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) == 2.0
    after = np.asarray(state1.batch_stats["backbone"]["bn1"]["mean"])
    assert not np.allclose(before, after)  # BN TRAINS (norm_eval=False)


def test_centernet_overfits_and_detects(centernet_setup):
    """300 steps recover both synthetic boxes as the top heatmap peaks
    with the right labels (IoU > 0.7, no box NMS)."""
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps
    from aod_meh_hua_tpu.engine.batch import EvalBatch

    cfg, state, train_step, eval_step, batch = centernet_setup
    state = jax.tree.map(jnp.array, state)
    for _ in range(300):
        state, aux = train_step(state, batch)
    assert float(aux["loss"]) < 0.5

    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, eb)
    bx, sc = np.asarray(dets.boxes), np.asarray(dets.scores)
    lb = np.asarray(dets.labels)
    for b, (gt, lab) in enumerate([([8, 8, 32, 32], 1), ([28, 30, 60, 62], 3)]):
        i = sc[b].argmax()
        iou = np.asarray(bbox_overlaps(jnp.asarray([gt], jnp.float32),
                                       jnp.asarray(bx[b, i:i + 1])))[0, 0]
        assert iou > 0.7, (b, bx[b, i], iou)
        assert lb[b, i] == lab
        assert sc[b, i] > 0.5
