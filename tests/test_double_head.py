"""Double-Head R-CNN: RoI rescale geometry, head structure, learnability.

Reference: /root/reference/mmdet/models/roi_heads/double_roi_head.py
(+ bbox_heads/double_bbox_head.py, configs/double_heads/*.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import tiny_double_head_config


def test_scale_rois_geometry():
    from aod_meh_hua_tpu.engine.two_stage import _scale_rois

    rois = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    out = np.asarray(_scale_rois(rois, 1.3))
    # center preserved, extents * 1.3 (roi_rescale semantics)
    np.testing.assert_allclose((out[0, 0] + out[0, 2]) / 2, 20.0)
    np.testing.assert_allclose((out[0, 1] + out[0, 3]) / 2, 40.0)
    np.testing.assert_allclose(out[0, 2] - out[0, 0], 26.0)
    np.testing.assert_allclose(out[0, 3] - out[0, 1], 52.0)


@pytest.fixture(scope="module")
def dh_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.two_stage import make_double_head_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_double_head_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_double_head_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 10:34, 20:44] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [20, 10, 44, 34]
    labels[0, 0] = 2
    images[1, 20:52, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [60, 20, 92, 52]
    labels[1, 0] = 4
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, model, state, train_step, eval_step, batch


def test_double_head_structure(dh_setup):
    cfg, model, state, _, _, _ = dh_setup
    head = state.params["bbox_head"]
    assert "res_block" in head and "conv_branch_0" in head
    assert "fc_branch_0" in head and "fc_cls" in head and "fc_reg" in head
    # conv branch BN is trainable state
    assert "bbox_head" in state.batch_stats


def test_double_head_bn_updates_and_overfits(dh_setup):
    cfg, model, state, train_step, eval_step, batch = dh_setup
    state = jax.tree.map(jnp.array, state)
    bn0 = jax.tree.leaves(state.batch_stats["bbox_head"])[0].copy()
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(120):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    bn1 = jax.tree.leaves(state.batch_stats["bbox_head"])[0]
    assert not np.allclose(np.asarray(bn0), np.asarray(bn1))  # BN trained

    from aod_meh_hua_tpu.engine import EvalBatch

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step(variables, eb)
    boxes = np.asarray(dets.boxes)
    labels = np.asarray(dets.labels)
    scores = np.asarray(dets.scores)
    valid = np.asarray(dets.valid)
    for i, (gt, lab) in enumerate([(batch.gt_boxes[0, 0], 2),
                                   (batch.gt_boxes[1, 0], 4)]):
        m = valid[i] & (scores[i] > 0.3)
        assert m.any(), f"image {i}: no confident detection"
        top = np.argmax(np.where(m, scores[i], -1))
        assert labels[i][top] == lab
        bx = boxes[i][top]
        x1 = max(bx[0], gt[0]); y1 = max(bx[1], gt[1])
        x2 = min(bx[2], gt[2]); y2 = min(bx[3], gt[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        union = ((bx[2] - bx[0]) * (bx[3] - bx[1])
                 + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
        assert inter / union > 0.5, f"image {i}: IoU {inter / union}"
