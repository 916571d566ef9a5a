"""Dynamic R-CNN: hyperparameter adaptation mechanics + learnability.

Reference: /root/reference/mmdet/models/roi_heads/dynamic_roi_head.py
(iou/beta histories, update_hyperparameters) with
configs/dynamic_rcnn/dynamic_rcnn_r50_fpn_1x_coco.py settings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import tiny_dynamic_rcnn_config


@pytest.fixture(scope="module")
def dyn_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.two_stage import make_dynamic_rcnn_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_dynamic_rcnn_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_dynamic_rcnn_train_step(model, cfg, tx)
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


def test_hyperparameters_adapt(dyn_setup):
    """After update_iter_interval steps the assigner threshold moves to
    max(initial_iou, mean IoU stat) and beta to min(initial_beta, median
    beta stat) — and they stay fixed between refreshes."""
    cfg, model, state, train_step, _, batch = dyn_setup
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(3)
    seen = []
    for i in range(cfg.update_iter_interval + 1):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
        seen.append((float(aux["iou_thr"]), float(aux["beta"])))
    initial = seen[0]
    assert all(s == initial for s in seen[:cfg.update_iter_interval])
    final_iou, final_beta = seen[-1]
    assert final_iou >= cfg.initial_iou
    assert final_beta <= cfg.initial_beta
    # the beta stat is a small positive |xy| quantile: it must have moved
    assert final_beta < initial[1] or final_iou != initial[0]
    dyn = state.batch_stats["__dynamic_rcnn__"]
    assert np.isfinite(float(dyn["iou_thr"]))
    assert float(dyn["beta"]) > 0


def test_dynamic_rcnn_overfits_and_detects(dyn_setup):
    cfg, model, state, train_step, eval_step, batch = dyn_setup
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(120):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    from aod_meh_hua_tpu.engine import EvalBatch

    # eval with the dynamic entry still in batch_stats (flax ignores
    # collections the modules never read)
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
