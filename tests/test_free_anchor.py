"""FreeAnchor: bag-likelihood loss parity vs a numpy transcription of the
reference, padded-gt invariance, and end-to-end learnability.

Reference: /root/reference/mmdet/models/dense_heads/
free_anchor_retina_head.py:53-270 (loss, positive_bag_loss,
negative_bag_loss)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.engine.free_anchor import _free_anchor_loss_single
from aod_meh_hua_tpu.utils.config import tiny_free_anchor_config


def _np_iou(a, b):
    """Pairwise IoU [N, M] (torch bbox_overlaps semantics)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-6)


def _np_decode(anchors, deltas, stds):
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    d = deltas * np.asarray(stds)
    ncx = cx + d[:, 0] * w
    ncy = cy + d[:, 1] * h
    nw = w * np.exp(d[:, 2])
    nh = h * np.exp(d[:, 3])
    return np.stack([ncx - nw / 2, ncy - nh / 2, ncx + nw / 2, ncy + nh / 2],
                    axis=1)


def _np_encode(anchors, gts, stds):
    w = anchors[..., 2] - anchors[..., 0]
    h = anchors[..., 3] - anchors[..., 1]
    cx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    cy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    gw = np.maximum(gts[..., 2] - gts[..., 0], 1e-6)
    gh = np.maximum(gts[..., 3] - gts[..., 1], 1e-6)
    gcx = (gts[..., 0] + gts[..., 2]) * 0.5
    gcy = (gts[..., 1] + gts[..., 3]) * 0.5
    t = np.stack([(gcx - cx) / w, (gcy - cy) / h,
                  np.log(gw / w), np.log(gh / h)], axis=-1)
    return t / np.asarray(stds)


def _np_free_anchor_loss(cls_prob, deltas, anchors, gts, labels, cfg):
    """Numpy transcription of free_anchor_retina_head.py loss() for one
    image with >= 1 gt (no sparse tensors — per-class max via loop)."""
    t1 = cfg.bbox_thr
    pred = _np_decode(anchors, deltas, cfg.target_stds)
    iou = _np_iou(gts, pred)
    t2 = np.maximum(iou.max(axis=1, keepdims=True), t1 + 1e-12)
    obj_prob = np.clip((iou - t1) / (t2 - t1), 0, 1)
    image_box_prob = np.zeros_like(cls_prob)
    for i, lab in enumerate(labels):
        image_box_prob[:, lab] = np.maximum(image_box_prob[:, lab],
                                            obj_prob[i])

    quality = _np_iou(gts, anchors)
    matched = np.argsort(-quality, axis=1)[:, :cfg.pre_anchor_topk]
    mcls = cls_prob[matched, labels[:, None]]
    mt = _np_encode(anchors[matched], gts[:, None, :], cfg.target_stds)
    diff = np.abs(deltas[matched] - mt)
    b = cfg.smooth_l1_beta
    sl1 = np.where(diff < b, 0.5 * diff * diff / b, diff - 0.5 * b)
    mbox = np.exp(-cfg.bbox_loss_weight * sl1.sum(-1))
    mp = mcls * mbox
    w = 1 / np.clip(1 - mp, 1e-12, None)
    w = w / w.sum(axis=1, keepdims=True)
    bag = (w * mp).sum(axis=1)
    pos = (cfg.focal_alpha * -np.log(np.clip(bag, 1e-12, 1 - 1e-12))).sum()

    prob = np.clip(cls_prob * (1 - image_box_prob), 1e-12, 1 - 1e-12)
    neg = ((1 - cfg.focal_alpha) * prob ** cfg.focal_gamma
           * -np.log(1 - prob)).sum()
    return pos, neg


def test_loss_matches_reference_transcription():
    cfg = tiny_free_anchor_config(max_gt=4)
    rng = np.random.RandomState(0)
    a = 120
    anchors = rng.uniform(0, 50, (a, 2))
    anchors = np.concatenate([anchors, anchors + rng.uniform(4, 30, (a, 2))],
                             axis=1).astype(np.float32)
    cls_prob = rng.uniform(0.01, 0.95, (a, cfg.num_classes)).astype(np.float32)
    deltas = (rng.randn(a, 4) * 0.2).astype(np.float32)
    gts = np.array([[5, 5, 30, 40], [20, 10, 60, 50]], np.float32)
    labels = np.array([1, 4], np.int32)

    want_pos, want_neg = _np_free_anchor_loss(cls_prob, deltas, anchors, gts,
                                              labels, cfg)
    g = cfg.max_gt
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_boxes[:2] = gts
    gt_labels = np.zeros((g,), np.int32)
    gt_labels[:2] = labels
    gt_valid = np.zeros((g,), bool)
    gt_valid[:2] = True
    pos, neg, ng = _free_anchor_loss_single(
        jnp.asarray(cls_prob), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        cfg)
    assert float(ng) == 2
    np.testing.assert_allclose(float(pos), want_pos, rtol=1e-4)
    np.testing.assert_allclose(float(neg), want_neg, rtol=1e-4)


def test_padded_gt_rows_change_nothing():
    cfg4 = tiny_free_anchor_config(max_gt=4)
    cfg8 = tiny_free_anchor_config(max_gt=8)
    rng = np.random.RandomState(1)
    a = 80
    anchors = rng.uniform(0, 40, (a, 2))
    anchors = np.concatenate([anchors, anchors + rng.uniform(4, 20, (a, 2))],
                             axis=1).astype(np.float32)
    cls_prob = rng.uniform(0.01, 0.95, (a, cfg4.num_classes)).astype(np.float32)
    deltas = (rng.randn(a, 4) * 0.2).astype(np.float32)

    def run(cfg):
        g = cfg.max_gt
        gt_boxes = np.zeros((g, 4), np.float32)
        gt_boxes[0] = [5, 5, 25, 30]
        gt_labels = np.zeros((g,), np.int32)
        gt_labels[0] = 3
        gt_valid = np.zeros((g,), bool)
        gt_valid[0] = True
        return _free_anchor_loss_single(
            jnp.asarray(cls_prob), jnp.asarray(deltas), jnp.asarray(anchors),
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_valid), cfg)

    p4, n4, _ = run(cfg4)
    p8, n8, _ = run(cfg8)
    np.testing.assert_allclose(float(p4), float(p8), rtol=1e-6)
    np.testing.assert_allclose(float(n4), float(n8), rtol=1e-6)


@pytest.fixture(scope="module")
def free_anchor_setup():
    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.free_anchor import (
        make_free_anchor_eval_step,
        make_free_anchor_train_step,
    )
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_free_anchor_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_free_anchor_train_step(model, cfg, tx)
    eval_step = make_free_anchor_eval_step(model, cfg)

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
    return cfg, state, train_step, eval_step, batch


def test_free_anchor_overfits_and_detects(free_anchor_setup):
    cfg, state, train_step, eval_step, batch = free_anchor_setup
    state = jax.tree.map(jnp.array, state)
    losses = []
    for _ in range(150):
        state, aux = train_step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

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
        m = valid[i] & (scores[i] > 0.2)
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
