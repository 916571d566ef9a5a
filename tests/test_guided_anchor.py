"""Guided Anchoring: loc-target parity vs a numpy transcription of the
reference's sequential rasterizer, approx-max-IoU assignment behavior,
guided-anchor decode, and end-to-end learnability.

Reference: /root/reference/mmdet/models/dense_heads/guided_anchor_head.py
(ga_loc_targets :372-475, _get_guided_anchors_single :344-370) +
core/bbox/assigners/approx_max_iou_assigner.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.engine.guided_anchor import (_ga_tables,
                                                  _guided_anchors,
                                                  _loc_targets_single)
from aod_meh_hua_tpu.utils.config import tiny_ga_config


def _np_calc_region(bbox, ratio, h, w):
    x1 = int(np.clip(np.round((1 - ratio) * bbox[0] + ratio * bbox[2]), 0, w - 1))
    y1 = int(np.clip(np.round((1 - ratio) * bbox[1] + ratio * bbox[3]), 0, h - 1))
    x2 = int(np.clip(np.round(ratio * bbox[0] + (1 - ratio) * bbox[2]), 0, w - 1))
    y2 = int(np.clip(np.round(ratio * bbox[1] + (1 - ratio) * bbox[3]), 0, h - 1))
    return x1, y1, x2, y2


def _ref_loc_targets(gt_boxes, cfg, sizes):
    """Transcription of ga_loc_targets for ONE image (center-wins form:
    positives applied after all ignores — see the engine docstring for
    the one write-order deviation)."""
    strides = list(cfg.strides)
    r1 = (1 - cfg.center_ratio) / 2
    r2 = (1 - cfg.ignore_ratio) / 2
    L = len(sizes)
    targets = [np.zeros(s, np.float32) for s in sizes]
    weights = [np.full(s, -1.0, np.float32) for s in sizes]
    ignore = [np.zeros(s, np.float32) for s in sizes]

    scale = np.sqrt((gt_boxes[:, 2] - gt_boxes[:, 0])
                    * (gt_boxes[:, 3] - gt_boxes[:, 1]))
    min_size = cfg.octave_base_scale * strides[0]
    lvls = np.clip(np.floor(np.log2(scale) - np.log2(min_size) + 0.5),
                   0, L - 1).astype(int)
    # all ignore regions first, then all centers (order-free dense form)
    for g, lvl in enumerate(lvls):
        h, w = sizes[lvl]
        gt = gt_boxes[g] / strides[lvl]
        x1, y1, x2, y2 = _np_calc_region(gt, r2, h, w)
        weights[lvl][y1:y2 + 1, x1:x2 + 1] = 0
        for d in (lvl - 1, lvl + 1):
            if 0 <= d < L:
                h2, w2 = sizes[d]
                gt2 = gt_boxes[g] / strides[d]
                x1, y1, x2, y2 = _np_calc_region(gt2, r2, h2, w2)
                ignore[d][y1:y2 + 1, x1:x2 + 1] = 1
    for g, lvl in enumerate(lvls):
        h, w = sizes[lvl]
        gt = gt_boxes[g] / strides[lvl]
        x1, y1, x2, y2 = _np_calc_region(gt, r1, h, w)
        targets[lvl][y1:y2 + 1, x1:x2 + 1] = 1
        weights[lvl][y1:y2 + 1, x1:x2 + 1] = 1
    for lvl in range(L):
        w_ = weights[lvl]
        w_[(w_ < 0) & (ignore[lvl] > 0)] = 0
        w_[w_ < 0] = 0.1
    return (np.concatenate([t.reshape(-1) for t in targets]),
            np.concatenate([w.reshape(-1) for w in weights]))


def test_loc_targets_match_reference():
    cfg = tiny_ga_config()
    sizes = cfg.featmap_sizes()
    g = cfg.max_gt
    boxes = np.zeros((g, 4), np.float32)
    # small (level 0), medium, large, cross-boundary
    boxes[0] = [10, 10, 40, 38]
    boxes[1] = [5, 20, 120, 60]
    boxes[2] = [0, 0, 127, 63]
    boxes[3] = [60, 8, 90, 30]
    valid = np.zeros((g,), bool)
    valid[:4] = True
    want_t, want_w = _ref_loc_targets(boxes[:4], cfg, sizes)
    got_t, got_w = _loc_targets_single(jnp.asarray(boxes), jnp.asarray(valid),
                                       cfg=cfg, sizes=sizes)
    np.testing.assert_array_equal(np.asarray(got_t), want_t)
    np.testing.assert_allclose(np.asarray(got_w), want_w)


def test_loc_targets_empty_image_all_low_weight_negatives():
    cfg = tiny_ga_config()
    sizes = cfg.featmap_sizes()
    g = cfg.max_gt
    t, w = _loc_targets_single(jnp.zeros((g, 4)), jnp.zeros((g,), bool),
                               cfg=cfg, sizes=sizes)
    assert float(jnp.abs(t).sum()) == 0.0
    np.testing.assert_allclose(np.asarray(w), 0.1)


def test_guided_anchor_decode_square_plus_shape():
    cfg = tiny_ga_config()
    squares, approxes, sizes = _ga_tables(cfg)
    a = squares.shape[0]
    assert approxes.shape == (a, cfg.approxs_per_cell, 4)
    shape = jnp.zeros((a, 2))
    ga = _guided_anchors(jnp.asarray(squares), shape)
    np.testing.assert_allclose(np.asarray(ga), squares, atol=1e-4)
    # dw = log(2) doubles the width, height unchanged
    shape = shape.at[:, 0].set(np.log(2.0))
    ga = np.asarray(_guided_anchors(jnp.asarray(squares), shape))
    w0 = squares[:, 2] - squares[:, 0]
    np.testing.assert_allclose(ga[:, 2] - ga[:, 0], 2 * w0, rtol=1e-5)
    np.testing.assert_allclose(ga[:, 3] - ga[:, 1],
                               squares[:, 3] - squares[:, 1], rtol=1e-5)


@pytest.fixture(scope="module")
def ga_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.guided_anchor import make_ga_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_ga_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_ga_train_step(model, cfg, tx)
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
    return cfg, state, train_step, eval_step, batch


def test_ga_overfits_and_detects(ga_setup):
    cfg, state, train_step, eval_step, batch = ga_setup
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(11)
    losses = []
    for _ in range(150):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
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
