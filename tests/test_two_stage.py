"""Faster R-CNN family: RoIAlign, sampler, grouped NMS, IoU losses, and
the fused two-stage train/eval steps (reference parity targets cited in
each module's docstring)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.ops import (
    ciou_loss,
    diou_loss,
    giou_loss,
    grouped_nms,
    iou_loss,
    map_roi_levels,
    multilevel_roi_align,
    random_sample_pos_neg,
    roi_align,
)
from aod_meh_hua_tpu.utils.config import tiny_faster_rcnn_config


# --------------------------------------------------------------------------
# RoIAlign
# --------------------------------------------------------------------------


def _np_bilinear(feat, y, x):
    h, w, _ = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1])
    y = min(max(y, 0.0), h - 1.0)
    x = min(max(x, 0.0), w - 1.0)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (feat[y0, x0] * (1 - ly) * (1 - lx) + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx) + feat[y1, x1] * ly * lx)


def _np_roi_align(feat, rois, out_size, scale, n):
    """Independent loop transcription of the torchvision/mmcv aligned
    RoIAlign rules (half-pixel offset, per-bin n x n bilinear average)."""
    r = len(rois)
    c = feat.shape[-1]
    out = np.zeros((r, out_size, out_size, c))
    for k, roi in enumerate(rois):
        x1 = roi[0] * scale - 0.5
        y1 = roi[1] * scale - 0.5
        bw = (roi[2] * scale - 0.5 - x1) / out_size
        bh = (roi[3] * scale - 0.5 - y1) / out_size
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(c)
                for py in range(n):
                    for px in range(n):
                        y = y1 + (i + (py + 0.5) / n) * bh
                        x = x1 + (j + (px + 0.5) / n) * bw
                        acc += _np_bilinear(feat, y, x)
                out[k, i, j] = acc / (n * n)
    return out


def test_roi_align_matches_reference_rules():
    rng = np.random.RandomState(0)
    feat = rng.randn(12, 16, 3).astype(np.float32)
    rois = np.array([
        [0.0, 0.0, 8.0, 6.0],
        [2.5, 1.5, 14.0, 11.0],
        [-2.0, -2.0, 4.0, 4.0],     # partially outside: zero-padded samples
        [10.0, 8.0, 30.0, 30.0],    # spills past the border
        [3.0, 3.0, 3.6, 3.6],       # sub-pixel roi
    ], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               out_size=4, spatial_scale=1.0, sampling_ratio=2))
    want = _np_roi_align(feat, rois, 4, 1.0, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_roi_align_spatial_scale():
    rng = np.random.RandomState(1)
    feat = rng.randn(8, 8, 2).astype(np.float32)
    rois = np.array([[4.0, 4.0, 28.0, 24.0]], np.float32)  # image coords
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               out_size=2, spatial_scale=0.25, sampling_ratio=2))
    want = _np_roi_align(feat, rois, 2, 0.25, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_map_roi_levels():
    # sqrt-area thresholds at finest_scale=56: <112 -> 0, <224 -> 1, ...
    rois = jnp.asarray([
        [0, 0, 50, 50],      # 50 -> level 0
        [0, 0, 150, 150],    # 150 -> level 1
        [0, 0, 300, 300],    # 300 -> level 2
        [0, 0, 600, 600],    # 600 -> level 3 (clamped)
        [0, 0, 10000, 10000],
    ], jnp.float32)
    lvls = np.asarray(map_roi_levels(rois, 4))
    np.testing.assert_array_equal(lvls, [0, 1, 2, 3, 3])


def test_multilevel_roi_align_routes_by_scale():
    rng = np.random.RandomState(2)
    feats = [jnp.asarray(rng.randn(32 // (2 ** i), 32 // (2 ** i), 2)
                         .astype(np.float32)) for i in range(4)]
    strides = (4, 8, 16, 32)
    rois = jnp.asarray([[0, 0, 60, 60], [0, 0, 500, 500]], jnp.float32)
    out = multilevel_roi_align(feats, rois, strides, out_size=2)
    # row 0 must equal the level-0 single-level result, row 1 the level-3 one
    l0 = roi_align(feats[0], rois, 2, 1.0 / 4, 2)
    l3 = roi_align(feats[3], rois, 2, 1.0 / 32, 2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(l0[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(l3[1]), rtol=1e-5)


# --------------------------------------------------------------------------
# RandomSampler
# --------------------------------------------------------------------------


def test_random_sampler_counts_and_order():
    key = jax.random.PRNGKey(0)
    assigned = jnp.asarray([0] * 50 + [1] * 3 + [-1] * 10 + [2] * 2, jnp.int32)
    valid = jnp.ones((65,), bool)
    s = random_sample_pos_neg(key, assigned, valid, 16, 0.25)
    # 5 positives < 4 expected? num_expected_pos = 4 -> sample 4 of 5
    assert int(s.num_pos) == 4
    assert bool(s.valid.all())
    # positives occupy the first slots, negatives the rest
    assert bool(s.is_pos[:4].all()) and not bool(s.is_pos[4:].any())
    got = np.asarray(assigned)[np.asarray(s.inds)]
    assert (got[:4] > 0).all() and (got[4:] == 0).all()
    # ignored (-1) candidates are never sampled
    assert not np.isin(np.asarray(s.inds), np.arange(53, 63)).any()


def test_random_sampler_underfull_and_determinism():
    key = jax.random.PRNGKey(3)
    assigned = jnp.asarray([1, 0, 0, -1], jnp.int32)
    valid = jnp.ones((4,), bool)
    s = random_sample_pos_neg(key, assigned, valid, 8, 0.5)
    assert int(s.num_pos) == 1
    assert int(s.valid.sum()) == 3  # 1 pos + 2 neg available
    s2 = random_sample_pos_neg(key, assigned, valid, 8, 0.5)
    np.testing.assert_array_equal(np.asarray(s.inds), np.asarray(s2.inds))


def test_random_sampler_is_uniform_enough():
    # every negative should be picked sometimes across keys
    assigned = jnp.zeros((10,), jnp.int32)
    valid = jnp.ones((10,), bool)
    seen = set()
    for k in range(30):
        s = random_sample_pos_neg(jax.random.PRNGKey(k), assigned, valid, 3, 0.5)
        seen.update(np.asarray(s.inds)[np.asarray(s.valid)].tolist())
    assert seen == set(range(10))


# --------------------------------------------------------------------------
# Grouped (level-id) NMS
# --------------------------------------------------------------------------


def test_grouped_nms_groups_do_not_suppress():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    groups = jnp.asarray([0, 0, 1], jnp.int32)
    valid = jnp.ones((3,), bool)
    out = grouped_nms(boxes, scores, groups, valid, iou_thr=0.5, max_out=3)
    kept = np.asarray(out.anchor_idx)[np.asarray(out.valid)]
    # box 1 suppressed by box 0 (same group); box 2 survives (other group)
    np.testing.assert_array_equal(sorted(kept.tolist()), [0, 2])


def test_grouped_nms_respects_validity():
    boxes = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    out = grouped_nms(boxes, scores, jnp.zeros(2, jnp.int32),
                      jnp.asarray([False, True]), iou_thr=0.5, max_out=2)
    kept = np.asarray(out.anchor_idx)[np.asarray(out.valid)]
    np.testing.assert_array_equal(kept, [1])


# --------------------------------------------------------------------------
# IoU-family losses (mmdet iou_loss.py numerics)
# --------------------------------------------------------------------------


def test_iou_losses_fixtures():
    p = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    t = jnp.asarray([[1.0, 1.0, 3.0, 3.0]])
    # inter 1, union 7 -> iou 1/7
    np.testing.assert_allclose(float(iou_loss(p, t)), -np.log(1 / 7), rtol=1e-5)
    np.testing.assert_allclose(float(iou_loss(p, t, linear=True)), 6 / 7, rtol=1e-5)
    # enclosing box area 9 -> giou = 1/7 - 2/9
    np.testing.assert_allclose(float(giou_loss(p, t)),
                               1 - (1 / 7 - 2 / 9), rtol=1e-5)
    # centers (1,1) vs (2,2): rho2 = 2; diagonal^2 = 18
    np.testing.assert_allclose(float(diou_loss(p, t)),
                               1 - 1 / 7 + 2 / 18, rtol=1e-4)
    # same aspect ratio -> v = 0 -> ciou == diou
    np.testing.assert_allclose(float(ciou_loss(p, t)), float(diou_loss(p, t)),
                               rtol=1e-4)


def test_iou_losses_perfect_match_and_grads():
    p = jnp.asarray([[10.0, 10.0, 50.0, 30.0]])
    for fn in (functools.partial(iou_loss, linear=True), giou_loss, diou_loss, ciou_loss):
        np.testing.assert_allclose(float(fn(p, p)), 0.0, atol=1e-5)
        g = jax.grad(lambda x: fn(x, p + 1.0).sum())(p)
        assert np.isfinite(np.asarray(g)).all()


def test_ciou_aspect_term():
    # different aspect ratios -> ciou > diou
    p = jnp.asarray([[0.0, 0.0, 4.0, 1.0]])
    t = jnp.asarray([[0.0, 0.0, 1.0, 4.0]])
    assert float(ciou_loss(p, t)) > float(diou_loss(p, t))


# --------------------------------------------------------------------------
# Faster R-CNN end-to-end (tiny, CPU)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def frcnn_setup():
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.two_stage import (
        make_faster_rcnn_eval_step,
        make_faster_rcnn_train_step,
    )
    from aod_meh_hua_tpu.models import init_faster_rcnn
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_faster_rcnn_config()
    model, variables = init_faster_rcnn(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(lr=0.02, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_faster_rcnn_train_step(model, cfg, tx)
    eval_step = make_faster_rcnn_eval_step(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    # bright distinctive squares, one per image
    images[0, 10:34, 20:44] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [20, 10, 44, 34]
    labels[0, 0] = 2
    images[1, 20:52, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [60, 20, 92, 52]
    labels[1, 0] = 4
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(), shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, model, state, train_step, eval_step, batch


def test_faster_rcnn_train_step_runs(frcnn_setup):
    cfg, model, state, train_step, eval_step, batch = frcnn_setup
    # the step donates its state: feed a copy so the fixture survives
    own = jax.tree.map(jnp.array, state)
    state1, aux = train_step(own, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) >= 2  # gt-as-proposal guarantees positives


def test_faster_rcnn_overfits_and_detects(frcnn_setup):
    cfg, model, state, train_step, eval_step, batch = frcnn_setup
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(120):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
        losses.append(float(aux["loss"]))
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
    for i, (gt, lab) in enumerate([(batch.gt_boxes[0, 0], 2), (batch.gt_boxes[1, 0], 4)]):
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


# --------------------------------------------------------------------------
# Cascade R-CNN (tiny, CPU)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cascade_setup(frcnn_setup):
    from aod_meh_hua_tpu.engine import create_train_state
    from aod_meh_hua_tpu.engine.two_stage import (
        make_cascade_eval_step,
        make_cascade_train_step,
    )
    from aod_meh_hua_tpu.models import init_cascade_rcnn
    from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_cascade_config

    cfg = tiny_cascade_config()
    model, variables = init_cascade_rcnn(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(lr=0.02, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_cascade_train_step(model, cfg, tx)
    eval_step = make_cascade_eval_step(model, cfg)
    # reuse the faster-rcnn fixture's batch (same tiny geometry)
    _, _, _, _, _, batch = frcnn_setup
    return cfg, state, train_step, eval_step, batch


def test_cascade_params_have_three_heads(cascade_setup):
    cfg, state, *_ = cascade_setup
    heads = [k for k in state.params if k.startswith("bbox_head_")]
    assert sorted(heads) == ["bbox_head_0", "bbox_head_1", "bbox_head_2"]
    # class-agnostic regression: 4 outputs, not 4C
    assert state.params["bbox_head_0"]["fc_reg"]["kernel"].shape[-1] == 4


def test_cascade_train_step_runs(cascade_setup):
    cfg, state, train_step, eval_step, batch = cascade_setup
    own = jax.tree.map(jnp.array, state)
    _, aux = train_step(own, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_rpn_cls", "s0.loss_cls", "s1.loss_cls",
              "s2.loss_cls", "s0.loss_bbox", "s2.loss_bbox"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) >= 2


def test_cascade_overfits_and_detects(cascade_setup):
    cfg, state, train_step, eval_step, batch = cascade_setup
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(120):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
        losses.append(float(aux["loss"]))
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
    for i, (gt, lab) in enumerate([(batch.gt_boxes[0, 0], 2), (batch.gt_boxes[1, 0], 4)]):
        m = valid[i] & (scores[i] > 0.25)
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
