"""FSAF family: dense center-region assigner semantics, TBLR coder
round-trip, online feature selection, and the fused train/eval steps
(parity targets: reference center_region_assigner.py / fsaf_head.py /
tblr_bbox_coder.py, cited in aod_meh_hua_tpu/models/fsaf.py and
engine/fsaf.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.ops.bbox import tblr_decode, tblr_encode
from aod_meh_hua_tpu.utils.config import tiny_fsaf_config


def test_tblr_roundtrip():
    rng = np.random.RandomState(0)
    priors = np.stack([
        rng.uniform(0, 50, 20), rng.uniform(0, 50, 20),
        rng.uniform(60, 120, 20), rng.uniform(60, 120, 20)], axis=1)
    gts = np.stack([
        rng.uniform(0, 40, 20), rng.uniform(0, 40, 20),
        rng.uniform(70, 128, 20), rng.uniform(70, 128, 20)], axis=1)
    enc = tblr_encode(jnp.asarray(priors), jnp.asarray(gts), normalizer=4.0)
    dec = np.asarray(tblr_decode(jnp.asarray(priors), enc, normalizer=4.0))
    np.testing.assert_allclose(dec, gts, atol=1e-3)


def test_tblr_decode_clips_to_shape():
    priors = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
    tblr = jnp.asarray([[10.0, 10.0, 10.0, 10.0]])  # way out of frame
    out = np.asarray(tblr_decode(priors, tblr, normalizer=4.0,
                                 max_shape=jnp.asarray([32, 48])))
    assert out[0, 0] >= 0 and out[0, 1] >= 0
    assert out[0, 2] <= 48 and out[0, 3] <= 32


def _assign(anchors, gt_boxes, gt_labels, gt_valid, cfg, anchor_valid=None):
    from aod_meh_hua_tpu.engine.fsaf import _center_region_assign

    A = anchors.shape[0]
    if anchor_valid is None:
        anchor_valid = jnp.ones((A,), bool)
    return _center_region_assign(
        jnp.asarray(anchors), anchor_valid, jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels), jnp.asarray(gt_valid), cfg)


def _grid_anchors(n, stride):
    anchors = []
    for r in range(n):
        for c in range(n):
            cx, cy = c * stride + stride / 2, r * stride + stride / 2
            anchors.append([cx - stride / 2, cy - stride / 2,
                            cx + stride / 2, cy + stride / 2])
    return np.array(anchors, np.float32)


def test_center_region_core_positive():
    """Only pixels whose anchor overlaps the inner 0.2 region (and whose
    center is inside the gt) are positive; the rest of the gt interior is
    plain negative with full channel weight (pos_scale == neg_scale means
    the shadow region coincides with the core, so the classic FSAF config
    has no outer ignore ring — center_region_assigner.py:174-180)."""
    cfg = tiny_fsaf_config()
    anchors = _grid_anchors(8, 8)  # 64x64 canvas, stride 8
    # gt covering most of the canvas: core = inner 0.2 around (32, 32)
    gt = np.array([[2.0, 2.0, 62.0, 62.0]], np.float32)
    best, matched, labels, cls_w = _assign(
        anchors, gt, np.array([2]), np.array([True]), cfg)
    matched = np.asarray(matched)
    labels = np.asarray(labels)
    cls_w = np.asarray(cls_w)
    centers = (anchors[:, :2] + anchors[:, 2:]) / 2
    assert matched.any()
    # positives touch the core box [26, 26, 38, 38]
    for a in np.nonzero(matched)[0]:
        assert labels[a] == 2
        assert (anchors[a, 2] > 26 and anchors[a, 0] < 38
                and anchors[a, 3] > 26 and anchors[a, 1] < 38)
    # far-from-core interior pixels: plain negatives, full weight
    far = (np.abs(centers - 32.0).max(axis=1) > 20.0)
    assert not matched[far].any()
    assert (cls_w[far] == 1).all()


def test_center_region_smaller_gt_wins():
    cfg = tiny_fsaf_config()
    anchors = _grid_anchors(8, 8)
    # big gt and a small gt sharing the center; core pixels go SMALL
    gt = np.array([[0.0, 0.0, 64.0, 64.0], [24.0, 24.0, 40.0, 40.0]],
                  np.float32)
    best, matched, labels, cls_w = _assign(
        anchors, gt, np.array([1, 3]), np.array([True, True]), cfg)
    best, matched = np.asarray(best), np.asarray(matched)
    centers = (anchors[:, :2] + anchors[:, 2:]) / 2
    mid = (np.abs(centers - 32.0).max(axis=1) < 4.0)  # the 4 center cells
    assert matched[mid].all()
    assert (best[mid] == 1).all()
    assert (np.asarray(labels)[mid] == 3).all()
    # the losing (big) gt shadows those cells: ITS label channel is
    # zeroed there while the winner's stays live
    cls_w = np.asarray(cls_w)
    assert (cls_w[mid, 1] == 0).all()
    assert (cls_w[mid, 3] == 1).all()


def test_center_region_same_label_conflict_demotes():
    """A pixel core-matched to two same-label gts is demoted to
    background (the foreground_dominate=False override branch,
    center_region_assigner.py:236-244)."""
    cfg = tiny_fsaf_config()
    anchors = _grid_anchors(8, 8)
    gt = np.array([[0.0, 0.0, 64.0, 64.0], [24.0, 24.0, 40.0, 40.0]],
                  np.float32)
    best, matched, labels, cls_w = _assign(
        anchors, gt, np.array([3, 3]), np.array([True, True]), cfg)
    matched, labels = np.asarray(matched), np.asarray(labels)
    centers = (anchors[:, :2] + anchors[:, 2:]) / 2
    mid = (np.abs(centers - 32.0).max(axis=1) < 4.0)
    # both gts' cores cover the center cells with the same label ->
    # demoted to background, channel weight stays zeroed
    assert not matched[mid].any()
    assert (labels[mid] == cfg.num_classes).all()
    assert (np.asarray(cls_w)[mid, 3] == 0).all()


def test_center_region_invalid_gt_ignored():
    cfg = tiny_fsaf_config()
    anchors = _grid_anchors(8, 8)
    gt = np.array([[2.0, 2.0, 62.0, 62.0]], np.float32)
    _, matched, _, cls_w = _assign(
        anchors, gt, np.array([2]), np.array([False]), cfg)
    assert not np.asarray(matched).any()
    assert (np.asarray(cls_w) == 1).all()


@pytest.fixture(scope="module")
def fsaf_setup():
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.fsaf import (make_fsaf_eval_step,
                                             make_fsaf_train_step)
    from aod_meh_hua_tpu.models import init_fsaf
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_fsaf_config()
    model, variables = init_fsaf(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(lr=0.01, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_fsaf_train_step(model, cfg, tx)
    eval_step = make_fsaf_eval_step(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 10:34, 20:44] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [20, 10, 44, 34]
    labels[0, 0] = 1
    images[1, 20:52, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [60, 20, 92, 52]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, state, train_step, eval_step, batch


def test_fsaf_train_step_runs(fsaf_setup):
    cfg, state, train_step, eval_step, batch = fsaf_setup
    own = jax.tree.map(jnp.array, state)
    _, aux = train_step(own, batch)
    for k in ("loss", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) > 0


def test_fsaf_single_level_selected_per_gt(fsaf_setup):
    """Online feature selection keeps each gt's positives on exactly one
    pyramid level (fsaf_head.py reweight_loss_single)."""
    cfg, state, train_step, eval_step, batch = fsaf_setup
    from aod_meh_hua_tpu.engine.fsaf import (_center_region_assign,
                                             make_fsaf_loss_fn)
    from aod_meh_hua_tpu.models import init_fsaf

    model, variables = init_fsaf(cfg, jax.random.PRNGKey(1))
    loss_fn, anchors_host, lvl_host = make_fsaf_loss_fn(model, cfg)
    (_, aux) = loss_fn(variables["params"], variables.get("batch_stats", {}),
                       batch, jnp.asarray(anchors_host),
                       jnp.asarray(lvl_host))
    # each image has one gt -> positives live on exactly one level, so
    # num_pos is bounded by the largest per-level core population
    best, matched, _, _ = _center_region_assign(
        jnp.asarray(anchors_host), jnp.ones(anchors_host.shape[0], bool),
        jnp.asarray(batch.gt_boxes[0]), jnp.asarray(batch.gt_labels[0]),
        jnp.asarray(batch.gt_valid[0]), cfg)
    per_level_counts = []
    off = 0
    for (s0, s1) in cfg.level_bounds():
        per_level_counts.append(int(np.asarray(matched[s0:s1]).sum()))
    assert float(aux["num_pos"]) <= 2 * max(max(per_level_counts), 1)


def test_fsaf_overfits_and_detects(fsaf_setup):
    cfg, state, train_step, eval_step, batch = fsaf_setup
    state = jax.tree.map(jnp.array, state)
    losses = []
    for _ in range(300):
        state, aux = train_step(state, batch)
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
    for i, (gt, lab) in enumerate([(batch.gt_boxes[0, 0], 1),
                                   (batch.gt_boxes[1, 0], 3)]):
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
