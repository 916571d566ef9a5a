"""Mask Scoring R-CNN family: MaskIoU head, on-device maskiou targets,
maskiou-corrected mask scores (parity targets:
mmdet/models/roi_heads/mask_scoring_roi_head.py, maskiou_head.py,
configs/ms_rcnn/* — cited in models/mask_scoring_rcnn.py,
engine/mask_scoring_rcnn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_mask_scoring_config


def test_maskiou_targets_identity_is_one():
    """RoI == gt box, prediction binarized == target -> IoU target 1
    (and a half-coverage prediction -> 0.5, the set-IoU value)."""
    from aod_meh_hua_tpu.engine.mask_scoring_rcnn import \
        _maskiou_targets_single

    r, s = 28, 14
    raster = np.ones((2, r, r), np.float32)
    gt_boxes = np.array([[8.0, 8.0, 40.0, 40.0], [0, 0, 16, 16]], np.float32)
    rois = gt_boxes.copy()
    gt_idx = np.arange(2, dtype=np.int32)
    full = np.ones((2, s, s), np.float32)
    t = np.asarray(_maskiou_targets_single(
        jnp.asarray(rois), jnp.asarray(gt_idx), jnp.asarray(gt_boxes),
        jnp.asarray(raster), jnp.asarray(full), jnp.asarray(full),
        mask_size=s))
    np.testing.assert_allclose(t, 1.0, atol=0.02)

    # prediction covers only the left half -> IoU = 0.5/1.0 = 0.5
    half = full.copy()
    half[:, :, s // 2:] = 0.0
    t2 = np.asarray(_maskiou_targets_single(
        jnp.asarray(rois), jnp.asarray(gt_idx), jnp.asarray(gt_boxes),
        jnp.asarray(raster), jnp.asarray(half), jnp.asarray(full),
        mask_size=s))
    np.testing.assert_allclose(t2, 0.5, atol=0.03)


def test_maskiou_targets_recover_full_instance_area():
    """A RoI covering only the LEFT HALF of the gt box: the visible
    target fills the window, but the maskiou denominator must use the
    FULL instance area (maskiou_head.get_targets' crop/full area
    ratio), so a full-window prediction gets IoU ~ 0.5, not 1."""
    from aod_meh_hua_tpu.engine.mask_scoring_rcnn import \
        _maskiou_targets_single

    r, s = 28, 14
    raster = np.ones((1, r, r), np.float32)
    gt_boxes = np.array([[0.0, 0.0, 40.0, 40.0]], np.float32)
    rois = np.array([[0.0, 0.0, 20.0, 40.0]], np.float32)  # left half
    gt_idx = np.zeros((1,), np.int32)
    full = np.ones((1, s, s), np.float32)
    t = np.asarray(_maskiou_targets_single(
        jnp.asarray(rois), jnp.asarray(gt_idx), jnp.asarray(gt_boxes),
        jnp.asarray(raster), jnp.asarray(full), jnp.asarray(full),
        mask_size=s))
    assert abs(t[0] - 0.5) < 0.05, t


@pytest.fixture(scope="module")
def ms_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import create_train_state
    from aod_meh_hua_tpu.engine.mask_rcnn import MaskBatch, rasterize_gt_masks
    from aod_meh_hua_tpu.engine.mask_scoring_rcnn import \
        make_ms_rcnn_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_mask_scoring_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_ms_rcnn_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:40, 8:24] = rng.randn(32, 16, 3).astype(np.float32) + 2.5
    boxes[0, 0] = [8, 8, 40, 40]
    labels[0, 0] = 1
    images[1, 24:56, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.5
    boxes[1, 0] = [60, 24, 92, 56]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    rasters = np.stack([
        rasterize_gt_masks([[[8, 8, 24, 8, 24, 40, 8, 40]]], boxes[0], g,
                           cfg.gt_mask_raster),
        rasterize_gt_masks([[]], boxes[1], g, cfg.gt_mask_raster),
    ])
    batch = MaskBatch(images, boxes, labels, gt_valid, av, shapes, rasters)
    return cfg, state, train_step, eval_step, batch


def test_ms_rcnn_train_step_finite_and_updates_iou_head(ms_setup):
    cfg, state, train_step, eval_step, batch = ms_setup
    own = jax.tree.map(jnp.array, state)
    state1, aux = train_step(own, batch, jax.random.PRNGKey(0))
    for k in ("loss", "loss_rpn_cls", "loss_cls", "loss_bbox", "loss_mask",
              "loss_mask_iou"):
        assert np.isfinite(float(aux[k])), k
    before = state.params["mask_iou_head"]["fc_mask_iou"]["kernel"]
    after = state1.params["mask_iou_head"]["fc_mask_iou"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_ms_rcnn_overfits_and_scores_masks(ms_setup):
    """300 steps: boxes + labels recovered, masks match the gt shapes,
    and the eval's mask_scores are maskiou-corrected — in (0, 1] and
    <= the bbox scores wherever the predicted maskiou < 1."""
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg, state, train_step, eval_step, batch = ms_setup
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(0)
    for _ in range(300):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
    assert np.isfinite(float(aux["loss"]))

    h, w = cfg.canvas
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, eb)
    bx, sc = np.asarray(dets.boxes), np.asarray(dets.scores)
    lb, mk = np.asarray(dets.labels), np.asarray(dets.masks)
    msc, vd = np.asarray(dets.mask_scores), np.asarray(dets.valid)
    gts = [([8, 8, 40, 40], 1), ([60, 24, 92, 56], 3)]
    for b, (gt, lab) in enumerate(gts):
        i = sc[b].argmax()
        iou = np.asarray(bbox_overlaps(jnp.asarray([gt], jnp.float32),
                                       jnp.asarray(bx[b, i:i + 1])))[0, 0]
        assert iou > 0.5, (b, bx[b, i], iou)
        assert lb[b, i] == lab
        # mask_score = bbox_score * maskiou[label]: positive, bounded
        # by the bbox score (maskiou head output can exceed 1 only if
        # unlearned; after overfit it sits in (0, 1])
        assert 0.0 < msc[b, i] <= sc[b, i] * 1.5, (msc[b, i], sc[b, i])
    # object 0's mask is the left half of its box
    i0 = sc[0].argmax()
    m0 = mk[0, i0]
    s = m0.shape[0]
    assert m0[:, : s // 3].mean() > 0.6
    assert m0[:, -s // 3:].mean() < 0.4
    # invalid slots carry zero mask scores
    assert (msc[~vd] == 0).all()
