"""Mask R-CNN family: box-aligned GT raster transport, on-device mask
targets, per-class BCE mask loss, and the mask-emitting eval (parity
targets: configs/_base_/models/mask_rcnn_r50_fpn.py, mask_target.py,
fcn_mask_head.py — cited in models/mask_rcnn.py, engine/mask_rcnn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_mask_rcnn_config


def test_rasterize_gt_masks_polygon_coverage():
    from aod_meh_hua_tpu.engine.mask_rcnn import rasterize_gt_masks

    boxes = np.array([[10.0, 20.0, 50.0, 60.0],
                      [0.0, 0.0, 8.0, 8.0]], np.float32)
    # gt 0: polygon = left half of its box; gt 1: no polygon -> full box
    left_half = [[10, 20, 30, 20, 30, 60, 10, 60]]
    out = rasterize_gt_masks([left_half, []], boxes, num_gt_slots=4, raster=32)
    assert out.shape == (4, 32, 32)
    cov = out[0].mean()
    assert 0.4 < cov < 0.6, cov  # ~half the box
    assert out[0][:, :14].mean() > 0.9  # the left side is filled
    assert out[0][:, 18:].mean() < 0.1  # the right side is empty
    assert (out[1] == 1.0).all()        # full-box fallback
    assert (out[2:] == 0.0).all()       # unused slots


def test_mask_targets_identity_and_subwindow():
    """RoI == gt box reproduces the (downsampled) raster; a RoI covering
    the box's left half samples only the left half."""
    from aod_meh_hua_tpu.engine.mask_rcnn import _mask_targets_single

    r = 32
    raster = np.zeros((2, r, r), np.float32)
    raster[0, :, : r // 2] = 1.0  # gt 0: left half
    gt_boxes = np.array([[8.0, 8.0, 40.0, 40.0], [0, 0, 1, 1]], np.float32)
    rois = np.array([
        [8.0, 8.0, 40.0, 40.0],    # identity
        [8.0, 8.0, 24.0, 40.0],    # left half of the box
        [24.0, 8.0, 40.0, 40.0],   # right half
    ], np.float32)
    gt_idx = np.zeros((3,), np.int32)
    t = np.asarray(_mask_targets_single(
        jnp.asarray(rois), jnp.asarray(gt_idx), jnp.asarray(gt_boxes),
        jnp.asarray(raster), mask_size=16))
    assert t.shape == (3, 16, 16)
    assert abs(t[0].mean() - 0.5) < 0.1       # identity: half on
    assert t[0][:, :7].mean() > 0.95
    assert t[1].mean() > 0.95                  # left-half RoI: all on
    assert t[2].mean() < 0.05                  # right-half RoI: all off


@pytest.fixture(scope="module")
def mask_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import create_train_state
    from aod_meh_hua_tpu.engine.mask_rcnn import (MaskBatch,
                                                  make_mask_rcnn_train_step,
                                                  rasterize_gt_masks)
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_mask_rcnn_config()
    model, variables = init_detector(cfg, seed=0)
    # grad_clip matches the reference's detector configs that train the
    # mask branch with clipping (e.g. configs/.../grad_clip max_norm=35);
    # without it this tiny synthetic setup can blow up late in the
    # overfit run under some XLA schedules.
    tcfg = TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_mask_rcnn_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    # object 0: bright block whose instance mask is its LEFT half
    images[0, 8:40, 8:24] = rng.randn(32, 16, 3).astype(np.float32) + 2.5
    boxes[0, 0] = [8, 8, 40, 40]
    labels[0, 0] = 1
    # object 1: dark block, full-box mask
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


def test_mask_rcnn_train_step_finite_and_updates(mask_setup):
    cfg, state, train_step, eval_step, batch = mask_setup
    own = jax.tree.map(jnp.array, state)
    state1, aux = train_step(own, batch, jax.random.PRNGKey(0))
    for k in ("loss", "loss_rpn_cls", "loss_cls", "loss_bbox", "loss_mask"):
        assert np.isfinite(float(aux[k])), k
    before = state.params["mask_head"]["conv_logits"]["kernel"]
    after = state1.params["mask_head"]["conv_logits"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_mask_rcnn_overfits_boxes_and_masks(mask_setup):
    """300 SGD steps: both boxes recovered (IoU > 0.5, right labels) AND
    the predicted instance mask matches the gt shape — half-box for
    object 0, full-box for object 1."""
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.engine.mask_rcnn import paste_masks
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg, state, train_step, eval_step, batch = mask_setup
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
    gts = [([8, 8, 40, 40], 1), ([60, 24, 92, 56], 3)]
    for b, (gt, lab) in enumerate(gts):
        i = sc[b].argmax()
        iou = np.asarray(bbox_overlaps(jnp.asarray([gt], jnp.float32),
                                       jnp.asarray(bx[b, i:i + 1])))[0, 0]
        assert iou > 0.5, (b, bx[b, i], iou)
        assert lb[b, i] == lab
    # mask shape: object 0's instance mask is the left half of its box
    i0 = sc[0].argmax()
    m0 = mk[0, i0]
    s = m0.shape[0]
    assert m0[:, : s // 3].mean() > 0.6, m0[:, : s // 3].mean()
    assert m0[:, -s // 3:].mean() < 0.4, m0[:, -s // 3:].mean()
    # object 1: full-box mask — uniformly on
    i1 = sc[1].argmax()
    assert mk[1, i1].mean() > 0.6
    # host paste: binarized bitmap lands inside the detection box
    bitmap = paste_masks(bx[0], mk[0], np.asarray(dets.valid)[0], h, w)
    ys, xs = np.nonzero(bitmap[i0])
    assert len(ys) > 0
    assert xs.mean() < (bx[0, i0, 0] + bx[0, i0, 2]) / 2  # left-weighted
