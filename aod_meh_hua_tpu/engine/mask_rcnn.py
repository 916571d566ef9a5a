"""Mask R-CNN engine: the Faster R-CNN two-stage criterion plus the mask
branch — on-device mask targets, per-class BCE, and mask-emitting eval.

Behavioral parity targets (reference, /root/reference):
* configs/_base_/models/mask_rcnn_r50_fpn.py — mask RoIAlign 14 over
  strides 4-32 on the sampled POSITIVE rois, FCNMaskHead to 28x28,
  CrossEntropyLoss(use_mask=True): per-roi BCE on the gt-class channel,
  mean over pixels, averaged over positives
  (mmdet/models/losses/cross_entropy_loss.py mask branch).
* mmdet/core/mask/mask_target.py — targets are the GT instance mask
  cropped to the proposal and resized to 28x28, binarized.
* mmdet/models/roi_heads/standard_roi_head.py _mask_forward_train /
  simple_test_mask; fcn_mask_head.get_seg_masks (sigmoid of the det
  class channel, pasted into the image frame, threshold 0.5).

TPU transport redesign: the reference ships FULL-RESOLUTION bitmap masks
per GT into mask_target's crop+resize. At a fixed [B, G, H, W] canvas
that is ~40 MB/image of host->device traffic, almost all of it empty.
Here each GT mask is rasterized ONCE on host into its own box-aligned
[R, R] grid (R = cfg.gt_mask_raster, 56 = 2x the 28 target, so the
bilinear resample to any sub-window of the box is within quantization
noise of the full-res crop), and the 28x28 proposal-window targets are
generated ON DEVICE by the same zero-padded bilinear gathers the RoI
extractors use: target(u, v) = raster((roi(u, v) - gt_xy) / gt_wh).
Fixed shapes, ~200 KB/image, and target generation fuses into the train
step instead of a host loop.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.bbox import delta_decode
from ..ops.losses import binary_cross_entropy_with_logits, softmax_cross_entropy
from ..ops.ms_deform_attn import _bilinear_zero_batch
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState
from .two_stage import (_extract_rois, _roi, _roi_sample_single,
                        _rpn_targets_single, _stage1, make_proposal_fn)


class MaskBatch(NamedTuple):
    """Batch + box-aligned GT mask rasters.

    gt_masks[b, g] is gt (b, g)'s instance mask rasterized over ITS OWN
    gt box: raster pixel (i, j) covers the box point
    (x1 + (j+.5)/R*w, y1 + (i+.5)/R*h). Built by rasterize_gt_masks."""

    images: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_labels: jnp.ndarray
    gt_valid: jnp.ndarray
    anchor_valid: jnp.ndarray
    img_shapes: jnp.ndarray
    gt_masks: jnp.ndarray      # [B, G, R, R] float32 in [0, 1]

    @property
    def as_batch(self) -> Batch:
        return Batch(self.images, self.gt_boxes, self.gt_labels,
                     self.gt_valid, self.anchor_valid, self.img_shapes)


def rasterize_gt_masks(polys_per_gt, gt_boxes, num_gt_slots: int,
                       raster: int) -> np.ndarray:
    """Host-side: per-gt polygon list (COCO 'segmentation' xy-interleaved,
    CANVAS coords) -> [G, R, R] box-aligned float rasters. A gt with no
    polygons (or a degenerate box) falls back to the full box (the
    iscrowd/RLE-free behavior tests rely on)."""
    import cv2

    out = np.zeros((num_gt_slots, raster, raster), np.float32)
    for g, polys in enumerate(polys_per_gt[:num_gt_slots]):
        x1, y1, x2, y2 = [float(v) for v in gt_boxes[g][:4]]
        w, h = max(x2 - x1, 1e-3), max(y2 - y1, 1e-3)
        if not polys:
            out[g] = 1.0
            continue
        canvas = np.zeros((raster, raster), np.uint8)
        for p in polys:
            pts = np.asarray(p, np.float64).reshape(-1, 2)
            pts[:, 0] = (pts[:, 0] - x1) / w * raster - 0.5
            pts[:, 1] = (pts[:, 1] - y1) / h * raster - 0.5
            cv2.fillPoly(canvas, [np.round(pts).astype(np.int32)], 1)
        out[g] = canvas
    return out


def _mask_targets_single(rois, gt_idx, gt_boxes, gt_masks, mask_size: int):
    """One image: [P, 4] rois + [P] gt assignment + [G, R, R] rasters ->
    [P, mask_size, mask_size] binarized targets (mask_target.py crop +
    resize + round, via the box-aligned raster)."""
    gb = gt_boxes[gt_idx]                      # [P, 4]
    m = gt_masks[gt_idx]                       # [P, R, R]
    r = gt_masks.shape[-1]
    s = mask_size
    u = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s  # cell centers

    def one(roi, box, raster):
        x = roi[0] + u * (roi[2] - roi[0])     # [s] canvas x
        y = roi[1] + u * (roi[3] - roi[1])
        bw = jnp.maximum(box[2] - box[0], 1e-3)
        bh = jnp.maximum(box[3] - box[1], 1e-3)
        xs = (x - box[0]) / bw * r - 0.5
        ys = (y - box[1]) / bh * r - 0.5
        yy = jnp.repeat(ys, s)
        xx = jnp.tile(xs, s)
        vals = _bilinear_zero_batch(raster[..., None], yy, xx)[:, 0]
        return vals.reshape(s, s)

    return (jax.vmap(one)(rois, gb, m) >= 0.5).astype(jnp.float32)


def make_mask_rcnn_train_step(model, cfg, tx) -> Callable:
    """One fused jit step: Faster R-CNN RPN + RoI losses + the mask
    branch on the sampled-positive prefix. step(state, batch: MaskBatch,
    key) -> (state, aux)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    rc = cfg.rcnn
    num_pos_cap = int(rc.sampler_num * rc.pos_fraction)  # positives prefix

    def _mask_fwd(m, feats):
        return m.mask_forward(feats)

    def loss_fn(params, batch_stats, batch: MaskBatch, anchors, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        b = rpn_cls.shape[0]

        # ---- RPN losses (identical to Faster R-CNN) ----
        k_rpn, k_roi = jax.random.split(key)
        t = jax.vmap(functools.partial(_rpn_targets_single, rpn_cfg=cfg.rpn),
                     in_axes=(0, None, 0, 0, 0))(
            jax.random.split(k_rpn, b), anchors,
            batch.anchor_valid, batch.gt_boxes, batch.gt_valid)
        num_total = jnp.maximum(t.num_samples.sum().astype(jnp.float32), 1.0)
        loss_rpn_cls = (binary_cross_entropy_with_logits(
            rpn_cls, t.is_pos.astype(jnp.float32), reduction="none")
            * t.weights).sum() / num_total
        loss_rpn_bbox = (jnp.abs(rpn_reg - t.bbox_targets)
                         * t.is_pos[..., None]).sum() / num_total

        props, _, prop_valid = proposal_fn(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            anchors, batch.img_shapes,
            cfg.rpn.train_nms_pre, cfg.rpn.train_max_per_img)

        smp = jax.vmap(functools.partial(_roi_sample_single, cfg=cfg))(
            jax.random.split(k_roi, b), props, prop_valid,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        roi_feats = _extract_rois(cfg, feats, smp.rois)
        cls, reg = model.apply(variables, roi_feats, method=_roi)

        labels = smp.labels.reshape(-1)
        label_w = smp.label_weights.reshape(-1)
        avg_cls = jnp.maximum((label_w > 0).sum().astype(jnp.float32), 1.0)
        loss_cls = (softmax_cross_entropy(cls, labels, reduction="none")
                    * label_w).sum() / avg_cls
        sel = jnp.clip(labels, 0, cfg.num_classes - 1)
        reg_sel = jnp.take_along_axis(
            reg, jnp.repeat(sel[:, None, None], 4, axis=-1), axis=1)[:, 0]
        pos = smp.is_pos.reshape(-1)
        avg_reg = jnp.maximum(smp.valid.sum().astype(jnp.float32), 1.0)
        loss_bbox = (jnp.abs(reg_sel - smp.bbox_targets.reshape(-1, 4))
                     * pos[:, None]).sum() / avg_reg

        # ---- mask branch on the positive prefix (sampler places all
        # positives first, ops/sampler.py) ----
        p = num_pos_cap
        mrois = smp.rois[:, :p]
        mfeats = _extract_rois(cfg, feats, mrois, roi_size=cfg.mask_roi_size)
        mlogits = model.apply(variables, mfeats, method=_mask_fwd)
        mlogits = mlogits.reshape((b, p) + mlogits.shape[1:])  # [B,P,s,s,C]
        mtargets = jax.vmap(
            functools.partial(_mask_targets_single, mask_size=cfg.mask_size)
        )(mrois, smp.gt_idx[:, :p], batch.gt_boxes, batch.gt_masks)
        mlabels = jnp.clip(smp.labels[:, :p], 0, cfg.num_classes - 1)
        msel = jnp.take_along_axis(
            mlogits, mlabels[:, :, None, None, None], axis=-1)[..., 0]
        mpos = smp.is_pos[:, :p].astype(jnp.float32)
        per_roi = binary_cross_entropy_with_logits(
            msel, mtargets, reduction="none").mean(axis=(2, 3))
        loss_mask = (per_roi * mpos).sum() / jnp.maximum(mpos.sum(), 1.0)

        total = loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_bbox + loss_mask
        aux = {"loss": total, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox, "loss_cls": loss_cls,
               "loss_bbox": loss_bbox, "loss_mask": loss_mask,
               "num_pos": pos.sum().astype(jnp.float32)}
        return total, aux

    def train_step(state: TrainState, batch: MaskBatch, anchors, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: MaskBatch, key):
        return jfn(state, batch, anchors_arg.get(batch.images), key)

    return step


class MaskDetections(NamedTuple):
    boxes: jnp.ndarray   # [B, D, 4] (rescaled to original image coords)
    scores: jnp.ndarray  # [B, D]
    labels: jnp.ndarray  # [B, D] int32
    valid: jnp.ndarray   # [B, D] bool
    idx: jnp.ndarray     # [B, D] source candidate index
    masks: jnp.ndarray   # [B, D, mask_size, mask_size] sigmoid probs


def make_mask_rcnn_eval_step(model, cfg) -> Callable:
    """step(variables, batch: EvalBatch) -> MaskDetections. The box path
    is exactly the Faster R-CNN eval; the mask head then runs once on
    the final detections' CANVAS-coordinate boxes (simple_test_mask)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes

    def _mask_fwd(m, feats):
        return m.mask_forward(feats)

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        props, _, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        roi_feats = _extract_rois(cfg, feats, props)
        cls, reg = model.apply(variables, roi_feats, method=_roi)
        b, p = props.shape[:2]
        probs = jax.nn.softmax(cls, axis=-1).reshape(b, p, c + 1)
        boxes = delta_decode(
            props[:, :, None, :], reg.reshape(b, p, c, 4),
            stds=cfg.rcnn.target_stds, max_shape=batch.img_shapes[:, None, :])
        boxes = boxes / batch.scale_factors[:, None, None, :]
        fg = probs[..., :c] * prop_valid[..., None]
        dets = batched_multiclass_nms(
            boxes, fg, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

        # mask head on the detections, extracted at canvas coordinates
        canvas_boxes = dets.boxes * batch.scale_factors[:, None, :]
        mfeats = _extract_rois(cfg, feats, canvas_boxes,
                               roi_size=cfg.mask_roi_size)
        mlogits = model.apply(variables, mfeats, method=_mask_fwd)
        d = dets.boxes.shape[1]
        mlogits = mlogits.reshape((b, d) + mlogits.shape[1:])
        msel = jnp.take_along_axis(
            mlogits, jnp.clip(dets.labels, 0, c - 1)[:, :, None, None, None],
            axis=-1)[..., 0]
        masks = jax.nn.sigmoid(msel) * dets.valid[:, :, None, None]
        return MaskDetections(dets.boxes, dets.scores, dets.labels,
                              dets.valid, dets.anchor_idx, masks)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step


def paste_masks(boxes: np.ndarray, masks: np.ndarray, valid: np.ndarray,
                img_h: int, img_w: int, thr: float = 0.5) -> np.ndarray:
    """Host-side get_seg_masks paste: [D, 4] boxes (image coords) +
    [D, s, s] sigmoid masks -> [D, img_h, img_w] bool bitmaps
    (fcn_mask_head.py get_seg_masks with threshold 0.5)."""
    import cv2

    d, s, _ = masks.shape
    out = np.zeros((d, img_h, img_w), bool)
    for i in range(d):
        if not valid[i]:
            continue
        x1, y1, x2, y2 = boxes[i]
        x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
        x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
        x1i, y1i = max(x1i, 0), max(y1i, 0)
        x2i, y2i = min(max(x2i, x1i + 1), img_w), min(max(y2i, y1i + 1), img_h)
        m = cv2.resize(masks[i], (x2i - x1i, y2i - y1i),
                       interpolation=cv2.INTER_LINEAR)
        out[i, y1i:y2i, x1i:x2i] = m >= thr
    return out
