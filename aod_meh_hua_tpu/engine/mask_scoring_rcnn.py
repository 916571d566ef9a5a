"""Mask Scoring R-CNN engine: the Mask R-CNN criterion plus MaskIoU
regression; eval attaches maskiou-corrected mask scores.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/mask_scoring_roi_head.py:30-46 — the MaskIoU
  head runs on (mask feats, gt-class mask logits) of the sampled
  positives; L2 loss (weight 0.5) on cells whose IoU target is > 0.
* mmdet/models/roi_heads/mask_heads/maskiou_head.py get_targets
  (:97-145): predicted mask binarized at mask_thr_binary, IoU computed
  against the 28x28 proposal-window gt target with the gt's FULL
  instance area recovered through the crop/full area ratio.
* maskiou_head.py get_mask_scores (:173): mask_score =
  bbox_score * maskiou[label].

TPU redesign: the reference's per-roi python crop loop for area ratios
becomes one more bilinear resample of the box-aligned gt rasters (the
same transport the mask targets use) — the full-instance area is
raster.mean() * box_area and the in-proposal area is the unbinarized
target mean * proposal_area, all inside the jitted step.
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
from .batch import ConstArg, EvalBatch, prepare_images
from .mask_rcnn import MaskBatch, MaskDetections, _mask_targets_single
from .train import TrainState
from .two_stage import (_extract_rois, _roi, _roi_sample_single,
                        _rpn_targets_single, _stage1, make_proposal_fn)


def _sample_raster(rois, gt_boxes_of, rasters_of, size: int):
    """[P, size, size] UNbinarized bilinear samples of each roi's gt
    raster over the roi window (the float version of
    mask_rcnn._mask_targets_single)."""
    r = rasters_of.shape[-1]
    u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size

    def one(roi, box, raster):
        x = roi[0] + u * (roi[2] - roi[0])
        y = roi[1] + u * (roi[3] - roi[1])
        bw = jnp.maximum(box[2] - box[0], 1e-3)
        bh = jnp.maximum(box[3] - box[1], 1e-3)
        xs = (x - box[0]) / bw * r - 0.5
        ys = (y - box[1]) / bh * r - 0.5
        yy = jnp.repeat(ys, size)
        xx = jnp.tile(xs, size)
        return _bilinear_zero_batch(raster[..., None], yy, xx)[:, 0].reshape(
            size, size)

    return jax.vmap(one)(rois, gt_boxes_of, rasters_of)


def _maskiou_targets_single(rois, gt_idx, gt_boxes, gt_masks, mask_bin,
                            mask_t, mask_size: int):
    """One image: maskiou targets for the positive-prefix rois
    (maskiou_head.py get_targets). mask_bin/mask_t: [P, s, s]."""
    gb = gt_boxes[gt_idx]
    rast = gt_masks[gt_idx]
    # full instance area, in 28x28-target pixel units: the reference
    # recovers it as target_area / (crop_area / full_area)
    soft = _sample_raster(rois, gb, rast, mask_size)      # [P, s, s]
    prop_area = jnp.maximum((rois[:, 2] - rois[:, 0])
                            * (rois[:, 3] - rois[:, 1]), 1e-3)
    full_area = jnp.maximum(rast.mean(axis=(1, 2))
                            * (gb[:, 2] - gb[:, 0])
                            * (gb[:, 3] - gb[:, 1]), 1e-6)
    crop_area = soft.mean(axis=(1, 2)) * prop_area
    ratio = crop_area / (full_area + 1e-7)
    t_area = mask_t.sum(axis=(1, 2))
    gt_full = t_area / (ratio + 1e-7)
    pred_area = mask_bin.sum(axis=(1, 2))
    overlap = (mask_bin * mask_t).sum(axis=(1, 2))
    return overlap / jnp.maximum(pred_area + gt_full - overlap, 1e-7)


def make_ms_rcnn_train_step(model, cfg, tx) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    rc = cfg.rcnn
    num_pos_cap = int(rc.sampler_num * rc.pos_fraction)

    def _mask_fwd(m, feats):
        return m.mask_forward(feats)

    def _miou_fwd(m, feats, pred):
        return m.maskiou_forward(feats, pred)

    def loss_fn(params, batch_stats, batch: MaskBatch, anchors, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        b = rpn_cls.shape[0]

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

        # ---- mask branch (identical to mask_rcnn) ----
        p = num_pos_cap
        mrois = smp.rois[:, :p]
        mfeats = _extract_rois(cfg, feats, mrois, roi_size=cfg.mask_roi_size)
        mlogits = model.apply(variables, mfeats, method=_mask_fwd)
        mlogits = mlogits.reshape((b, p) + mlogits.shape[1:])
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

        # ---- MaskIoU branch ----
        miou = model.apply(variables,
                           mfeats.reshape((-1,) + mfeats.shape[-3:]),
                           msel.reshape((-1,) + msel.shape[-2:]),
                           method=_miou_fwd)
        miou = miou.reshape(b, p, cfg.num_classes)
        miou_sel = jnp.take_along_axis(miou, mlabels[:, :, None],
                                       axis=-1)[..., 0]
        mask_bin = (jax.lax.stop_gradient(msel)
                    > cfg.mask_thr_binary).astype(jnp.float32)
        miou_t = jax.vmap(functools.partial(_maskiou_targets_single,
                                            mask_size=cfg.mask_size))(
            mrois, smp.gt_idx[:, :p], batch.gt_boxes, batch.gt_masks,
            mask_bin, mtargets)
        miou_t = jax.lax.stop_gradient(miou_t)
        w = mpos * (miou_t > 0)
        loss_miou = (cfg.maskiou_loss_weight
                     * ((miou_sel - miou_t) ** 2 * w).sum()
                     / jnp.maximum(w.sum(), 1.0))

        total = (loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_bbox
                 + loss_mask + loss_miou)
        aux = {"loss": total, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox, "loss_cls": loss_cls,
               "loss_bbox": loss_bbox, "loss_mask": loss_mask,
               "loss_mask_iou": loss_miou,
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


class MaskScoringDetections(NamedTuple):
    boxes: jnp.ndarray
    scores: jnp.ndarray       # bbox scores (box eval)
    labels: jnp.ndarray
    valid: jnp.ndarray
    idx: jnp.ndarray
    masks: jnp.ndarray        # [B, D, s, s] sigmoid probs
    mask_scores: jnp.ndarray  # [B, D] bbox_score * maskiou[label]


def make_ms_rcnn_eval_step(model, cfg) -> Callable:
    """Faster R-CNN box path + mask head + maskiou-corrected mask scores
    (mask_scoring_roi_head.simple_test_mask)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes

    def _mask_fwd(m, feats):
        return m.mask_forward(feats)

    def _miou_fwd(m, feats, pred):
        return m.maskiou_forward(feats, pred)

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

        miou = model.apply(variables,
                           mfeats.reshape((-1,) + mfeats.shape[-3:]),
                           msel.reshape((-1,) + msel.shape[-2:]),
                           method=_miou_fwd).reshape(b, d, c)
        miou_sel = jnp.take_along_axis(
            miou, jnp.clip(dets.labels, 0, c - 1)[:, :, None], axis=-1)[..., 0]
        mask_scores = dets.scores * miou_sel * dets.valid
        return MaskScoringDetections(dets.boxes, dets.scores, dets.labels,
                                     dets.valid, dets.anchor_idx, masks,
                                     mask_scores)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
