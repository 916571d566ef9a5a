"""TridentNet engine — branch-replicated C4 Faster R-CNN training in one
fused jit step, single-branch eval.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/detectors/trident_faster_rcnn.py:60 (forward_train
  replicates gts across the 3 branches — the branch axis rides the
  batch axis, branch-major), :33 (simple_test runs only
  test_branch_idx, a plain dilation-2 stage 3).
* configs/tridentnet/tridentnet_r50_caffe_1x_coco.py — RPN proposal
  max_per_img=500 at train, RoI RandomSampler num=128 pos_fraction=0.5
  with add_gt_as_proposals=False (unlike the FPN Faster R-CNN).
* configs/_base_/models/faster_rcnn_r50_caffe_c4.py — single-level
  RoIAlign 14 on C4 + conv5 ResLayer head; RPN/RCNN losses as the
  standard two-stage criterion.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import max_iou_assign
from ..ops.bbox import delta_decode, delta_encode
from ..ops.losses import binary_cross_entropy_with_logits, softmax_cross_entropy
from ..ops.nms import batched_multiclass_nms
from ..ops.roi_align import roi_align
from ..ops.sampler import random_sample_pos_neg
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState
from .two_stage import _rpn_targets_single, make_proposal_fn


class _RoISampleNoGt(NamedTuple):
    rois: jnp.ndarray
    labels: jnp.ndarray
    label_weights: jnp.ndarray
    bbox_targets: jnp.ndarray
    is_pos: jnp.ndarray
    valid: jnp.ndarray


def _roi_sample_no_gt(key, props, prop_valid, gt_boxes, gt_labels, gt_valid,
                      cfg):
    """RoI assign + sample WITHOUT prepending gts as candidates
    (add_gt_as_proposals=False, tridentnet config)."""
    rc = cfg.rcnn
    assigned = max_iou_assign(
        props, gt_boxes, gt_valid, anchor_valid=prop_valid,
        pos_iou_thr=rc.pos_iou_thr, neg_iou_thr=rc.neg_iou_thr,
        min_pos_iou=rc.min_pos_iou, match_low_quality=False)
    s = random_sample_pos_neg(key, assigned, prop_valid, rc.sampler_num,
                              rc.pos_fraction)
    rois = props[s.inds]
    asg = assigned[s.inds]
    gt_idx = jnp.clip(asg - 1, 0, gt_boxes.shape[0] - 1)
    labels = jnp.where(s.is_pos, gt_labels[gt_idx],
                       cfg.num_classes).astype(jnp.int32)
    deltas = delta_encode(rois, gt_boxes[gt_idx], stds=rc.target_stds,
                          eps=1e-6)
    bbox_t = jnp.where(s.is_pos[:, None], deltas, 0.0)
    return _RoISampleNoGt(rois, labels, jnp.where(s.valid, 1.0, 0.0), bbox_t,
                          s.is_pos, s.valid)


def _extract_c4_rois(cfg, feat, rois):
    """Single-level RoIAlign on C4: feat [N, H, W, C], rois [N, S, 4] ->
    [N*S, roi, roi, C]."""
    rc = cfg.rcnn
    out = jax.vmap(lambda f, r: roi_align(
        f, r, rc.roi_size, 1.0 / cfg.c4_stride, rc.sampling_ratio))(feat, rois)
    return out.reshape((-1,) + out.shape[2:])


def make_trident_train_step(model, cfg, tx) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    r = len(cfg.trident_dilations)

    def loss_fn(params, batch_stats, batch: Batch, anchors, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feat = model.apply(variables, images,
                           method=lambda m, im: m.features(im))  # [R*B, ...]
        rpn_cls, rpn_reg = model.apply(variables, feat,
                                       method=lambda m, f: m.rpn(f))
        rb = rpn_cls.shape[0]

        # branch-major gt replication (trident_faster_rcnn.py:60)
        tile = lambda x: jnp.tile(x, (r,) + (1,) * (x.ndim - 1))
        gt_boxes = tile(batch.gt_boxes)
        gt_labels = tile(batch.gt_labels)
        gt_valid = tile(batch.gt_valid)
        anchor_valid = tile(batch.anchor_valid)
        img_shapes = tile(batch.img_shapes)

        k_rpn, k_roi = jax.random.split(key)
        t = jax.vmap(functools.partial(_rpn_targets_single, rpn_cfg=cfg.rpn),
                     in_axes=(0, None, 0, 0, 0))(
            jax.random.split(k_rpn, rb), anchors, anchor_valid,
            gt_boxes, gt_valid)
        num_total = jnp.maximum(t.num_samples.sum().astype(jnp.float32), 1.0)
        loss_rpn_cls = (binary_cross_entropy_with_logits(
            rpn_cls, t.is_pos.astype(jnp.float32), reduction="none")
            * t.weights).sum() / num_total
        loss_rpn_bbox = (jnp.abs(rpn_reg - t.bbox_targets)
                         * t.is_pos[..., None]).sum() / num_total

        props, _, prop_valid = proposal_fn(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            anchors, img_shapes, cfg.rpn.train_nms_pre,
            cfg.rpn.train_max_per_img)

        smp = jax.vmap(functools.partial(_roi_sample_no_gt, cfg=cfg))(
            jax.random.split(k_roi, rb), props, prop_valid,
            gt_boxes, gt_labels, gt_valid)
        roi_feats = _extract_c4_rois(cfg, feat, smp.rois)
        cls, reg = model.apply(variables, roi_feats,
                               method=lambda m, x: m.roi_forward(x))

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

        total = loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_bbox
        aux = {"loss": total, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox, "loss_cls": loss_cls,
               "loss_bbox": loss_bbox,
               "num_pos": pos.sum().astype(jnp.float32)}
        return total, aux

    def train_step(state: TrainState, batch: Batch, anchors, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: Batch, key):
        return jfn(state, batch, anchors_arg.get(batch.images), key)

    return step


def make_trident_eval_step(model, cfg) -> Callable:
    """Single-branch (test_branch_idx) eval -> NMSResult."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feat = model.apply(
            variables, images,
            method=lambda m, im: m.features(im, single_branch=True))
        rpn_cls, rpn_reg = model.apply(variables, feat,
                                       method=lambda m, f: m.rpn(f))
        props, _, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        roi_feats = _extract_c4_rois(cfg, feat, props)
        cls, reg = model.apply(variables, roi_feats,
                               method=lambda m, x: m.roi_forward(x))
        b, p = props.shape[:2]
        probs = jax.nn.softmax(cls, axis=-1).reshape(b, p, c + 1)
        boxes = delta_decode(
            props[:, :, None, :], reg.reshape(b, p, c, 4),
            stds=cfg.rcnn.target_stds, max_shape=batch.img_shapes[:, None, :])
        boxes = boxes / batch.scale_factors[:, None, None, :]
        fg = probs[..., :c] * prop_valid[..., None]
        return batched_multiclass_nms(
            boxes, fg, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
