"""Seesaw-loss Mask R-CNN engine (long-tailed instance segmentation).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/losses/seesaw_loss.py:11-76 (seesaw_ce_loss: per-pair
  mitigation factor (cum_i / cum_j)^p for rarer negatives and a
  compensation factor (score_j / score_label)^q for over-confident
  negatives, folded into the logits as log-weights on the non-target
  classes before a plain CE), :137-261 (the C+2-channel head: C class
  logits trained on POSITIVE rois only + a 2-way objectness softmax on
  everything; cum_samples accumulated across steps; get_activation:
  softmax(classes) * p(pos), background = p(neg)).
* configs/seesaw_loss/mask_rcnn_r50_fpn_random_seesaw_loss_*_lvis_v1.py
  (p=0.8, q=2.0, RandomSampler — the plain-Linear 'random' variant).

TPU redesign: the reference mutates a module buffer with a python loop
over unique labels; here cum_samples lives in `state.batch_stats`
(exactly like BN running stats / the GHM density bins) and updates as
one bincount scatter-add inside the jit step.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.bbox import delta_decode
from ..ops.losses import (binary_cross_entropy_with_logits,
                          softmax_cross_entropy)
from ..ops.nms import batched_multiclass_nms
from .batch import ConstArg, EvalBatch, prepare_images
from .mask_rcnn import MaskBatch, MaskDetections, _mask_targets_single
from .train import TrainState
from .two_stage import (_extract_rois, _roi, _roi_sample_single,
                        _rpn_targets_single, _stage1, make_proposal_fn)

SEESAW_KEY = "seesaw_cum_samples"


def seesaw_ce(cls_logits, labels, weights, cum_samples, num_classes: int,
              p: float, q: float, eps: float):
    """seesaw_ce_loss as dense masked ops: [N, C] logits, [N] labels
    (only rows with weights > 0 contribute), [C] cumulative counts.
    Returns the weighted per-row loss sum."""
    onehot = jax.nn.one_hot(labels, num_classes)
    w = jnp.ones_like(cls_logits)
    if p > 0:
        cs = jnp.maximum(cum_samples, 1.0)
        ratio = cs[None, :] / cs[:, None]            # [C, C] j per i
        miti = jnp.where(ratio < 1.0, ratio ** p, 1.0)
        w = w * miti[labels]
    if q > 0:
        scores = jax.nn.softmax(jax.lax.stop_gradient(cls_logits), axis=-1)
        self_s = jnp.take_along_axis(scores, labels[:, None], axis=-1)
        ratio = scores / jnp.maximum(self_s, eps)
        comp = jnp.where(ratio > 1.0, ratio ** q, 1.0)
        w = w * comp
    adjusted = cls_logits + jnp.log(jnp.maximum(w, 1e-12)) * (1.0 - onehot)
    ce = softmax_cross_entropy(adjusted, labels, reduction="none")
    return (ce * weights).sum()


def make_seesaw_train_step(model, cfg, tx) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    rc = cfg.rcnn
    num_pos_cap = int(rc.sampler_num * rc.pos_fraction)
    c = cfg.num_classes

    def loss_fn(params, stats, batch: MaskBatch, anchors, key):
        cum = stats[SEESAW_KEY]
        model_stats = {k: v for k, v in stats.items() if k != SEESAW_KEY}
        variables = {"params": params, "batch_stats": model_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images,
                                              method=_stage1)
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
        # accumulate per-class sample counts BEFORE the loss
        # (seesaw_loss.py:231-234; C+1 slots incl. background)
        counts = jnp.zeros((c + 1,), jnp.float32).at[labels].add(
            jnp.where(label_w > 0, 1.0, 0.0))
        cum = cum + counts

        cls_classes = cls[:, :c]
        cls_obj = cls[:, c:]
        pos = smp.is_pos.reshape(-1)
        avg = jnp.maximum((label_w > 0).sum().astype(jnp.float32), 1.0)
        # class CE on positives only, seesaw-adjusted
        loss_cls_classes = seesaw_ce(
            cls_classes, jnp.clip(labels, 0, c - 1),
            jnp.where(pos, label_w, 0.0), cum[:c], c,
            cfg.seesaw_p, cfg.seesaw_q, cfg.seesaw_eps) / avg
        # 2-way objectness on every sampled roi (0 = pos, 1 = neg)
        obj_labels = jnp.where(labels == c, 1, 0)
        loss_cls_obj = (softmax_cross_entropy(cls_obj, obj_labels,
                                              reduction="none")
                        * label_w).sum() / avg

        sel = jnp.clip(labels, 0, c - 1)
        reg_sel = jnp.take_along_axis(
            reg, jnp.repeat(sel[:, None, None], 4, axis=-1), axis=1)[:, 0]
        avg_reg = jnp.maximum(smp.valid.sum().astype(jnp.float32), 1.0)
        loss_bbox = (jnp.abs(reg_sel - smp.bbox_targets.reshape(-1, 4))
                     * pos[:, None]).sum() / avg_reg

        p_cap = num_pos_cap
        mrois = smp.rois[:, :p_cap]
        mfeats = _extract_rois(cfg, feats, mrois, roi_size=cfg.mask_roi_size)
        mlogits = model.apply(variables, mfeats,
                              method=lambda m, f: m.mask_forward(f))
        mlogits = mlogits.reshape((b, p_cap) + mlogits.shape[1:])
        mtargets = jax.vmap(functools.partial(
            _mask_targets_single, mask_size=cfg.mask_size))(
            mrois, smp.gt_idx[:, :p_cap], batch.gt_boxes, batch.gt_masks)
        mlabels = jnp.clip(smp.labels[:, :p_cap], 0, c - 1)
        msel = jnp.take_along_axis(
            mlogits, mlabels[:, :, None, None, None], axis=-1)[..., 0]
        mpos = smp.is_pos[:, :p_cap].astype(jnp.float32)
        per_roi = binary_cross_entropy_with_logits(
            msel, mtargets, reduction="none").mean(axis=(2, 3))
        loss_mask = (per_roi * mpos).sum() / jnp.maximum(mpos.sum(), 1.0)

        total = (loss_rpn_cls + loss_rpn_bbox + loss_cls_classes
                 + loss_cls_obj + loss_bbox + loss_mask)
        aux = {"loss": total, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox,
               "loss_cls_classes": loss_cls_classes,
               "loss_cls_objectness": loss_cls_obj,
               "loss_bbox": loss_bbox, "loss_mask": loss_mask,
               "num_pos": pos.sum().astype(jnp.float32)}
        return total, (aux, cum)

    def train_step(state: TrainState, batch: MaskBatch, anchors, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (aux, cum)), grads = grad_fn(state.params, state.batch_stats,
                                         batch, anchors, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        stats = dict(state.batch_stats)
        stats[SEESAW_KEY] = cum
        return TrainState(state.step + 1, params, stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: MaskBatch, key):
        if SEESAW_KEY not in state.batch_stats:
            state = state._replace(batch_stats={
                **state.batch_stats,
                SEESAW_KEY: jnp.zeros((cfg.num_classes + 1,), jnp.float32)})
        return jfn(state, batch, anchors_arg.get(batch.images), key)

    return step


def make_seesaw_eval_step(model, cfg) -> Callable:
    """Mask R-CNN eval with the seesaw activation (get_activation:
    softmax(classes) * p(pos); background prob = p(neg))."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes

    def eval_step(variables, batch: EvalBatch, anchors):
        # strip the optimizer-side cum_samples if a caller passes the
        # training batch_stats through unchanged
        bs = {k: v for k, v in variables.get("batch_stats", {}).items()
              if k != SEESAW_KEY}
        variables = {"params": variables["params"], "batch_stats": bs}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images,
                                              method=_stage1)
        props, _, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        roi_feats = _extract_rois(cfg, feats, props)
        cls, reg = model.apply(variables, roi_feats, method=_roi)
        b, p = props.shape[:2]
        score_cls = jax.nn.softmax(cls[:, :c], axis=-1)
        score_obj = jax.nn.softmax(cls[:, c:], axis=-1)
        probs = (score_cls * score_obj[:, :1]).reshape(b, p, c)
        boxes = delta_decode(
            props[:, :, None, :], reg.reshape(b, p, c, 4),
            stds=cfg.rcnn.target_stds, max_shape=batch.img_shapes[:, None, :])
        boxes = boxes / batch.scale_factors[:, None, None, :]
        fg = probs * prop_valid[..., None]
        dets = batched_multiclass_nms(
            boxes, fg, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

        det_net = dets.boxes * batch.scale_factors[:, None, :]
        mfeats = _extract_rois(cfg, feats, det_net,
                               roi_size=cfg.mask_roi_size)
        mlogits = model.apply(variables, mfeats,
                              method=lambda m, f: m.mask_forward(f))
        mprob = jax.nn.sigmoid(mlogits)
        lab = jnp.clip(dets.labels.reshape(-1), 0, c - 1)
        sel = jnp.take_along_axis(mprob, lab[:, None, None, None],
                                  axis=-1)[..., 0]
        masks = sel.reshape(b, -1, cfg.mask_size, cfg.mask_size)
        return MaskDetections(dets.boxes, dets.scores, dets.labels,
                              dets.valid, dets.anchor_idx, masks)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
