"""Hybrid Task Cascade engine.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/htc_roi_head.py:
  - forward_train (:203-330): semantic CE loss (weight .2, ignore
    label); per stage: assign/sample -> bbox branch with semantic RoI
    fusion -> INTERLEAVED refine (no-grad) + re-assign/re-sample ->
    mask branch with semantic fusion and mask info flow (previous
    stages' heads run feature-only on the same feats); stage loss
    weights (1, .5, .25).
  - simple_test (:332-457): cascade rescoring (mean softmax of stages,
    boxes refined stage-to-stage), then every stage's mask head runs on
    the final detections with info flow and the sigmoid masks average.
* mask_heads/fused_semantic_head.py:102-130 (CE at stride 8).

TPU redesign: the interleave re-sampling reuses the dense fixed-slot
sampler; the mask info flow is a static unrolled loop over stages; all
dicts of per-image tensors collapse to [B, S, ...] batch dims.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.bbox import delta_decode
from ..ops.losses import (binary_cross_entropy_with_logits,
                          softmax_cross_entropy)
from ..ops.nms import batched_multiclass_nms
from ..ops.roi_align import multilevel_roi_align, roi_align
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .mask_rcnn import MaskBatch, MaskDetections, _mask_targets_single
from .train import TrainState
from .two_stage import (_extract_rois, _roi_sample_single,
                        _rpn_targets_single, _stage1, make_proposal_fn)


class HTCBatch(NamedTuple):
    """MaskBatch + stride-8 semantic segmentation target (int labels,
    seg_ignore = ignored; the reference's gt_semantic_seg after
    SegRescale 1/8)."""

    images: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_labels: jnp.ndarray
    gt_valid: jnp.ndarray
    anchor_valid: jnp.ndarray
    img_shapes: jnp.ndarray
    gt_masks: jnp.ndarray    # [B, G, R, R]
    gt_seg: jnp.ndarray      # [B, H/8, W/8] int32


def _sem_roi(semantic_feat, rois, out_size):
    """RoIAlign the stride-8 semantic embedding for [B, S, 4] rois
    (semantic_roi_extractor: single level, stride 8, output 14; average
    -pooled to the bbox head's 7 when needed)."""
    def per_image(feat, r):
        return roi_align(feat.astype(jnp.float32), r, out_size,
                         spatial_scale=1.0 / 8.0, sampling_ratio=2)

    out = jax.vmap(per_image)(semantic_feat, rois)
    return out.reshape((-1,) + out.shape[2:])


def make_htc_train_step(model, cfg, tx) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    rc = cfg.rcnn
    num_pos_cap = int(rc.sampler_num * rc.pos_fraction)

    def _sem(m, feats):
        return m.semantic(feats)

    def _roi_stage(m, feats, stage):
        return m.roi_forward(feats, stage)

    def _mask_stage(m, feats, stage, res):
        return m.mask_forward(feats, stage, res)

    def loss_fn(params, batch_stats, batch: HTCBatch, anchors, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        b = rpn_cls.shape[0]

        # ---- semantic branch
        seg_logits, sem_feat = model.apply(variables, feats, method=_sem)
        seg_t = batch.gt_seg
        ok = (seg_t != cfg.seg_ignore) & (seg_t >= 0)
        seg_sel = jnp.clip(seg_t, 0, cfg.seg_classes - 1)
        ce = softmax_cross_entropy(
            seg_logits.reshape(-1, cfg.seg_classes), seg_sel.reshape(-1),
            reduction="none")
        loss_seg = cfg.seg_loss_weight * (
            ce * ok.reshape(-1)).sum() / jnp.maximum(ok.sum(), 1.0)

        # ---- RPN
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

        total = loss_seg + loss_rpn_cls + loss_rpn_bbox
        aux = {"loss_semantic_seg": loss_seg, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox}
        num_pos_all = jnp.zeros((), jnp.float32)
        for stage in range(cfg.num_stages):
            k_roi, k1, k2 = jax.random.split(k_roi, 3)
            stds = cfg.stage_stds[stage]
            thr = cfg.stage_pos_iou_thrs[stage]
            smp = jax.vmap(functools.partial(
                _roi_sample_single, cfg=cfg, pos_iou_thr=thr, stds=stds))(
                jax.random.split(k1, b), props, prop_valid,
                batch.gt_boxes, batch.gt_labels, batch.gt_valid)
            roi_feats = _extract_rois(cfg, feats, smp.rois)
            roi_feats = roi_feats + _sem_roi(sem_feat, smp.rois, rc.roi_size)
            cls, reg = model.apply(variables, roi_feats, stage,
                                   method=_roi_stage)

            labels = smp.labels.reshape(-1)
            label_w = smp.label_weights.reshape(-1)
            avg_cls = jnp.maximum((label_w > 0).sum().astype(jnp.float32), 1.0)
            loss_cls = (softmax_cross_entropy(cls, labels, reduction="none")
                        * label_w).sum() / avg_cls
            pos = smp.is_pos.reshape(-1)
            avg_reg = jnp.maximum(smp.valid.sum().astype(jnp.float32), 1.0)
            loss_bbox = (jnp.abs(reg[:, 0] - smp.bbox_targets.reshape(-1, 4))
                         * pos[:, None]).sum() / avg_reg
            w = cfg.stage_loss_weights[stage]
            total = total + w * (loss_cls + loss_bbox)
            aux[f"s{stage}.loss_cls"] = loss_cls
            aux[f"s{stage}.loss_bbox"] = loss_bbox
            num_pos_all = num_pos_all + pos.sum()

            # ---- interleaved: refine with this stage's deltas, then
            # re-sample for the mask branch
            d = jax.lax.stop_gradient(reg[:, 0]).reshape(b, -1, 4)
            refined = delta_decode(smp.rois, d, stds=stds,
                                   max_shape=batch.img_shapes[:, None, :])
            refined_valid = smp.valid & ~smp.is_gt
            msmp = jax.vmap(functools.partial(
                _roi_sample_single, cfg=cfg, pos_iou_thr=thr, stds=stds))(
                jax.random.split(k2, b), refined, refined_valid,
                batch.gt_boxes, batch.gt_labels, batch.gt_valid)

            p = num_pos_cap
            mrois = msmp.rois[:, :p]
            mfeats = _extract_rois(cfg, feats, mrois,
                                   roi_size=cfg.mask_roi_size)
            mfeats = mfeats + _sem_roi(sem_feat, mrois, cfg.mask_roi_size)
            # mask info flow: run previous heads feature-only
            res = None
            for i in range(stage):
                _, res = model.apply(variables, mfeats, i, res,
                                     method=_mask_stage)
            mlogits, _ = model.apply(variables, mfeats, stage, res,
                                     method=_mask_stage)
            mlogits = mlogits.reshape((b, p) + mlogits.shape[1:])
            mtargets = jax.vmap(functools.partial(
                _mask_targets_single, mask_size=cfg.mask_size))(
                mrois, msmp.gt_idx[:, :p], batch.gt_boxes, batch.gt_masks)
            mlabels = jnp.clip(msmp.labels[:, :p], 0, cfg.num_classes - 1)
            msel = jnp.take_along_axis(
                mlogits, mlabels[:, :, None, None, None], axis=-1)[..., 0]
            mpos = msmp.is_pos[:, :p].astype(jnp.float32)
            per_roi = binary_cross_entropy_with_logits(
                msel, mtargets, reduction="none").mean(axis=(2, 3))
            loss_mask = (per_roi * mpos).sum() / jnp.maximum(mpos.sum(), 1.0)
            total = total + w * loss_mask
            aux[f"s{stage}.loss_mask"] = loss_mask

            # next stage consumes the refined proposals
            props, prop_valid = refined, refined_valid

        aux["loss"] = total
        aux["num_pos"] = num_pos_all
        return total, aux

    def train_step(state: TrainState, batch: HTCBatch, anchors, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: HTCBatch, key):
        return jfn(state, batch, anchors_arg.get(batch.images), key)

    return step


def make_htc_eval_step(model, cfg) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes

    def _sem(m, feats):
        return m.semantic(feats)

    def _roi_stage(m, feats, stage):
        return m.roi_forward(feats, stage)

    def _mask_stage(m, feats, stage, res):
        return m.mask_forward(feats, stage, res)

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        _, sem_feat = model.apply(variables, feats, method=_sem)
        props, _, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        b, p = props.shape[:2]

        logits_sum = None
        for stage in range(cfg.num_stages):
            roi_feats = _extract_rois(cfg, feats, props)
            roi_feats = roi_feats + _sem_roi(sem_feat, props, cfg.rcnn.roi_size)
            cls, reg = model.apply(variables, roi_feats, stage,
                                   method=_roi_stage)
            logits_sum = cls if logits_sum is None else logits_sum + cls
            if stage < cfg.num_stages - 1:
                d = reg[:, 0].reshape(b, p, 4)
                props = delta_decode(props, d, stds=cfg.stage_stds[stage],
                                     max_shape=batch.img_shapes[:, None, :])
        # mean of per-stage RAW logits, softmax once (cascade parity)
        probs = jax.nn.softmax(logits_sum / cfg.num_stages, axis=-1)
        probs = probs.reshape(b, p, c + 1)
        fg = probs[..., :c] * prop_valid[..., None]
        reg_last = reg[:, 0].reshape(b, p, 4)
        boxes = delta_decode(props, reg_last,
                             stds=cfg.stage_stds[-1],
                             max_shape=batch.img_shapes[:, None, :])
        boxes = boxes / batch.scale_factors[:, None, :]
        dets = batched_multiclass_nms(
            boxes[:, :, None, :].repeat(c, axis=2), fg, t.score_thr,
            t.nms_iou_thr, t.max_per_img, t.pre_nms_cands)

        det_net = dets.boxes * batch.scale_factors[:, None, :]
        mfeats = _extract_rois(cfg, feats, det_net,
                               roi_size=cfg.mask_roi_size)
        mfeats = mfeats + _sem_roi(sem_feat, det_net, cfg.mask_roi_size)
        res = None
        msum = None
        for stage in range(cfg.num_stages):
            logit, res = model.apply(variables, mfeats, stage, res,
                                     method=_mask_stage)
            prob = jax.nn.sigmoid(logit)
            msum = prob if msum is None else msum + prob
        mprob = msum / cfg.num_stages
        n = mprob.shape[0]
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
