"""SCNet engine — HTC-style cascade with global context, feature relay,
and a single post-cascade mask head.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/scnet_roi_head.py:203-316 (forward_train:
  semantic CE x0.2 + glbctx multilabel BCE x3; per stage bbox branch
  with semantic + glbctx RoI fusion and no-grad refine; after the last
  stage the POSITIVE rois' shared-fc features relay through
  feat_relay_head into ONE mask head, loss weighted by
  sum(stage_loss_weights)), :318-419 (simple_test: cascade rescoring,
  single mask pass on the detections with all three fusions).
* global_context_head.py:86-100 (targets: multi-hot of the image's gt
  labels; BCEWithLogits).

The glbctx fusion collapses to a per-image broadcast add (the
reference's per-image scatter loop, scnet_roi_head.py:70-78).
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
from .htc import HTCBatch, _sem_roi
from .mask_rcnn import MaskDetections, _mask_targets_single
from .train import TrainState
from .two_stage import (_extract_rois, _roi_sample_single,
                        _rpn_targets_single, _stage1, make_proposal_fn)


def _glbctx_loss(mc_logits, gt_labels, gt_valid, num_classes, weight):
    """Multi-hot BCE over the image's gt classes
    (global_context_head.py:93-100)."""
    onehot = jax.nn.one_hot(gt_labels, num_classes) * gt_valid[..., None]
    target = (onehot.sum(axis=1) > 0).astype(jnp.float32)  # [B, C]
    return weight * binary_cross_entropy_with_logits(
        mc_logits, target, reduction="mean")


def make_scnet_train_step(model, cfg, tx) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    rc = cfg.rcnn
    num_pos_cap = int(rc.sampler_num * rc.pos_fraction)

    def loss_fn(params, batch_stats, batch: HTCBatch, anchors, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images,
                                              method=_stage1)
        b = rpn_cls.shape[0]

        # ---- semantic branch (HTC parity)
        seg_logits, sem_feat = model.apply(
            variables, feats, method=lambda m, f: m.semantic(f))
        seg_t = batch.gt_seg
        ok = (seg_t != cfg.seg_ignore) & (seg_t >= 0)
        ce = softmax_cross_entropy(
            seg_logits.reshape(-1, cfg.seg_classes),
            jnp.clip(seg_t, 0, cfg.seg_classes - 1).reshape(-1),
            reduction="none")
        loss_seg = cfg.seg_loss_weight * (
            ce * ok.reshape(-1)).sum() / jnp.maximum(ok.sum(), 1.0)

        # ---- global context branch
        mc_logits, glb = model.apply(variables, feats,
                                     method=lambda m, f: m.glbctx(f))
        loss_glbctx = _glbctx_loss(mc_logits, batch.gt_labels,
                                   batch.gt_valid, cfg.num_classes,
                                   cfg.glbctx_loss_weight)

        def fuse(roi_feats, rois_shape):
            """roi feats [B*S, s, s, ch] + per-image glbctx vector."""
            s = rois_shape[1]
            g = jnp.repeat(glb, s, axis=0)  # [B*S, ch]
            return roi_feats + g[:, None, None, :].astype(roi_feats.dtype)

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

        total = loss_seg + loss_glbctx + loss_rpn_cls + loss_rpn_bbox
        aux = {"loss_semantic_seg": loss_seg, "loss_glbctx": loss_glbctx,
               "loss_rpn_cls": loss_rpn_cls, "loss_rpn_bbox": loss_rpn_bbox}

        smp = None
        shared_feats = None
        for stage in range(cfg.num_stages):
            k_roi, k1 = jax.random.split(k_roi)
            stds = cfg.stage_stds[stage]
            thr = cfg.stage_pos_iou_thrs[stage]
            smp = jax.vmap(functools.partial(
                _roi_sample_single, cfg=cfg, pos_iou_thr=thr, stds=stds))(
                jax.random.split(k1, b), props, prop_valid,
                batch.gt_boxes, batch.gt_labels, batch.gt_valid)
            roi_feats = _extract_rois(cfg, feats, smp.rois)
            roi_feats = roi_feats + _sem_roi(sem_feat, smp.rois, rc.roi_size)
            roi_feats = fuse(roi_feats, smp.rois.shape)
            cls, reg, shared_feats = model.apply(
                variables, roi_feats, stage,
                method=lambda m, f, s: m.roi_forward(f, s))

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

            if stage < cfg.num_stages - 1:
                d = jax.lax.stop_gradient(reg[:, 0]).reshape(b, -1, 4)
                props = delta_decode(smp.rois, d, stds=stds,
                                     max_shape=batch.img_shapes[:, None, :])
                prop_valid = smp.valid & ~smp.is_gt

        # ---- single mask branch on the last stage's positives, with
        # the relayed shared-fc features
        p = num_pos_cap
        mrois = smp.rois[:, :p]
        s_tot = smp.rois.shape[1]
        rel_in = shared_feats.reshape(b, s_tot, -1)[:, :p].reshape(
            b * p, -1)
        # (no detach: the mask loss reaches the bbox shared fcs through
        # the relay, matching scnet_roi_head.py:303-306)
        relayed = model.apply(variables, rel_in,
                              method=lambda m, x: m.relay(x))
        mfeats = _extract_rois(cfg, feats, mrois, roi_size=cfg.mask_roi_size)
        mfeats = mfeats + _sem_roi(sem_feat, mrois, cfg.mask_roi_size)
        mfeats = fuse(mfeats, mrois.shape)
        mfeats = mfeats + relayed.astype(mfeats.dtype)
        mlogits = model.apply(variables, mfeats,
                              method=lambda m, f: m.mask_forward(f))
        mlogits = mlogits.reshape((b, p) + mlogits.shape[1:])
        mtargets = jax.vmap(functools.partial(
            _mask_targets_single, mask_size=cfg.mask_size))(
            mrois, smp.gt_idx[:, :p], batch.gt_boxes, batch.gt_masks)
        mlabels = jnp.clip(smp.labels[:, :p], 0, cfg.num_classes - 1)
        msel = jnp.take_along_axis(
            mlogits, mlabels[:, :, None, None, None], axis=-1)[..., 0]
        mpos = smp.is_pos[:, :p].astype(jnp.float32)
        per_roi = binary_cross_entropy_with_logits(
            msel, mtargets, reduction="none").mean(axis=(2, 3))
        mask_w = float(sum(cfg.stage_loss_weights))
        loss_mask = mask_w * (per_roi * mpos).sum() / jnp.maximum(
            mpos.sum(), 1.0)
        total = total + loss_mask
        aux["loss_mask"] = loss_mask
        aux["loss"] = total
        aux["num_pos"] = mpos.sum()
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


def make_scnet_eval_step(model, cfg) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images,
                                              method=_stage1)
        _, sem_feat = model.apply(variables, feats,
                                  method=lambda m, f: m.semantic(f))
        _, glb = model.apply(variables, feats,
                             method=lambda m, f: m.glbctx(f))
        props, _, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        b, p = props.shape[:2]

        def fuse(roi_feats, s):
            g = jnp.repeat(glb, s, axis=0)
            return roi_feats + g[:, None, None, :].astype(roi_feats.dtype)

        logits_sum = None
        shared_feats = None
        for stage in range(cfg.num_stages):
            roi_feats = _extract_rois(cfg, feats, props)
            roi_feats = roi_feats + _sem_roi(sem_feat, props,
                                             cfg.rcnn.roi_size)
            roi_feats = fuse(roi_feats, p)
            cls, reg, shared_feats = model.apply(
                variables, roi_feats, stage,
                method=lambda m, f, s: m.roi_forward(f, s))
            logits_sum = cls if logits_sum is None else logits_sum + cls
            if stage < cfg.num_stages - 1:
                d = reg[:, 0].reshape(b, p, 4)
                props = delta_decode(props, d, stds=cfg.stage_stds[stage],
                                     max_shape=batch.img_shapes[:, None, :])
        probs = jax.nn.softmax(logits_sum / cfg.num_stages, axis=-1)
        probs = probs.reshape(b, p, c + 1)
        fg = probs[..., :c] * prop_valid[..., None]
        boxes = delta_decode(props, reg[:, 0].reshape(b, p, 4),
                             stds=cfg.stage_stds[-1],
                             max_shape=batch.img_shapes[:, None, :])
        boxes = boxes / batch.scale_factors[:, None, :]
        dets = batched_multiclass_nms(
            boxes[:, :, None, :].repeat(c, axis=2), fg, t.score_thr,
            t.nms_iou_thr, t.max_per_img, t.pre_nms_cands)

        # single mask pass on the detections with relayed features from
        # a final bbox-head run over them (simple_test :393-412)
        det_net = dets.boxes * batch.scale_factors[:, None, :]
        k = det_net.shape[1]
        roi_feats = _extract_rois(cfg, feats, det_net)
        roi_feats = roi_feats + _sem_roi(sem_feat, det_net,
                                         cfg.rcnn.roi_size)
        roi_feats = fuse(roi_feats, k)
        _, _, shared = model.apply(
            variables, roi_feats, cfg.num_stages - 1,
            method=lambda m, f, s: m.roi_forward(f, s))
        relayed = model.apply(variables, shared,
                              method=lambda m, x: m.relay(x))
        mfeats = _extract_rois(cfg, feats, det_net,
                               roi_size=cfg.mask_roi_size)
        mfeats = mfeats + _sem_roi(sem_feat, det_net, cfg.mask_roi_size)
        mfeats = fuse(mfeats, k)
        mfeats = mfeats + relayed.astype(mfeats.dtype)
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
