"""Faster R-CNN engine: proposal generation, RoI sampling, and the fused
two-stage train / eval steps — each ONE jit region.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/rpn_head.py:135-200 (_get_bboxes_single:
  per-level sigmoid + top-k, decode, level-grouped NMS iou 0.7, top
  max_per_img proposals)
* mmdet/models/detectors/two_stage.py forward_train: RPN losses on
  sampled 256 anchors (train_cfg.rpn) + proposals (train_cfg.rpn_proposal)
  + StandardRoIHead.forward_train (assign 0.5/0.5 match_low_quality=False,
  RandomSampler 512 @ 0.25 with gt-as-proposals, bbox targets with stds
  (.1,.1,.2,.2), CE + L1; roi_heads/standard_roi_head.py,
  bbox_heads/bbox_head.py:116-180,250-307)
* eval: softmax scores, per-class decode, multiclass NMS
  (bbox_head.get_bboxes, score_thr .05 / iou .5 / max 100).

TPU redesign: no ragged anything. Proposals live in fixed [max_per_img]
slot arrays with validity; sampling is ops/sampler.py's static random
ranking; RoI features come from masked multi-level RoIAlign gathers; the
whole train step (both stages + SGD) is a single fused jit program.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import max_iou_assign
from ..ops.bbox import bbox_overlaps, delta_decode, delta_encode
from ..ops.losses import (balanced_l1_loss,
                          binary_cross_entropy_with_logits,
                          softmax_cross_entropy)
from ..ops.nms import batched_multiclass_nms, grouped_nms
from ..ops.roi_align import multilevel_roi_align, roi_align
from ..ops.sampler import libra_sample_pos_neg, random_sample_pos_neg
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def _stage1(m, images):
    feats = m.features(images)
    rpn_cls, rpn_reg = m.rpn(feats)
    return feats, rpn_cls, rpn_reg


def _roi(m, roi_feats):
    return m.roi_forward(roi_feats)


def make_proposal_fn(cfg) -> Callable:
    """Returns proposals(rpn_cls [B,A], rpn_reg [B,A,4], anchors [A,4],
    img_shapes [B,2], nms_pre, max_out) -> (boxes [B,P,4], scores [B,P],
    valid [B,P]). Static shapes; level-grouped greedy NMS."""
    bounds = cfg.level_bounds()

    def proposals(rpn_cls, rpn_reg, anchors, img_shapes, nms_pre: int, max_out: int):
        b = rpn_cls.shape[0]
        scs, bxs, lvls = [], [], []
        for li, (s0, s1) in enumerate(bounds):
            sc = jax.nn.sigmoid(rpn_cls[:, s0:s1])
            reg = rpn_reg[:, s0:s1]
            anc = anchors[s0:s1]
            n = s1 - s0
            if n > nms_pre:
                sc, idx = jax.lax.top_k(sc, nms_pre)
                reg = jnp.take_along_axis(reg, idx[..., None], axis=1)
                anc = anc[idx]
                n = nms_pre
            else:
                anc = jnp.broadcast_to(anc[None], (b,) + anc.shape)
            boxes = delta_decode(anc, reg, max_shape=img_shapes)
            scs.append(sc)
            bxs.append(boxes)
            lvls.append(jnp.full((n,), li, jnp.int32))
        scores = jnp.concatenate(scs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1)
        lvl = jnp.broadcast_to(jnp.concatenate(lvls)[None], scores.shape)
        # min_bbox_size = 0: strictly positive extents survive
        ok = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
        dets = jax.vmap(
            functools.partial(grouped_nms, iou_thr=cfg.rpn.nms_iou_thr, max_out=max_out)
        )(boxes, scores, lvl, ok)
        return dets.boxes, dets.scores, dets.valid

    return proposals


class _RPNTargets(NamedTuple):
    is_pos: jnp.ndarray        # [A] bool (sampled positives, dense)
    weights: jnp.ndarray       # [A] float (1 on sampled pos+neg)
    bbox_targets: jnp.ndarray  # [A, 4]
    num_samples: jnp.ndarray   # int32


def _rpn_targets_single(key, anchors, anchor_valid, gt_boxes, gt_valid, rpn_cfg):
    assigned = max_iou_assign(
        anchors, gt_boxes, gt_valid, anchor_valid=anchor_valid,
        pos_iou_thr=rpn_cfg.pos_iou_thr, neg_iou_thr=rpn_cfg.neg_iou_thr,
        min_pos_iou=rpn_cfg.min_pos_iou, gt_max_assign_all=True,
    )
    s = random_sample_pos_neg(key, assigned, anchor_valid,
                              rpn_cfg.sampler_num, rpn_cfg.pos_fraction,
                              neg_pos_ub=getattr(rpn_cfg, "neg_pos_ub", -1))
    a = anchors.shape[0]
    # scatter-add (never set): invalid sampler slots all carry index 0 and
    # must not clobber a genuine sample landing there
    w = jnp.zeros((a,), jnp.float32).at[s.inds].add(jnp.where(s.valid, 1.0, 0.0))
    pos = jnp.zeros((a,), jnp.int32).at[s.inds].add(
        jnp.where(s.is_pos & s.valid, 1, 0)) > 0
    gt_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
    deltas = delta_encode(anchors, gt_boxes[gt_idx], eps=1e-6)
    bbox_t = jnp.where(pos[:, None], deltas, 0.0)
    return _RPNTargets(pos, w, bbox_t, s.valid.sum().astype(jnp.int32))


class _RoISample(NamedTuple):
    rois: jnp.ndarray          # [S, 4]
    labels: jnp.ndarray        # [S] int32 (num_classes = background)
    label_weights: jnp.ndarray  # [S]
    bbox_targets: jnp.ndarray  # [S, 4] encoded deltas (pos rows)
    is_pos: jnp.ndarray        # [S] bool
    valid: jnp.ndarray         # [S] bool
    is_gt: jnp.ndarray         # [S] bool (roi sourced from a gt row)
    gt_idx: jnp.ndarray        # [S] int32 assigned gt (clipped; pos rows only)


def _roi_sample_single(key, props, prop_valid, gt_boxes, gt_labels, gt_valid,
                       cfg, pos_iou_thr=None, stds=None):
    """Assign + sample RoIs for one image (gt boxes prepended as
    proposals, matching base_sampler.sample's cat order). `pos_iou_thr` /
    `stds` override the rcnn defaults for cascade stages (where neg and
    min_pos thresholds track the pos threshold)."""
    rc = cfg.rcnn
    thr = rc.pos_iou_thr if pos_iou_thr is None else pos_iou_thr
    stds = rc.target_stds if stds is None else stds
    num_gt = gt_boxes.shape[0]
    cands = jnp.concatenate([gt_boxes, props], axis=0)
    cand_valid = jnp.concatenate([gt_valid, prop_valid], axis=0)
    assigned = max_iou_assign(
        cands, gt_boxes, gt_valid, anchor_valid=cand_valid,
        pos_iou_thr=thr, neg_iou_thr=thr if pos_iou_thr is not None else rc.neg_iou_thr,
        min_pos_iou=thr if pos_iou_thr is not None else rc.min_pos_iou,
        match_low_quality=False,
    )
    if getattr(cfg, "num_bins", None):
        # Libra: CombinedSampler (instance-balanced pos + IoU-balanced neg)
        ov = jnp.where(gt_valid[:, None], bbox_overlaps(gt_boxes, cands), 0.0)
        max_ov = jnp.where(cand_valid, jnp.max(ov, axis=0), 0.0)
        s = libra_sample_pos_neg(key, assigned, cand_valid, max_ov,
                                 rc.sampler_num, rc.pos_fraction,
                                 num_gt=num_gt, num_bins=cfg.num_bins)
    else:
        s = random_sample_pos_neg(key, assigned, cand_valid, rc.sampler_num,
                                  rc.pos_fraction)
    rois = cands[s.inds]
    asg = assigned[s.inds]
    gt_idx = jnp.clip(asg - 1, 0, num_gt - 1)
    labels = jnp.where(s.is_pos, gt_labels[gt_idx], cfg.num_classes).astype(jnp.int32)
    deltas = delta_encode(rois, gt_boxes[gt_idx], stds=stds, eps=1e-6)
    bbox_t = jnp.where(s.is_pos[:, None], deltas, 0.0)
    return _RoISample(rois, labels, jnp.where(s.valid, 1.0, 0.0), bbox_t,
                      s.is_pos, s.valid, (s.inds < num_gt) & s.valid, gt_idx)


def _extract_rois(cfg, feats, rois, roi_size: int = None):
    """Batched multi-level RoIAlign: feats per-level [B,H,W,C], rois
    [B,S,4] -> [B*S, roi, roi, C] (f32). roi_size overrides rcnn.roi_size
    (the mask branch extracts at 14, mask_rcnn_r50_fpn.py:56-60)."""
    rc = cfg.rcnn
    size = rc.roi_size if roi_size is None else roi_size
    lvl_feats = [feats[i] for i in range(len(rc.roi_strides))]

    def per_image(*args):
        f = list(args[:-1])
        r = args[-1]
        return multilevel_roi_align(f, r, rc.roi_strides, size,
                                    rc.sampling_ratio, rc.finest_scale)

    out = jax.vmap(per_image)(*lvl_feats, rois)  # [B, S, s, s, C]
    return out.reshape((-1,) + out.shape[2:])


def _extract_rois_groie(model, variables, cfg, feats, rois):
    """GenericRoIExtractor (groie configs): RoIAlign the SAME rois from
    EVERY level (no finest_scale routing), then the model's shared-pre
    -> sum -> post-attention fusion (generic_roi_extractor.py:44-85)."""
    rc = cfg.rcnn
    per_level = []
    for i, stride in enumerate(rc.roi_strides):
        out = jax.vmap(lambda f, r, s=stride: roi_align(
            f, r, rc.roi_size, 1.0 / s, rc.sampling_ratio))(feats[i], rois)
        per_level.append(out.reshape((-1,) + out.shape[2:]))
    return model.apply(variables, per_level,
                       method=lambda m, l: m.groie_fuse(l))


def make_faster_rcnn_train_step(model, cfg, tx) -> Callable:
    """One fused jit step: RPN losses + proposals + RoI sampling + RoI
    losses + SGD update. Signature matches engine.train.make_train_step:
    step(state, batch, key) -> (state, aux)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)

    def loss_fn(params, batch_stats, batch: Batch, anchors, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        b = rpn_cls.shape[0]

        # ---- RPN losses (sampled 256 anchors per image) ----
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

        # ---- proposals (detached, as the reference's proposal_list) ----
        props, _, prop_valid = proposal_fn(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            anchors, batch.img_shapes,
            cfg.rpn.train_nms_pre, cfg.rpn.train_max_per_img)

        # ---- RoI sampling + second-stage losses ----
        smp = jax.vmap(functools.partial(_roi_sample_single, cfg=cfg))(
            jax.random.split(k_roi, b), props, prop_valid,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        if getattr(cfg, "roi_extractor", "single") == "groie":
            roi_feats = _extract_rois_groie(model, variables, cfg, feats,
                                            smp.rois)
        else:
            roi_feats = _extract_rois(cfg, feats, smp.rois)
        cls, reg = model.apply(variables, roi_feats, method=_roi)

        labels = smp.labels.reshape(-1)
        label_w = smp.label_weights.reshape(-1)
        avg_cls = jnp.maximum((label_w > 0).sum().astype(jnp.float32), 1.0)
        loss_cls = (softmax_cross_entropy(cls, labels, reduction="none")
                    * label_w).sum() / avg_cls
        # class-specific regression slice for positive rows
        sel = jnp.clip(labels, 0, cfg.num_classes - 1)
        reg_sel = jnp.take_along_axis(
            reg, jnp.repeat(sel[:, None, None], 4, axis=-1), axis=1)[:, 0]
        pos = smp.is_pos.reshape(-1)
        # avg_factor = number of sampled rois (bbox_head.py:302)
        avg_reg = jnp.maximum(smp.valid.sum().astype(jnp.float32), 1.0)
        if getattr(cfg, "balanced_l1_alpha", None) is not None:
            # Libra: Balanced L1 replaces plain L1 (balanced_l1_loss.py)
            err = balanced_l1_loss(
                reg_sel, smp.bbox_targets.reshape(-1, 4), reduction="none",
                alpha=cfg.balanced_l1_alpha, gamma=cfg.balanced_l1_gamma,
                beta=cfg.balanced_l1_beta)
        else:
            err = jnp.abs(reg_sel - smp.bbox_targets.reshape(-1, 4))
        loss_bbox = (err * pos[:, None]).sum() / avg_reg

        total = loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_bbox
        aux = {"loss": total, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox, "loss_cls": loss_cls,
               "loss_bbox": loss_bbox,
               "num_pos": pos.sum().astype(jnp.float32)}
        return total, aux

    def train_step(state: TrainState, batch: Batch, anchors, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, anchors, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: Batch, key):
        return jfn(state, batch, anchors_arg.get(batch.images), key)

    return step


def make_faster_rcnn_eval_step(model, cfg) -> Callable:
    """step(variables, batch: EvalBatch) -> NMSResult (same contract as
    engine.eval.make_eval_step, consumable by detections_to_per_class)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        props, _, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        if getattr(cfg, "roi_extractor", "single") == "groie":
            roi_feats = _extract_rois_groie(model, variables, cfg, feats,
                                            props)
        else:
            roi_feats = _extract_rois(cfg, feats, props)
        cls, reg = model.apply(variables, roi_feats, method=_roi)
        b, p = props.shape[:2]
        probs = jax.nn.softmax(cls, axis=-1).reshape(b, p, c + 1)
        boxes = delta_decode(
            props[:, :, None, :], reg.reshape(b, p, c, 4),
            stds=cfg.rcnn.target_stds, max_shape=batch.img_shapes[:, None, :])
        boxes = boxes / batch.scale_factors[:, None, None, :]
        fg = probs[..., :c] * prop_valid[..., None]
        return batched_multiclass_nms(
            boxes, fg, t.score_thr, t.nms_iou_thr, t.max_per_img, t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step


# --------------------------------------------------------------------------
# Cascade R-CNN (reference mmdet/models/roi_heads/cascade_roi_head.py)
# --------------------------------------------------------------------------


def _roi_stage(m, roi_feats, stage):
    return m.roi_forward(roi_feats, stage)


def make_cascade_train_step(model, cfg, tx) -> Callable:
    """Fused cascade train step: RPN + three progressively tighter RoI
    stages; each stage re-assigns/re-samples on the previous stage's
    refined (detached, gt-rows-excluded) boxes and its loss is scaled by
    stage_loss_weights (cascade_roi_head.forward_train + refine_bboxes).
    """
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)

    def loss_fn(params, batch_stats, batch: Batch, anchors, key):
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

        total = loss_rpn_cls + loss_rpn_bbox
        aux = {"loss_rpn_cls": loss_rpn_cls, "loss_rpn_bbox": loss_rpn_bbox}
        num_pos_all = jnp.zeros((), jnp.float32)
        for stage in range(cfg.num_stages):
            k_roi, k = jax.random.split(k_roi)
            stds = cfg.stage_stds[stage]
            smp = jax.vmap(functools.partial(
                _roi_sample_single, cfg=cfg,
                pos_iou_thr=cfg.stage_pos_iou_thrs[stage], stds=stds))(
                jax.random.split(k, b), props, prop_valid,
                batch.gt_boxes, batch.gt_labels, batch.gt_valid)
            roi_feats = _extract_rois(cfg, feats, smp.rois)
            cls, reg = model.apply(variables, roi_feats, stage, method=_roi_stage)

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

            if stage < cfg.num_stages - 1:
                # refine for the next stage: decode sampled rois with this
                # stage's (detached) class-agnostic deltas; drop gt rows
                # (refine_bboxes' pos_is_gts exclusion)
                d = jax.lax.stop_gradient(reg[:, 0]).reshape(b, -1, 4)
                props = delta_decode(smp.rois, d, stds=stds,
                                     max_shape=batch.img_shapes[:, None, :])
                prop_valid = smp.valid & ~smp.is_gt

        aux["loss"] = total
        aux["num_pos"] = num_pos_all
        return total, aux

    def train_step(state: TrainState, batch: Batch, anchors, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, anchors, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: Batch, key):
        return jfn(state, batch, anchors_arg.get(batch.images), key)

    return step


def make_cascade_eval_step(model, cfg) -> Callable:
    """Cascade inference (cascade_roi_head.simple_test): each stage
    rescores and refines the boxes; the final detections use the LAST
    stage's boxes under the MEAN of the three stages' softmax scores."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        props, _, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        b, p = props.shape[:2]
        ms_scores = []
        for stage in range(cfg.num_stages):
            roi_feats = _extract_rois(cfg, feats, props)
            cls, reg = model.apply(variables, roi_feats, stage, method=_roi_stage)
            ms_scores.append(cls.reshape(b, p, c + 1))
            # refine (final stage: these ARE the output boxes)
            props = delta_decode(props, reg[:, 0].reshape(b, p, 4),
                                 stds=cfg.stage_stds[stage],
                                 max_shape=batch.img_shapes[:, None, :])
        # average raw logits across stages, softmax ONCE (the reference
        # sums cls_score logits, cascade_roi_head.py:329-332, and
        # get_bboxes applies the single softmax)
        probs = jax.nn.softmax(sum(ms_scores) / cfg.num_stages, axis=-1)
        boxes = props / batch.scale_factors[:, None, :]
        fg = probs[..., :c] * prop_valid[..., None]
        return batched_multiclass_nms(
            boxes, fg, t.score_thr, t.nms_iou_thr, t.max_per_img, t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step


# --------------------------------------------------------------------------
# Dynamic R-CNN (reference mmdet/models/roi_heads/dynamic_roi_head.py)
# --------------------------------------------------------------------------

_DYN_KEY = "__dynamic_rcnn__"
_DYN_EPS = 1e-15


def init_dynamic_state(cfg):
    """The DynamicRoIHead's training statistics as device state: ring
    buffers of the last update_iter_interval per-iteration IoU / beta
    statistics plus the currently active assigner threshold and SmoothL1
    beta (dynamic_roi_head.py:20-22,133-154). Stored under batch_stats
    (it IS mutable non-gradient train state; checkpoints carry it)."""
    t = cfg.update_iter_interval
    return {
        "iou_hist": jnp.zeros((t,), jnp.float32),
        "beta_hist": jnp.zeros((t,), jnp.float32),
        "iou_thr": jnp.asarray(cfg.rcnn.pos_iou_thr, jnp.float32),
        "beta": jnp.asarray(cfg.initial_beta, jnp.float32),
    }


def make_dynamic_rcnn_train_step(model, cfg, tx) -> Callable:
    """Faster R-CNN step with Dynamic R-CNN's adapting hyperparameters:
    the RoI assigner threshold tracks the mean of the per-iteration
    iou_topk-th best proposal IoU, SmoothL1's beta tracks the median of
    the beta_topk-th smallest |xy target|, both refreshed every
    update_iter_interval steps entirely on device (lax.cond instead of
    the reference's python-side history lists)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    interval = cfg.update_iter_interval

    def loss_fn(params, model_stats, batch: Batch, anchors, key, dyn):
        variables = {"params": params, "batch_stats": model_stats}
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

        # --- per-iteration IoU statistic (dynamic_roi_head.py:76-81):
        # the iou_topk-th largest proposal max-overlap, averaged over b
        def prop_max_iou(pb, pv, gb, gv):
            ov = jnp.where(gv[:, None], bbox_overlaps(gb, pb), 0.0)
            return jnp.where(pv, ov.max(axis=0), 0.0)

        mo = jax.vmap(prop_max_iou)(props, prop_valid,
                                    batch.gt_boxes, batch.gt_valid)
        k_iou = min(cfg.iou_topk, mo.shape[1])
        cur_iou = jax.lax.top_k(mo, k_iou)[0][:, -1].mean()

        smp = jax.vmap(functools.partial(_roi_sample_single, cfg=cfg,
                                         pos_iou_thr=dyn["iou_thr"]))(
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
        targets = smp.bbox_targets.reshape(-1, 4)
        beta = dyn["beta"]
        diff = jnp.abs(reg_sel - targets)
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta)
        loss_bbox = (sl1 * pos[:, None]).sum() / avg_reg

        # --- per-iteration beta statistic (dynamic_roi_head.py:119-125):
        # the (beta_topk * b)-th smallest mean |xy| target over positives
        num_pos = pos.sum()
        xy = jnp.abs(targets[:, :2]).mean(axis=1)
        xy_sorted = jnp.sort(jnp.where(pos, xy, jnp.inf))
        k_beta = jnp.clip(jnp.minimum(cfg.beta_topk * b, num_pos), 1)
        cur_beta = xy_sorted[k_beta - 1]
        cur_beta = jnp.where(num_pos > 0, cur_beta, cfg.initial_beta)

        total = loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_bbox
        aux = {"loss": total, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox, "loss_cls": loss_cls,
               "loss_bbox": loss_bbox,
               "num_pos": num_pos.astype(jnp.float32),
               "iou_thr": dyn["iou_thr"], "beta": beta,
               "_cur_iou": jax.lax.stop_gradient(cur_iou),
               "_cur_beta": jax.lax.stop_gradient(cur_beta)}
        return total, aux

    def train_step(state: TrainState, batch: Batch, anchors, key):
        stats = dict(state.batch_stats)
        dyn = stats.pop(_DYN_KEY)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, stats, batch, anchors, key,
                                  dyn)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        idx = state.step % interval
        iou_hist = dyn["iou_hist"].at[idx].set(aux.pop("_cur_iou"))
        beta_hist = dyn["beta_hist"].at[idx].set(aux.pop("_cur_beta"))

        def refresh(d):
            new_iou = jnp.maximum(cfg.initial_iou, iou_hist.mean())
            med = jnp.median(beta_hist)
            new_beta = jnp.where(med < _DYN_EPS, d["beta"],
                                 jnp.minimum(cfg.initial_beta, med))
            return {"iou_hist": iou_hist, "beta_hist": beta_hist,
                    "iou_thr": new_iou, "beta": new_beta}

        def keep(d):
            return {"iou_hist": iou_hist, "beta_hist": beta_hist,
                    "iou_thr": d["iou_thr"], "beta": d["beta"]}

        dyn = jax.lax.cond(idx == interval - 1, refresh, keep, dyn)
        new_stats = {**stats, _DYN_KEY: dyn}
        return TrainState(state.step + 1, params, new_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: Batch, key):
        if _DYN_KEY not in state.batch_stats:
            state = state._replace(batch_stats={**state.batch_stats,
                                                _DYN_KEY: init_dynamic_state(cfg)})
        return jfn(state, batch, anchors_arg.get(batch.images), key)

    return step


# --------------------------------------------------------------------------
# Double-Head R-CNN (reference mmdet/models/roi_heads/double_roi_head.py)
# --------------------------------------------------------------------------


def _scale_rois(rois: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Rescale each roi's w/h by `factor` around its center
    (single_level_roi_extractor.py roi_rescale)."""
    cx = (rois[..., 0] + rois[..., 2]) * 0.5
    cy = (rois[..., 1] + rois[..., 3]) * 0.5
    hw = (rois[..., 2] - rois[..., 0]) * (0.5 * factor)
    hh = (rois[..., 3] - rois[..., 1]) * (0.5 * factor)
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def _roi_double(m, cls_feats, reg_feats, train):
    return m.roi_forward(cls_feats, reg_feats, train)


def _extract_rois_routed(cfg, feats, rois, routing_rois):
    rc = cfg.rcnn
    lvl_feats = [feats[i] for i in range(len(rc.roi_strides))]

    def per_image(*args):
        f = list(args[:-2])
        r, rr = args[-2], args[-1]
        return multilevel_roi_align(f, r, rc.roi_strides, rc.roi_size,
                                    rc.sampling_ratio, rc.finest_scale,
                                    routing_rois=rr)

    out = jax.vmap(per_image)(*lvl_feats, rois, routing_rois)
    return out.reshape((-1,) + out.shape[2:])


def make_double_head_train_step(model, cfg, tx) -> Callable:
    """Double-Head R-CNN: cls features from the roi, reg features from
    the 1.3x-rescaled roi (level routing on the original roi), CE and
    SmoothL1 both at loss_weight 2.0 (double_roi_head.py:16-33 +
    configs/double_heads/dh_faster_rcnn_r50_fpn_1x_coco.py). The conv
    branch's BatchNorm trains (mutable batch_stats through the RoI
    apply)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)

    def loss_fn(params, batch_stats, batch: Batch, anchors, key):
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
        cls_feats = _extract_rois(cfg, feats, smp.rois)
        reg_feats = _extract_rois_routed(
            cfg, feats, _scale_rois(smp.rois, cfg.reg_roi_scale_factor),
            smp.rois)
        (cls, reg), upd = model.apply(
            variables, cls_feats, reg_feats, True, method=_roi_double,
            mutable=["batch_stats"])

        labels = smp.labels.reshape(-1)
        label_w = smp.label_weights.reshape(-1)
        avg_cls = jnp.maximum((label_w > 0).sum().astype(jnp.float32), 1.0)
        loss_cls = cfg.cls_loss_weight * (
            softmax_cross_entropy(cls, labels, reduction="none")
            * label_w).sum() / avg_cls
        sel = jnp.clip(labels, 0, cfg.num_classes - 1)
        reg_sel = jnp.take_along_axis(
            reg, jnp.repeat(sel[:, None, None], 4, axis=-1), axis=1)[:, 0]
        pos = smp.is_pos.reshape(-1)
        avg_reg = jnp.maximum(smp.valid.sum().astype(jnp.float32), 1.0)
        diff = jnp.abs(reg_sel - smp.bbox_targets.reshape(-1, 4))
        sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
        loss_bbox = cfg.bbox_loss_weight * (sl1 * pos[:, None]).sum() / avg_reg

        total = loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_bbox
        aux = {"loss": total, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox, "loss_cls": loss_cls,
               "loss_bbox": loss_bbox,
               "num_pos": pos.sum().astype(jnp.float32),
               "_new_stats": upd["batch_stats"]}
        return total, aux

    def train_step(state: TrainState, batch: Batch, anchors, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, key)
        new_stats = aux.pop("_new_stats")
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, new_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: Batch, key):
        return jfn(state, batch, anchors_arg.get(batch.images), key)

    return step


def make_double_head_eval_step(model, cfg) -> Callable:
    """Faster R-CNN eval with the double extraction (BN frozen)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        props, _, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        cls_feats = _extract_rois(cfg, feats, props)
        reg_feats = _extract_rois_routed(
            cfg, feats, _scale_rois(props, cfg.reg_roi_scale_factor), props)
        cls, reg = model.apply(variables, cls_feats, reg_feats, False,
                               method=_roi_double)
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
