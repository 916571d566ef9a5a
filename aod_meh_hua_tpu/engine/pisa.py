"""PISA (Prime Sample Attention) RetinaNet engine: ISR-P reweighting +
CARL loss on the standard retina targets.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/losses/pisa_loss.py:
  - isr_p (:8-122): positives get IoU-HLR importance weights — rank the
    decoded-pred-vs-decoded-target IoUs DESCENDING within each (class,
    gt) group, add (max_l_num - rank) to the IoU, re-rank within the
    class group, map rank r to weight lw * (max_l_num - r)/max_l_num,
    sharpen with (bias + w*(1-bias))^k, then rescale so the weighted
    positive cls loss keeps its original sum.
  - carl_loss (:125-183): a third loss — per-positive smooth-L1
    regression weighted by (bias + (1-bias)*sigmoid cls score)^k,
    normalized so the weights sum to num_pos, averaged by num_total_pos.
* mmdet/models/dense_heads/pisa_retinanet_head.py:22-159 (flattened
  multi-level loss with isr/carl; num_total_samples = num_pos).
* configs/pisa/pisa_retinanet_r50_fpn_1x_coco.py: SmoothL1 beta .11,
  isr k=2 bias=0, carl k=1 bias=0.2.

TPU redesign: the reference's nested python loops over unique labels /
gts (with .sort() host syncs per group) collapse to TWO sort-based
dense group rankings — a stable argsort on a composite (group, -value)
key plus a scatter-min of in-sort positions recovers every group's
descending ranks at once, O(N log N), no host round trips.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import anchor_targets
from ..ops.bbox import delta_decode
from ..ops.losses import sigmoid_focal_loss_elementwise
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def group_rank_desc(values, group_id, mask, num_groups):
    """Descending rank (0 = largest) of each masked element WITHIN its
    group. Stable: ties rank by original index. Masked-out elements get
    an arbitrary large rank. group_id must be in [0, num_groups)."""
    n = values.shape[0]
    gid = jnp.where(mask, group_id, num_groups).astype(jnp.int32)
    # lexsort: primary = group (masked last), secondary = value desc,
    # ties stable by index — exact grouped sort at any scale
    order = jnp.lexsort((-values, gid))
    pos = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    gfirst = jnp.full((num_groups + 1,), n, jnp.int32).at[gid].min(pos)
    return pos - gfirst[gid]


def isr_p_label_weights(cls_scores, deltas, t_labels, t_label_weights,
                        t_bbox_targets, anchors, gt_group, num_classes,
                        target_stds, k, bias, use_sigmoid=True):
    """Dense isr_p: returns the new [N] label weights (pisa_loss.py:8-122).

    cls_scores [N, C(+1)] raw logits, deltas [N, 4] (already gathered at
    the positive label for class-specific heads), anchors/rois [N, 4];
    gt_group [N] GLOBAL gt index (img * max_gt + gt) of each positive.
    use_sigmoid False = the RoI softmax-CE normalization branch
    (pos_loss_cls.dim() == 1, pisa_loss.py:107-115)."""
    is_pos = t_labels < num_classes
    num_pos = jnp.maximum(is_pos.sum(), 1).astype(jnp.float32)

    pred_boxes = delta_decode(anchors, jax.lax.stop_gradient(deltas),
                              stds=target_stds)
    target_boxes = delta_decode(anchors, t_bbox_targets, stds=target_stds)
    x1 = jnp.maximum(pred_boxes[:, 0], target_boxes[:, 0])
    y1 = jnp.maximum(pred_boxes[:, 1], target_boxes[:, 1])
    x2 = jnp.minimum(pred_boxes[:, 2], target_boxes[:, 2])
    y2 = jnp.minimum(pred_boxes[:, 3], target_boxes[:, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area_p = (pred_boxes[:, 2] - pred_boxes[:, 0]) * (pred_boxes[:, 3] - pred_boxes[:, 1])
    area_t = (target_boxes[:, 2] - target_boxes[:, 0]) * (target_boxes[:, 3] - target_boxes[:, 1])
    ious = inter / jnp.maximum(area_p + area_t - inter, 1e-6)

    # max_l_num: the largest per-class positive population
    cls_counts = jnp.zeros((num_classes,), jnp.int32).at[
        jnp.where(is_pos, t_labels, 0)].add(is_pos.astype(jnp.int32))
    max_l_num = jnp.maximum(cls_counts.max(), 1).astype(jnp.float32)

    # step 1: rank IoUs desc within each (class, gt) group's positives
    # (the reference loops unique labels THEN unique gts inside, :86-95)
    n = gt_group.shape[0]
    cg = jnp.clip(gt_group, 0, n - 1) * num_classes + jnp.where(
        is_pos, t_labels, 0)
    t_rank = group_rank_desc(ious, cg, is_pos, n * num_classes)
    ious_adj = ious + (max_l_num - t_rank.astype(jnp.float32))
    # step 2: rank adjusted IoUs desc within each CLASS -> IoU-HLR
    l_rank = group_rank_desc(ious_adj, jnp.where(is_pos, t_labels, 0),
                             is_pos, num_classes)
    w = t_label_weights * (max_l_num - l_rank.astype(jnp.float32)) / max_l_num
    w = (bias + w * (1.0 - bias)) ** k

    # rescale so the weighted positive cls loss keeps its sum
    logits = jax.lax.stop_gradient(cls_scores)
    if use_sigmoid:
        pos_loss = jnp.where(
            is_pos[:, None],
            sigmoid_focal_loss_elementwise(logits, t_labels), 0.0)
        ori = (pos_loss * t_label_weights[:, None]).sum()
        new = (pos_loss * w[:, None]).sum()
    else:
        logp = jax.nn.log_softmax(logits, axis=-1)
        sel = jnp.clip(t_labels, 0, logp.shape[-1] - 1)
        ce = -jnp.take_along_axis(logp, sel[:, None], axis=1)[:, 0]
        ce = jnp.where(is_pos, ce, 0.0)
        ori = (ce * t_label_weights).sum()
        new = (ce * w).sum()
    ratio = ori / jnp.maximum(new, 1e-12)
    return jnp.where(is_pos, w * ratio, t_label_weights)


def carl_loss_dense(cls_scores, t_labels, deltas, t_bbox_targets,
                    num_classes, beta, k, bias, avg_factor,
                    use_sigmoid=True):
    """Dense carl_loss (pisa_loss.py:125-183): smooth-L1 regression at
    `beta`, weighted by the (sigmoid or softmax) score of the target
    class. deltas pre-gathered at the positive label for class-specific
    heads."""
    is_pos = t_labels < num_classes
    num_pos = is_pos.sum().astype(jnp.float32)
    sel = jnp.clip(t_labels, 0, num_classes - 1)
    probs = (jax.nn.sigmoid(cls_scores) if use_sigmoid
             else jax.nn.softmax(cls_scores, axis=-1))
    score = jnp.take_along_axis(probs, sel[:, None], axis=1)[:, 0]
    w = (bias + (1.0 - bias) * score) ** k
    w = jnp.where(is_pos, w, 0.0)
    w = w * (num_pos / jnp.maximum(w.sum(), 1e-12))
    diff = jnp.abs(deltas - t_bbox_targets)
    sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    per = sl1 / jnp.maximum(avg_factor, 1.0)
    return (per * (w * is_pos)[:, None]).sum()


def make_pisa_retina_train_step(model, cfg, tx) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    targets_fn = jax.vmap(
        functools.partial(
            anchor_targets, num_classes=cfg.num_classes,
            target_stds=cfg.target_stds,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=0.0),
        in_axes=(None, 0, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, anchors):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, deltas = model.apply(variables, images)
        b, a = cls_scores.shape[:2]
        t = targets_fn(anchors, batch.anchor_valid,
                       batch.gt_boxes, batch.gt_labels, batch.gt_valid)

        g = batch.gt_boxes.shape[1]
        gt_group = (jnp.arange(b, dtype=jnp.int32)[:, None] * g
                    + t.gt_inds).reshape(-1)
        flat_cls = cls_scores.reshape(-1, cfg.num_classes)
        flat_deltas = deltas.reshape(-1, 4)
        flat_anchors = jnp.broadcast_to(anchors, (b,) + anchors.shape
                                        ).reshape(-1, 4)
        labels = t.labels.reshape(-1)
        lw = isr_p_label_weights(
            flat_cls, flat_deltas, labels, t.label_weights.reshape(-1),
            t.bbox_targets.reshape(-1, 4), flat_anchors, gt_group,
            cfg.num_classes, cfg.target_stds, cfg.isr_k, cfg.isr_bias)
        lw = jax.lax.stop_gradient(lw)

        num_total = jnp.maximum(
            t.bbox_weights[..., 0].sum(), 1.0)  # focal: num_total_pos
        loss_cls = (sigmoid_focal_loss_elementwise(flat_cls, labels)
                    * lw[:, None]).sum() / num_total
        beta = cfg.smooth_l1_beta
        diff = jnp.abs(flat_deltas - t.bbox_targets.reshape(-1, 4))
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta)
        loss_bbox = (sl1 * t.bbox_weights.reshape(-1, 4)).sum() / num_total
        loss_carl = carl_loss_dense(
            flat_cls, labels, flat_deltas, t.bbox_targets.reshape(-1, 4),
            cfg.num_classes, beta, cfg.carl_k, cfg.carl_bias, num_total)

        total = loss_cls + loss_bbox + loss_carl
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "loss_carl": loss_carl, "num_pos": num_total}
        return total, aux

    def train_step(state: TrainState, batch: Batch, anchors):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, anchors_arg.get(batch.images))

    return step


# --------------------------------------------------------------------------
# PISA Faster R-CNN (reference mmdet/models/roi_heads/pisa_roi_head.py +
# core/bbox/samplers/score_hlr_sampler.py +
# configs/pisa/pisa_faster_rcnn_r50_fpn_1x_coco.py)
# --------------------------------------------------------------------------


def _score_hlr_neg(key, cands, neg_mask, invalid_ok, cls_nograd, delta_nograd,
                   num_expected_neg, cfg):
    """Dense ScoreHLRSampler._sample_neg (score_hlr_sampler.py:101-213):
    returns (sel_neg [N] bool, neg_weight [N] float).

    The reference's nms_match grouping is recovered exactly: the greedy
    NMS keep set over score-desc valid negatives IS the set of group
    leaders, and every box's group is the highest-scoring leader
    overlapping it above iou_thr (leaders claim unmatched boxes in score
    order)."""
    rc = cfg.rcnn
    c = cfg.num_classes
    krand = key
    probs = jax.nn.softmax(cls_nograd, axis=-1)
    max_score = probs[:, :c].max(axis=-1)
    argmax_cls = probs[:, :c].argmax(axis=-1)
    ce_bg = -jnp.log(jnp.clip(probs[:, c], 1e-12, None))  # ori_loss (bg CE)

    valid = neg_mask & (max_score > cfg.hlr_score_thr)
    num_valid = valid.sum()
    n = cands.shape[0]

    sel_delta = jnp.take_along_axis(
        delta_nograd.reshape(n, c, 4),
        jnp.repeat(argmax_cls[:, None, None], 4, axis=-1), axis=1)[:, 0]
    boxes = delta_decode(cands, sel_delta, stds=rc.target_stds)

    # nms_match: leaders = greedy keep over score-desc valid negatives
    from ..ops.nms import _greedy_keep_sorted

    order = jnp.argsort(jnp.where(valid, -max_score, jnp.inf))
    keep_sorted = _greedy_keep_sorted(boxes[order], valid[order],
                                      cfg.hlr_iou_thr)
    leaders = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    iou = jnp.clip(_aligned_free_iou(boxes), 0.0, 1.0)  # [N, N]
    cover = leaders[None, :] & (iou > cfg.hlr_iou_thr)
    cover = cover | (jnp.eye(n, dtype=bool) & leaders[:, None])
    lead_score = jnp.where(cover, max_score[None, :], -jnp.inf)
    group = lead_score.argmax(axis=1)

    g_rank = group_rank_desc(max_score, group, valid, n)
    imp = num_valid.astype(jnp.float32) - g_rank.astype(jnp.float32) + max_score
    imp_rank = group_rank_desc(imp, jnp.zeros((n,), jnp.int32), valid, 1)

    num_hlr = jnp.minimum(num_valid, num_expected_neg)
    sel_hlr = valid & (imp_rank < num_hlr)
    invalid = neg_mask & ~valid & invalid_ok
    from ..ops.sampler import _ranks

    inv_rank = _ranks(krand, invalid)
    sel_rand = invalid & (inv_rank < num_expected_neg - num_hlr)
    sel_neg = sel_hlr | sel_rand

    up = jnp.maximum(num_expected_neg, num_valid).astype(jnp.float32)
    w_hlr = (up - imp_rank.astype(jnp.float32)) / up
    # imp_weights.min() over the selected hlr block
    min_w = (up - jnp.maximum(num_hlr - 1, 0).astype(jnp.float32)) / up
    w = jnp.where(sel_hlr, w_hlr, jnp.where(sel_rand, min_w, 0.0))
    w = (cfg.hlr_bias + (1.0 - cfg.hlr_bias) * w) ** cfg.hlr_k
    ori = (ce_bg * sel_neg).sum()
    new = (ce_bg * w * sel_neg).sum()
    w = w * (ori / jnp.maximum(new, 1e-12))
    # no valid negatives at all -> plain random selection, weight 1
    w = jnp.where(num_valid > 0, w, jnp.where(sel_neg, 1.0, 0.0))
    return sel_neg, w


def _aligned_free_iou(boxes):
    """Pairwise IoU [N, N] of one box set."""
    from ..ops.bbox import bbox_overlaps

    return bbox_overlaps(boxes, boxes)


def make_pisa_rcnn_train_step(model, cfg, tx) -> Callable:
    """Faster R-CNN step with the PISA RoI head: ScoreHLR negative
    sampling/weighting (one extra no-grad RoI pass over ALL candidates),
    ISR-P positive reweighting (softmax-CE branch), and CARL
    (pisa_roi_head.py:34-159; smooth-L1 beta 1, isr k=2 bias 0,
    carl k=1 bias 0.2, hlr k=0.5 bias 0)."""
    import numpy as np

    from ..ops.assigner import max_iou_assign
    from ..ops.bbox import delta_encode
    from ..ops.losses import (binary_cross_entropy_with_logits,
                              softmax_cross_entropy)
    from ..ops.sampler import _ranks
    from .two_stage import (_extract_rois, _roi, _rpn_targets_single, _stage1,
                            make_proposal_fn)

    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    rc = cfg.rcnn
    c = cfg.num_classes

    def sample_single(key, cands, cand_valid, cls_ng, delta_ng,
                      gt_boxes, gt_labels, gt_valid):
        """-> (rois [S,4], labels [S], lw [S], bbox_t [S,4], is_pos [S],
        valid [S], gt_idx [S])."""
        num_gt = gt_boxes.shape[0]
        kp, kn, kpack = jax.random.split(key, 3)
        assigned = max_iou_assign(
            cands, gt_boxes, gt_valid, anchor_valid=cand_valid,
            pos_iou_thr=rc.pos_iou_thr, neg_iou_thr=rc.neg_iou_thr,
            min_pos_iou=rc.min_pos_iou, match_low_quality=False)
        pos_mask = (assigned > 0) & cand_valid
        neg_mask = (assigned == 0) & cand_valid
        num_expected_pos = int(rc.sampler_num * rc.pos_fraction)
        pos_rank = _ranks(kp, pos_mask)
        sel_pos = pos_mask & (pos_rank < num_expected_pos)
        num_pos = sel_pos.sum()

        sel_neg, neg_w = _score_hlr_neg(
            kn, cands, neg_mask, jnp.ones_like(neg_mask), cls_ng, delta_ng,
            rc.sampler_num - num_pos, cfg)

        # pack positives first into the S fixed slots
        s = rc.sampler_num
        pos_order = _ranks(kpack, sel_pos)
        big = jnp.int32(2 ** 30)
        neg_pri = jnp.where(sel_neg, s + jnp.int32(1) * jnp.arange(
            sel_neg.shape[0], dtype=jnp.int32), big)
        priority = jnp.where(sel_pos, pos_order, neg_pri)
        order = jnp.argsort(priority)[:s]
        slot_ok = priority[order] < big
        inds = jnp.where(slot_ok, order, 0).astype(jnp.int32)
        rois = cands[inds]
        is_pos = sel_pos[inds] & slot_ok
        gt_idx = jnp.clip(assigned[inds] - 1, 0, num_gt - 1)
        labels = jnp.where(is_pos, gt_labels[gt_idx], c).astype(jnp.int32)
        deltas = delta_encode(rois, gt_boxes[gt_idx], stds=rc.target_stds,
                              eps=1e-6)
        bbox_t = jnp.where(is_pos[:, None], deltas, 0.0)
        lw = jnp.where(is_pos, 1.0, jnp.where(slot_ok, neg_w[inds], 0.0))
        return rois, labels, lw, bbox_t, is_pos, slot_ok, gt_idx

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

        # candidates = [gt; proposals] (add_gt_as_proposals)
        cands = jnp.concatenate([batch.gt_boxes, props], axis=1)
        cand_valid = jnp.concatenate([batch.gt_valid, prop_valid], axis=1)

        # no-grad RoI pass over ALL candidates for ScoreHLR
        all_feats = _extract_rois(cfg, jax.lax.stop_gradient(feats), cands)
        cls_ng, delta_ng = model.apply(variables, all_feats, method=_roi)
        p = cands.shape[1]
        cls_ng = jax.lax.stop_gradient(cls_ng).reshape(b, p, c + 1)
        delta_ng = jax.lax.stop_gradient(delta_ng).reshape(b, p, -1)

        smp = jax.vmap(sample_single)(
            jax.random.split(k_roi, b), cands, cand_valid, cls_ng, delta_ng,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        rois, labels, lw, bbox_t, is_pos, valid, gt_idx = smp

        roi_feats = _extract_rois(cfg, feats, rois)
        cls, reg = model.apply(variables, roi_feats, method=_roi)

        flat_labels = labels.reshape(-1)
        flat_lw = lw.reshape(-1)
        sel = jnp.clip(flat_labels, 0, c - 1)
        reg_sel = jnp.take_along_axis(
            reg, jnp.repeat(sel[:, None, None], 4, axis=-1), axis=1)[:, 0]
        flat_rois = rois.reshape(-1, 4)
        flat_bt = bbox_t.reshape(-1, 4)

        # ISR-P on the positive label weights (softmax-CE branch)
        g = batch.gt_boxes.shape[1]
        gt_group = (jnp.arange(b, dtype=jnp.int32)[:, None] * g
                    + gt_idx).reshape(-1)
        flat_lw = jax.lax.stop_gradient(isr_p_label_weights(
            cls, reg_sel, flat_labels, flat_lw, flat_bt, flat_rois, gt_group,
            c, rc.target_stds, cfg.isr_k, cfg.isr_bias, use_sigmoid=False))

        avg_cls = jnp.maximum((flat_lw > 0).sum().astype(jnp.float32), 1.0)
        loss_cls = (softmax_cross_entropy(cls, flat_labels, reduction="none")
                    * flat_lw).sum() / avg_cls
        pos = is_pos.reshape(-1)
        avg_reg = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
        diff = jnp.abs(reg_sel - flat_bt)
        sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
        loss_bbox = (sl1 * pos[:, None]).sum() / avg_reg
        loss_carl = carl_loss_dense(
            cls, flat_labels, reg_sel, flat_bt, c, 1.0,
            cfg.carl_k, cfg.carl_bias, avg_reg, use_sigmoid=False)

        total = loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_bbox + loss_carl
        aux = {"loss": total, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox, "loss_cls": loss_cls,
               "loss_bbox": loss_bbox, "loss_carl": loss_carl,
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
