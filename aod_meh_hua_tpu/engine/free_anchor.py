"""FreeAnchor engine: the learning-to-match bag likelihood loss and the
standard retina eval, each one jit region.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/free_anchor_retina_head.py:53-270 —
  per image:
  - anchor->object probability P{a_j in A+}: decode all predictions,
    IoU vs each gt, saturated-linear rescale between bbox_thr and the
    per-gt max IoU, then a per-class max over gts of that class;
  - positive bags: each gt's pre_anchor_topk highest-IoU anchors;
    bag likelihood = mean-max over (cls prob * exp(-smoothL1 loss));
    positive loss = -alpha * log(bag prob) summed / num_gt;
  - negative loss = (1-alpha) * FL(cls_prob * (1 - P{a in A+}))
    summed / (num_gt * topk).
* configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py:
  SmoothL1(beta .11, weight .75), gamma 2, alpha .5, topk 50,
  bbox_thr .6, grad clip 35.

TPU redesign: the reference's per-image python loop with sparse COO
tensors becomes a vmap over dense [G, A] IoU matrices; the sparse
per-class max "image_box_prob" is ONE scatter-max into [A, C]
(no [G, A, C] intermediate ever materializes); padded gt rows carry
zero probability and drop out of both bag terms exactly.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.bbox import bbox_overlaps, delta_decode, delta_encode
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState

EPS = 1e-12


def _free_anchor_loss_single(cls_prob, deltas, anchors, gt_boxes, gt_labels,
                             gt_valid, cfg):
    """One image. cls_prob [A, C] sigmoid probs, deltas [A, 4].
    Returns (positive_loss_sum, negative_loss_sum, num_gt)."""
    num_cls = cfg.num_classes
    k = cfg.pre_anchor_topk
    labels = jnp.clip(gt_labels, 0, num_cls - 1)

    # ---- P{a_j in A+} (no gradient, free_anchor_retina_head.py:105-165)
    pred_boxes = jax.lax.stop_gradient(
        delta_decode(anchors, deltas, stds=cfg.target_stds))
    iou = bbox_overlaps(gt_boxes, pred_boxes)                     # [G, A]
    iou = jnp.where(gt_valid[:, None], iou, 0.0)
    t1 = cfg.bbox_thr
    t2 = jnp.maximum(iou.max(axis=1, keepdims=True), t1 + 1e-12)
    object_box_prob = jnp.clip((iou - t1) / (t2 - t1), 0.0, 1.0)  # [G, A]
    object_box_prob = jnp.where(gt_valid[:, None], object_box_prob, 0.0)
    # per-class max over gts of that class: one scatter-max, not [G, A, C]
    image_box_prob = jnp.zeros((anchors.shape[0], num_cls), jnp.float32)
    image_box_prob = image_box_prob.at[:, labels].max(object_box_prob.T)
    image_box_prob = jax.lax.stop_gradient(image_box_prob)

    # ---- positive bags (top-k by gt-anchor IoU)
    quality = bbox_overlaps(gt_boxes, anchors)                    # [G, A]
    _, matched = jax.lax.top_k(quality, k)                        # [G, K]
    matched_cls_prob = cls_prob[matched, labels[:, None]]         # [G, K]
    matched_anchors = anchors[matched]                            # [G, K, 4]
    targets = delta_encode(matched_anchors,
                           jnp.broadcast_to(gt_boxes[:, None, :],
                                            matched_anchors.shape),
                           stds=cfg.target_stds, eps=1e-6)
    diff = jnp.abs(deltas[matched] - targets)
    beta = cfg.smooth_l1_beta
    sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    loss_bbox = cfg.bbox_loss_weight * sl1.sum(-1)                # [G, K]
    matched_box_prob = jnp.exp(-loss_bbox)

    # mean-max bag likelihood (positive_bag_loss)
    matched_prob = matched_cls_prob * matched_box_prob
    w = 1.0 / jnp.clip(1.0 - matched_prob, 1e-12, None)
    w = w / w.sum(axis=1, keepdims=True)
    bag_prob = jnp.clip((w * matched_prob).sum(axis=1), EPS, 1.0 - EPS)
    pos_loss = cfg.focal_alpha * (-jnp.log(bag_prob))             # [G]
    pos_loss = jnp.where(gt_valid, pos_loss, 0.0).sum()

    # negative bag loss over all anchors x classes
    prob = jnp.clip(cls_prob * (1.0 - image_box_prob), EPS, 1.0 - EPS)
    neg = (1.0 - cfg.focal_alpha) * prob ** cfg.focal_gamma * (
        -jnp.log1p(-prob))
    return pos_loss, neg.sum(), gt_valid.sum().astype(jnp.float32)


def make_free_anchor_loss_fn(model, cfg):
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)

    def loss_fn(params, batch_stats, batch: Batch, anchors):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, deltas = model.apply(variables, images)
        cls_prob = jax.nn.sigmoid(cls_scores)
        pos, neg, ng = jax.vmap(
            functools.partial(_free_anchor_loss_single, cfg=cfg),
            in_axes=(0, 0, None, 0, 0, 0))(
            cls_prob, deltas, anchors,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        num_pos = jnp.maximum(ng.sum(), 1.0)
        positive_loss = pos.sum() / num_pos
        negative_loss = neg.sum() / (num_pos * cfg.pre_anchor_topk)
        total = positive_loss + negative_loss
        aux = {"loss": total, "positive_bag_loss": positive_loss,
               "negative_bag_loss": negative_loss, "num_gt": ng.sum()}
        return total, aux

    return loss_fn, anchors_host


def make_free_anchor_train_step(model, cfg, tx) -> Callable:
    loss_fn, anchors_host = make_free_anchor_loss_fn(model, cfg)

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


def make_free_anchor_eval_step(model, cfg) -> Callable:
    """Standard retina eval: per-level sigmoid top-k, delta decode with
    the (.1, .1, .2, .2) stds, multiclass NMS (FreeAnchorRetinaHead
    inherits RetinaHead.get_bboxes)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    bounds = cfg.level_bounds()
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, deltas = model.apply(variables, images)
        probs = jax.nn.sigmoid(cls_scores)
        scs, bxs = [], []
        for (s0, s1) in bounds:
            sc = probs[:, s0:s1]
            d = deltas[:, s0:s1]
            anc = anchors[s0:s1]
            n = s1 - s0
            if n > t.nms_pre:
                mx = sc.max(axis=-1)
                _, idx = jax.lax.top_k(mx, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                d = jnp.take_along_axis(d, idx[..., None], axis=1)
                anc = anc[idx]
            else:
                anc = jnp.broadcast_to(anc[None], (sc.shape[0],) + anc.shape)
            boxes = delta_decode(anc, d, stds=cfg.target_stds,
                                 max_shape=batch.img_shapes[:, None, :])
            scs.append(sc)
            bxs.append(boxes)
        scores = jnp.concatenate(scs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1) / batch.scale_factors[:, None, :]
        return batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
