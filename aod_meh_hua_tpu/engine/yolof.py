"""YOLOF engine: uniform matching, ctr-clamped decode, fused train step
(mutable encoder/head BN) and eval step.

Behavioral parity targets (reference, /root/reference):
* mmdet/core/bbox/assigners/uniform_assigner.py:34-134 — per gt, the
  match_times=4 cheapest anchors by cxcywh-L1 cost against BOTH the
  decoded predictions and the raw anchors (8 candidates/gt); candidates
  whose ANCHOR IoU with their gt < pos_ignore_thr (0.15) are dropped;
  anchors whose DECODED box overlaps any gt > neg_ignore_thr (0.7)
  without being positive get label weight 0.
* mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:196-246 — YOLOF decode
  variant: center shift dx*pw clamped to +-ctr_clamp (32 px), dw/dh
  clamped from ABOVE only.
* mmdet/models/dense_heads/yolof_head.py:136-221 — focal cls on the
  normalized scores over all non-ignored anchors, GIoU on the (possibly
  duplicated) candidate list, both averaged by clamp(num_pos, 1).
* test_cfg: nms_pre 1000, score_thr 0.05, NMS iou 0.6, max 100.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.bbox import bbox_overlaps
from ..ops.losses import sigmoid_focal_loss
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def yolof_decode(anchors, deltas, ctr_clamp=32.0, wh_ratio_clip=16 / 1000):
    """delta2bbox with add_ctr_clamp (delta_xywh_bbox_coder.py:226-241);
    stds are (1, 1, 1, 1) in the YOLOF config so deltas are raw."""
    px = (anchors[..., 0] + anchors[..., 2]) * 0.5
    py = (anchors[..., 1] + anchors[..., 3]) * 0.5
    pw = anchors[..., 2] - anchors[..., 0]
    ph = anchors[..., 3] - anchors[..., 1]
    max_ratio = abs(float(np.log(wh_ratio_clip)))
    dxw = jnp.clip(deltas[..., 0] * pw, -ctr_clamp, ctr_clamp)
    dyh = jnp.clip(deltas[..., 1] * ph, -ctr_clamp, ctr_clamp)
    dw = jnp.clip(deltas[..., 2], None, max_ratio)
    dh = jnp.clip(deltas[..., 3], None, max_ratio)
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + dxw
    gy = py + dyh
    return jnp.stack([gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], -1)


def _cxcywh(b):
    return jnp.stack([(b[..., 0] + b[..., 2]) / 2, (b[..., 1] + b[..., 3]) / 2,
                      b[..., 2] - b[..., 0], b[..., 3] - b[..., 1]], -1)


def _uniform_match_single(decoded, anchors, gt_boxes, gt_labels, gt_valid,
                          cfg):
    """UniformAssigner.assign for one image, fixed shapes.

    Returns (labels [A] w/ bg=C, label_weights [A], cand_idx [2k*G],
    cand_gt [2k*G], cand_w [2k*G]) where the candidate list keeps the
    reference's duplicates (reg loss runs on it as-is)."""
    a = anchors.shape[0]
    g = gt_boxes.shape[0]
    k = cfg.match_times
    c = cfg.num_classes

    gt_cc = _cxcywh(gt_boxes)
    cost_pred = jnp.abs(_cxcywh(decoded)[:, None, :]
                        - gt_cc[None, :, :]).sum(-1)  # [A, G]
    cost_anc = jnp.abs(_cxcywh(anchors)[:, None, :]
                       - gt_cc[None, :, :]).sum(-1)
    # bottom-k rows per gt column
    idx_pred = jax.lax.top_k(-cost_pred.T, k)[1]  # [G, k]
    idx_anc = jax.lax.top_k(-cost_anc.T, k)[1]
    # reference order: rows of cat([index, index1], dim=1) flattened —
    # [k, 2G] row-major with gt tiled [0..G-1, 0..G-1] per row
    cand_idx = jnp.concatenate([idx_pred.T, idx_anc.T], axis=1).reshape(-1)
    cand_gt = jnp.tile(jnp.arange(g, dtype=jnp.int32), 2 * k)

    anchor_overlaps = bbox_overlaps(gt_boxes, anchors)  # [G, A]
    anchor_overlaps = jnp.where(gt_valid[:, None], anchor_overlaps, -1.0)
    pred_overlaps = bbox_overlaps(gt_boxes, decoded)
    pred_overlaps = jnp.where(gt_valid[:, None], pred_overlaps, -1.0)
    pred_max = pred_overlaps.max(axis=0)  # [A]

    pos_ious = anchor_overlaps[cand_gt, cand_idx]  # [2kG]
    cand_ok = (pos_ious >= cfg.pos_ignore_thr) & gt_valid[cand_gt]

    # per-anchor labels: background default; neg-ignore zeroes weight;
    # surviving candidates become positives (duplicate writes: any order
    # — duplicates always carry the same gt in the reference too only
    # when the same (anchor, gt) pair repeats; cross-gt collisions are
    # scatter-order-dependent there as well)
    labels = jnp.full((a,), c, jnp.int32)
    weights = jnp.where(pred_max > cfg.neg_ignore_thr, 0.0, 1.0)
    safe_labels = jnp.clip(gt_labels, 0, c - 1)
    scatter = jnp.where(cand_ok, cand_idx, a)  # a = dropped
    labels = labels.at[scatter].set(safe_labels[cand_gt], mode="drop")
    weights = weights.at[scatter].set(1.0, mode="drop")
    # ignored candidates mark their anchor weight 0 unless positive
    ign = jnp.where(cand_ok | ~gt_valid[cand_gt], a, cand_idx)
    is_pos = jnp.zeros((a,), bool).at[scatter].set(True, mode="drop")
    ign_w = jnp.zeros((a,), bool).at[ign].set(True, mode="drop")
    weights = jnp.where(ign_w & ~is_pos, 0.0, weights)

    num_pos = is_pos.sum().astype(jnp.float32)
    return labels, weights, cand_idx, cand_gt, \
        cand_ok.astype(jnp.float32), num_pos


def make_yolof_loss_fn(model, cfg):
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    match_fn = jax.vmap(functools.partial(_uniform_match_single, cfg=cfg),
                        in_axes=(0, None, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, anchors):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        (cls_scores, bbox_preds), mutated = model.apply(
            variables, images, train=True, mutable=["batch_stats"])
        decoded = yolof_decode(anchors[None], bbox_preds, cfg.ctr_clamp)

        labels, weights, cand_idx, cand_gt, cand_w, num_pos = match_fn(
            jax.lax.stop_gradient(decoded), anchors, batch.gt_boxes,
            batch.gt_labels, batch.gt_valid)
        num_total = jnp.maximum(num_pos.sum(), 1.0)

        c = cfg.num_classes
        loss_cls = sigmoid_focal_loss(
            cls_scores.reshape(-1, c), labels.reshape(-1),
            weight=weights.reshape(-1, 1), gamma=cfg.focal_gamma,
            alpha=cfg.focal_alpha, reduction="sum") / num_total

        # GIoU over the candidate list (duplicates kept)
        pred_boxes = jnp.take_along_axis(decoded, cand_idx[..., None], axis=1)
        tgt_boxes = jnp.take_along_axis(batch.gt_boxes, cand_gt[..., None],
                                        axis=1)
        from ..ops.losses import giou_loss

        loss_bbox = giou_loss(pred_boxes, tgt_boxes, weight=cand_w,
                              reduction="sum") / num_total
        total = loss_cls + loss_bbox
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "num_pos": num_pos.sum()}
        return total, (aux, mutated["batch_stats"])

    return loss_fn, anchors_host


def make_yolof_train_step(model, cfg, tx) -> Callable:
    loss_fn, anchors_host = make_yolof_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, anchors):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, anchors)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, new_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, anchors_arg.get(batch.images))

    return step


def make_yolof_eval_step(model, cfg) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bbox_preds = model.apply(variables, images)
        scores = jax.nn.sigmoid(cls_scores)  # [B, A, C]
        n = scores.shape[1]
        if n > t.nms_pre:
            key = scores.max(axis=-1)
            _, idx = jax.lax.top_k(key, t.nms_pre)
            scores = jnp.take_along_axis(scores, idx[..., None], axis=1)
            bbox_preds = jnp.take_along_axis(bbox_preds, idx[..., None], axis=1)
            anc = anchors[idx]
        else:
            anc = jnp.broadcast_to(anchors[None], bbox_preds.shape)
        boxes = yolof_decode(anc, bbox_preds, cfg.ctr_clamp)
        hs = batch.img_shapes[:, 0:1].astype(jnp.float32)
        ws = batch.img_shapes[:, 1:2].astype(jnp.float32)
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, ws), jnp.clip(boxes[..., 1], 0, hs),
            jnp.clip(boxes[..., 2], 0, ws), jnp.clip(boxes[..., 3], 0, hs),
        ], axis=-1)
        boxes = boxes / batch.scale_factors[:, None, :]
        return batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
