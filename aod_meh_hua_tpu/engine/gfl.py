"""GFL engine: fused train step and eval step (one jit region each).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/gfl_head.py loss()/loss_single(): ATSS
  assignment (topk 9) with RAW gt boxes as regression targets; QFL on
  the joint classification-quality scores with avg_factor = num_pos and
  the quality target = IoU(decoded pred, gt) (detached); GIoU loss
  (weight 2) on stride-normalized decoded boxes weighted by the
  detached max sigmoid score, normalized by the weight mass; DFL
  (weight 0.25) on the two bracketing bins of the stride-normalized
  target distances (bbox2distance clamp to reg_max - 0.1).
* _get_bboxes_single: sigmoid joint scores, per-level top-k, integral
  decode * stride from anchor centers, multiclass NMS (iou 0.6).

Flat TPU layout: per-anchor stride table instead of per-level loops.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.gfl import integral
from ..ops.assigner import atss_assign
from ..ops.bbox import bbox_overlaps
from ..ops.losses import distribution_focal_loss, giou_loss, quality_focal_loss
from ..ops.nms import batched_multiclass_nms
from ..ops.points import distance2bbox
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def _aligned_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of aligned box pairs [..., 4]."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0, None) * jnp.clip(a[..., 3] - a[..., 1], 0, None)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0, None) * jnp.clip(b[..., 3] - b[..., 1], 0, None)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-6)


def _anchor_strides(cfg) -> np.ndarray:
    out = []
    for (h, w), s in zip(cfg.featmap_sizes(), cfg.strides):
        out.append(np.full((h * w,), s, np.float32))
    return np.concatenate(out)


def _targets_single(anchors, anchor_valid, gt_boxes, gt_labels, gt_valid, cfg, bounds):
    assigned = atss_assign(anchors, bounds, gt_boxes, gt_valid,
                           topk=cfg.atss_topk, anchor_valid=anchor_valid)
    pos = assigned > 0
    gt_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
    matched = jnp.where(pos[:, None], gt_boxes[gt_idx], 0.0)
    labels = jnp.where(pos, gt_labels[gt_idx], cfg.num_classes).astype(jnp.int32)
    return labels, matched, pos


def make_gfl_loss_fn(model, cfg):
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    strides_host = _anchor_strides(cfg)
    bounds = tuple(cfg.level_bounds())
    targets_fn = jax.vmap(
        functools.partial(_targets_single, cfg=cfg, bounds=bounds),
        in_axes=(None, 0, 0, 0, 0))
    rm = cfg.reg_max

    def loss_fn(params, batch_stats, batch: Batch, anchors, strides,
                return_outputs: bool = False):
        """With return_outputs=True (static), also returns
        (cls_scores, dist_logits, pos, w) so wrappers like the LD
        distillation step (engine/ld.py) reuse this criterion's forward
        pass and ATSS assignment instead of re-tracing both."""
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, dist_logits = model.apply(variables, images)
        labels, gt_raw, pos = targets_fn(
            anchors, batch.anchor_valid, batch.gt_boxes, batch.gt_labels,
            batch.gt_valid)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

        centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                             (anchors[:, 1] + anchors[:, 3]) * 0.5], axis=-1)
        centers_s = centers / strides[:, None]          # [A, 2] stride units
        dists = integral(dist_logits, rm)               # [B, A, 4]
        decoded_s = distance2bbox(centers_s[None], dists)  # stride units
        gt_s = gt_raw / strides[None, :, None]

        # quality target: IoU(decoded, gt) on positives (detached)
        quality = jnp.where(
            pos, jax.lax.stop_gradient(_aligned_iou(decoded_s, gt_s)), 0.0)
        loss_qfl = quality_focal_loss(
            cls_scores, labels, quality, beta=cfg.qfl_beta).sum() / num_pos

        # weights: detached max joint score of each positive
        w = jnp.where(pos, jax.lax.stop_gradient(
            jax.nn.sigmoid(cls_scores).max(axis=-1)), 0.0)
        denorm = jnp.maximum(w.sum(), 1.0)
        loss_bbox = giou_loss(decoded_s, gt_s, weight=w, reduction="sum",
                              loss_weight=cfg.giou_loss_weight) / denorm

        # DFL on the bracketing bins of the clamped target distances
        tgt_d = jnp.stack([
            centers_s[None, :, 0] - gt_s[..., 0],
            centers_s[None, :, 1] - gt_s[..., 1],
            gt_s[..., 2] - centers_s[None, :, 0],
            gt_s[..., 3] - centers_s[None, :, 1],
        ], axis=-1)
        tgt_d = jnp.clip(tgt_d, 0.0, rm - 0.1)
        dfl = distribution_focal_loss(
            dist_logits.reshape(dist_logits.shape[:-1] + (4, rm + 1)), tgt_d)
        loss_dfl = (dfl.mean(axis=-1) * w).sum() * cfg.dfl_loss_weight / denorm

        total = loss_qfl + loss_bbox + loss_dfl
        aux = {"loss": total, "loss_cls": loss_qfl, "loss_bbox": loss_bbox,
               "loss_dfl": loss_dfl, "num_pos": num_pos}
        if return_outputs:
            return total, aux, (cls_scores, dist_logits, pos, w)
        return total, aux

    return loss_fn, anchors_host, strides_host


def make_gfl_train_step(model, cfg, tx) -> Callable:
    loss_fn, anchors_host, strides_host = make_gfl_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, anchors, strides):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, strides)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)
    strides_arg = ConstArg(strides_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, anchors_arg.get(batch.images),
                   strides_arg.get(batch.images))

    return step


def make_gfl_eval_step(model, cfg) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    strides_host = _anchor_strides(cfg)
    bounds = cfg.level_bounds()
    t = cfg.test
    rm = cfg.reg_max

    def eval_step(variables, batch: EvalBatch, anchors, strides):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, dist_logits = model.apply(variables, images)
        probs = jax.nn.sigmoid(cls_scores)
        centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                             (anchors[:, 1] + anchors[:, 3]) * 0.5], axis=-1)
        scs, bxs = [], []
        for li, (s0, s1) in enumerate(bounds):
            sc = probs[:, s0:s1]
            d = dist_logits[:, s0:s1]
            ctr = centers[s0:s1]
            stride = strides[s0:s1]
            n = s1 - s0
            if n > t.nms_pre:
                mx = sc.max(axis=-1)
                _, idx = jax.lax.top_k(mx, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                d = jnp.take_along_axis(d, idx[..., None], axis=1)
                ctr = ctr[idx]
                stride = stride[idx]
            else:
                ctr = jnp.broadcast_to(ctr[None], (sc.shape[0],) + ctr.shape)
                stride = jnp.broadcast_to(stride[None], sc.shape[:1] + stride.shape)
            dists = integral(d, rm) * stride[..., None]
            boxes = distance2bbox(ctr, dists, max_shape=batch.img_shapes[:, None, :])
            scs.append(sc)
            bxs.append(boxes)
        scores = jnp.concatenate(scs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1) / batch.scale_factors[:, None, :]
        return batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img, t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)
    strides_arg = ConstArg(strides_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images),
                   strides_arg.get(batch.images))

    return step
