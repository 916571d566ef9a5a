"""FCOS engine: fused train step and eval step (one jit region each).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/fcos_head.py loss(): focal cls loss with
  avg_factor = max(num_pos, 1); IoU loss on distance-decoded boxes,
  weighted by centerness targets with avg_factor = sum(centerness
  targets); BCE centerness with avg_factor = num_pos.
* fcos_head.py _get_bboxes_single: sigmoid scores and centerness,
  per-level top-k by max(score * centerness), distance2bbox decode with
  img-shape clip, multiclass NMS on score * centerness
  (score_factors path of bbox_nms.py).

TPU redesign: targets are a dense vmapped assignment over a static point
table (ops/points.py); no per-image python, no ragged pos-index arrays —
positives are a mask and every reduction is a masked sum.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.losses import (
    binary_cross_entropy_with_logits,
    iou_loss,
    sigmoid_focal_loss_elementwise,
)
from ..ops.nms import batched_multiclass_nms
from ..ops.points import (
    centerness_target,
    distance2bbox,
    expand_regress_ranges,
    fcos_points,
    fcos_targets_single,
)
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def make_fcos_loss_fn(model, cfg):
    points_host = fcos_points(cfg.featmap_sizes(), cfg.strides)
    ranges_host = expand_regress_ranges(cfg.featmap_sizes(), cfg.regress_ranges)
    targets_fn = jax.vmap(
        functools.partial(fcos_targets_single, num_classes=cfg.num_classes),
        in_axes=(None, None, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, points, ranges):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, distances, centerness = model.apply(variables, images)
        labels, bbox_t = targets_fn(points, ranges, batch.gt_boxes,
                                    batch.gt_labels, batch.gt_valid)
        pos = labels < cfg.num_classes  # [B, P]
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

        elem = sigmoid_focal_loss_elementwise(
            cls_scores, labels, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)
        loss_cls = elem.sum() / num_pos

        ctr_t = centerness_target(bbox_t)  # [B, P]
        ctr_w = jnp.where(pos, ctr_t, 0.0)
        denorm = jnp.maximum(ctr_w.sum(), 1e-6)
        decoded_pred = distance2bbox(points[None], distances)
        decoded_t = distance2bbox(points[None], bbox_t)
        loss_bbox = iou_loss(decoded_pred, decoded_t, weight=ctr_w,
                             reduction="sum") / denorm

        loss_ctr = (binary_cross_entropy_with_logits(
            centerness, ctr_t, reduction="none")
            * jnp.where(pos, 1.0, 0.0)).sum() / num_pos

        total = loss_cls + loss_bbox + loss_ctr
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "loss_centerness": loss_ctr, "num_pos": num_pos}
        return total, aux

    return loss_fn, points_host, ranges_host


def make_fcos_train_step(model, cfg, tx) -> Callable:
    loss_fn, points_host, ranges_host = make_fcos_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, points, ranges):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  points, ranges)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    points_arg = ConstArg(points_host)
    ranges_arg = ConstArg(ranges_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, points_arg.get(batch.images),
                   ranges_arg.get(batch.images))

    return step


def make_fcos_eval_step(model, cfg) -> Callable:
    """step(variables, batch: EvalBatch) -> NMSResult (same contract as
    engine.eval.make_eval_step)."""
    points_host = fcos_points(cfg.featmap_sizes(), cfg.strides)
    bounds = cfg.level_bounds()
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, points):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, distances, centerness = model.apply(variables, images)
        probs = jax.nn.sigmoid(cls_scores)              # [B, P, C]
        ctr = jax.nn.sigmoid(centerness)                # [B, P]
        scs, bxs = [], []
        for (s0, s1) in bounds:
            sc = probs[:, s0:s1] * ctr[:, s0:s1, None]  # score_factors
            dist = distances[:, s0:s1]
            pts = points[s0:s1]
            n = s1 - s0
            if n > t.nms_pre:
                mx = sc.max(axis=-1)
                _, idx = jax.lax.top_k(mx, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                dist = jnp.take_along_axis(dist, idx[..., None], axis=1)
                pts = pts[idx]
            else:
                pts = jnp.broadcast_to(pts[None], (sc.shape[0],) + pts.shape)
            boxes = distance2bbox(pts, dist, max_shape=batch.img_shapes[:, None, :])
            scs.append(sc)
            bxs.append(boxes)
        scores = jnp.concatenate(scs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1) / batch.scale_factors[:, None, :]
        return batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img, t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    points_arg = ConstArg(points_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, points_arg.get(batch.images))

    return step
