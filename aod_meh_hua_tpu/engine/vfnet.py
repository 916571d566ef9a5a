"""VFNet engine: fused train step and eval step (one jit region each).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/vfnet_head.py loss(): ATSS assignment
  (use_atss=True, topk 9, on the one-octave-8-anchor-per-cell grid) with
  targets converted to ltrb distances from the anchor centers
  (get_atss_targets + transform_bbox_targets :762); GIoU on the initial
  decode weighted by its own detached IoU (weight 1.5, avg = IoU sum)
  and on the refined decode likewise (weight 2.0); varifocal cls loss
  against IoU-of-refined targets at the positive (point, label) cells,
  avg_factor = num_pos (sync_num_pos -> the global batch here).
* vfnet_head.py get_bboxes: sigmoid scores, per-level top-k, refined
  distances decoded with distance2bbox + img-shape clip, NMS 0.6.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import atss_assign
from ..ops.losses import _aligned_iou_terms, giou_loss, varifocal_loss
from ..ops.nms import batched_multiclass_nms
from ..ops.points import distance2bbox
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def _targets_single(anchors, anchor_valid, gt_boxes, gt_labels, gt_valid,
                    cfg, bounds):
    assigned = atss_assign(anchors, bounds, gt_boxes, gt_valid,
                           topk=cfg.atss_topk, anchor_valid=anchor_valid)
    pos = assigned > 0
    gt_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
    matched = gt_boxes[gt_idx]                              # [A, 4]
    labels = jnp.where(pos, gt_labels[gt_idx],
                       cfg.num_classes).astype(jnp.int32)
    # ltrb distances from the anchor center to the assigned gt
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    ltrb = jnp.stack([cx - matched[:, 0], cy - matched[:, 1],
                      matched[:, 2] - cx, matched[:, 3] - cy], axis=-1)
    return labels, jnp.where(pos[:, None], ltrb, 0.0), pos


def make_vfnet_loss_fn(model, cfg):
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    points_host = np.stack(
        [(anchors_host[:, 0] + anchors_host[:, 2]) * 0.5,
         (anchors_host[:, 1] + anchors_host[:, 3]) * 0.5], axis=-1)
    bounds = tuple(cfg.level_bounds())
    targets_fn = jax.vmap(
        functools.partial(_targets_single, cfg=cfg, bounds=bounds),
        in_axes=(None, 0, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, anchors, points):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, ini, ref = model.apply(variables, images)
        labels, ltrb_t, pos = targets_fn(anchors, batch.anchor_valid,
                                         batch.gt_boxes, batch.gt_labels,
                                         batch.gt_valid)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        posf = pos.astype(jnp.float32)

        dec_ini = distance2bbox(points[None], ini)
        dec_ref = distance2bbox(points[None], ref)
        dec_t = distance2bbox(points[None], ltrb_t)
        iou_ini, _, _ = _aligned_iou_terms(jax.lax.stop_gradient(dec_ini),
                                           dec_t, 1e-6)
        iou_ini = jnp.clip(jax.lax.stop_gradient(iou_ini), 1e-6, None) * posf
        iou_ref, _, _ = _aligned_iou_terms(jax.lax.stop_gradient(dec_ref),
                                           dec_t, 1e-6)
        iou_ref = jnp.clip(jax.lax.stop_gradient(iou_ref), 1e-6, None) * posf

        loss_bbox = giou_loss(dec_ini, dec_t, weight=iou_ini,
                              reduction="sum",
                              loss_weight=cfg.bbox_loss_weight
                              ) / jnp.maximum(iou_ini.sum(), 1.0)
        loss_bbox_rf = giou_loss(dec_ref, dec_t, weight=iou_ref,
                                 reduction="sum",
                                 loss_weight=cfg.bbox_refine_loss_weight
                                 ) / jnp.maximum(iou_ref.sum(), 1.0)

        # IoU-aware cls targets: iou_ref at the (pos, label) cells
        onehot = jax.nn.one_hot(labels, cfg.num_classes,
                                dtype=cls_scores.dtype)  # bg row = 0
        cls_t = onehot * iou_ref[..., None]
        loss_cls = varifocal_loss(cls_scores, cls_t, alpha=cfg.vfl_alpha,
                                  gamma=cfg.vfl_gamma, avg_factor=num_pos)

        total = loss_cls + loss_bbox + loss_bbox_rf
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "loss_bbox_rf": loss_bbox_rf, "num_pos": num_pos}
        return total, aux

    return loss_fn, anchors_host, points_host


def make_vfnet_train_step(model, cfg, tx) -> Callable:
    loss_fn, anchors_host, points_host = make_vfnet_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, anchors, points):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, points)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)
    points_arg = ConstArg(points_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, anchors_arg.get(batch.images),
                   points_arg.get(batch.images))

    return step


def make_vfnet_eval_step(model, cfg) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    points_host = np.stack(
        [(anchors_host[:, 0] + anchors_host[:, 2]) * 0.5,
         (anchors_host[:, 1] + anchors_host[:, 3]) * 0.5], axis=-1)
    bounds = cfg.level_bounds()
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, points):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, _, ref = model.apply(variables, images)
        probs = jax.nn.sigmoid(cls_scores)  # IoU-aware: no extra factor
        scs, bxs = [], []
        for (s0, s1) in bounds:
            sc = probs[:, s0:s1]
            d = ref[:, s0:s1]
            pts = points[s0:s1]
            n = s1 - s0
            if n > t.nms_pre:
                mx = sc.max(axis=-1)
                _, idx = jax.lax.top_k(mx, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                d = jnp.take_along_axis(d, idx[..., None], axis=1)
                pts = pts[idx]
            else:
                pts = jnp.broadcast_to(pts[None], (sc.shape[0],) + pts.shape)
            boxes = distance2bbox(pts, d,
                                  max_shape=batch.img_shapes[:, None, :])
            scs.append(sc)
            bxs.append(boxes)
        scores = jnp.concatenate(scs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1) / batch.scale_factors[:, None, :]
        return batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    points_arg = ConstArg(points_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, points_arg.get(batch.images))

    return step
