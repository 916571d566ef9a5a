"""YOLOv3 engine: fused train step (mutable BN) and eval step.

Behavioral parity targets (reference, /root/reference):
* mmdet/core/bbox/assigners/grid_assigner.py — responsibility-gated
  assignment: negatives where max IoU <= neg_thr; positives only among
  anchors of the grid cell containing a gt center (responsible_flags,
  mmdet/core/anchor/anchor_generator.py YOLOAnchorGenerator
  .responsible_flags), IoU > pos_thr or the per-gt max (min_pos_iou 0,
  gt_max_assign_all, later gt wins).
* mmdet/core/bbox/coder/yolo_bbox_coder.py — xy targets as in-cell
  offsets in (0, 1), wh as log ratios to the anchor box.
* mmdet/models/dense_heads/yolo_head.py loss_single — sigmoid-CE class
  loss on positives, sigmoid-CE objectness on positives + negatives,
  sigmoid-CE xy (weight 2) and MSE wh (weight 2) on positives, all
  sum-reduced (the reference applies no averaging).
* get_bboxes: conf_thr 0.005 gate, scores = cls_prob * objectness,
  NMS iou 0.45.

Darknet's BatchNorm TRAINS (unlike the frozen-BN ResNet families): the
train step threads mutable batch_stats through the apply.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.bbox import bbox_overlaps
from ..ops.losses import binary_cross_entropy_with_logits
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def _level_meta(cfg):
    """Static per-level (start, end, stride, feat_w, A) tuples."""
    gen = cfg.build_anchor_generator()
    meta, off = [], 0
    for (h, w), a, (sw, _) in zip(cfg.featmap_sizes(), gen.num_base_anchors,
                                  gen.strides):
        n = h * w * a
        meta.append((off, off + n, sw, w, a))
        off += n
    return meta


def _responsible_flags(gt_boxes, gt_valid, meta, num_anchors_total):
    """[A_tot] bool: anchors of cells containing a (valid) gt center."""
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    flags = jnp.zeros((num_anchors_total,), bool)
    for (s0, s1, stride, w, a) in meta:
        h = (s1 - s0) // (w * a)
        cx = jnp.clip((gcx // stride).astype(jnp.int32), 0, w - 1)
        cy = jnp.clip((gcy // stride).astype(jnp.int32), 0, h - 1)
        cell = cy * w + cx  # [G]
        idx = s0 + cell[:, None] * a + jnp.arange(a)[None, :]  # [G, A]
        idx = jnp.where(gt_valid[:, None], idx, num_anchors_total)
        flags = flags.at[idx.reshape(-1)].set(True, mode="drop")
    return flags


def _grid_assign(anchors, gt_boxes, gt_valid, flags, cfg):
    """GridAssigner.assign as dense masked ops. Returns [A] mmdet codes."""
    num_gt = gt_boxes.shape[0]
    overlaps = bbox_overlaps(gt_boxes, anchors)  # [G, A]
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)

    assigned = jnp.full(anchors.shape[:1], -1, jnp.int32)
    max_all = overlaps.max(axis=0)
    assigned = jnp.where((max_all >= 0) & (max_all <= cfg.neg_iou_thr), 0, assigned)

    resp = jnp.where(flags[None, :], overlaps, -1.0)
    max_r = resp.max(axis=0)
    arg_r = resp.argmax(axis=0)
    assigned = jnp.where((max_r > cfg.pos_iou_thr) & flags,
                         arg_r.astype(jnp.int32) + 1, assigned)

    # per-gt best responsible anchor(s); later gt wins on shared anchors
    gt_max = resp.max(axis=1, keepdims=True)  # [G, 1]
    cand = (resp == gt_max) & (gt_max > cfg.min_pos_iou) & flags[None, :] \
        & gt_valid[:, None]
    gt_ids = jnp.arange(1, num_gt + 1, dtype=jnp.int32)[:, None]
    best = jnp.max(jnp.where(cand, gt_ids, 0), axis=0)
    assigned = jnp.where(best > 0, best, assigned)
    return jnp.where(jnp.any(gt_valid), assigned, 0)


def _targets_single(anchors, strides, gt_boxes, gt_labels, gt_valid, cfg, meta):
    flags = _responsible_flags(gt_boxes, gt_valid, meta, anchors.shape[0])
    assigned = _grid_assign(anchors, gt_boxes, gt_valid, flags, cfg)
    pos = assigned > 0
    neg = assigned == 0
    gt_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
    g = gt_boxes[gt_idx]
    labels = jnp.where(pos, gt_labels[gt_idx], 0).astype(jnp.int32)

    # YOLO coder encode (yolo_bbox_coder.py:26-59)
    eps = 1e-6
    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    gcx = (g[:, 0] + g[:, 2]) * 0.5
    gcy = (g[:, 1] + g[:, 3]) * 0.5
    gw = g[:, 2] - g[:, 0]
    gh = g[:, 3] - g[:, 1]
    tx = jnp.clip((gcx - acx) / strides + 0.5, eps, 1 - eps)
    ty = jnp.clip((gcy - acy) / strides + 0.5, eps, 1 - eps)
    tw = jnp.log(jnp.maximum(gw / aw, eps))
    th = jnp.log(jnp.maximum(gh / ah, eps))
    xywh = jnp.stack([tx, ty, tw, th], axis=-1)
    return labels, jnp.where(pos[:, None], xywh, 0.0), pos, neg


def make_yolo_loss_fn(model, cfg):
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    strides_host = np.concatenate([
        np.full(((s1 - s0),), st, np.float32)
        for (s0, s1, st, _, _) in _level_meta(cfg)])
    meta = tuple(_level_meta(cfg))
    targets_fn = jax.vmap(
        functools.partial(_targets_single, cfg=cfg, meta=meta),
        in_axes=(None, None, 0, 0, 0))
    c = cfg.num_classes

    def loss_fn(params, batch_stats, batch: Batch, anchors, strides):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        preds, mutated = model.apply(variables, images, train=True,
                                     mutable=["batch_stats"])
        labels, xywh_t, pos, neg = targets_fn(
            anchors, strides, batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

        posf = jnp.where(pos, 1.0, 0.0)
        bce = binary_cross_entropy_with_logits
        loss_xy = (bce(preds[..., :2], xywh_t[..., :2], reduction="none")
                   * posf[..., None]).sum() * cfg.xy_loss_weight
        loss_wh = (((preds[..., 2:4] - xywh_t[..., 2:4]) ** 2)
                   * posf[..., None]).sum() * cfg.wh_loss_weight
        loss_conf = (bce(preds[..., 4], posf, reduction="none")
                     * jnp.where(pos | neg, 1.0, 0.0)).sum()
        onehot = jax.nn.one_hot(labels, c)
        loss_cls = (bce(preds[..., 5:], onehot, reduction="none")
                    * posf[..., None]).sum()
        # the reference sum-reduces; normalize by batch for lr stability
        b = preds.shape[0]
        total = (loss_cls + loss_conf + loss_xy + loss_wh) / b
        aux = {"loss": total, "loss_cls": loss_cls / b, "loss_conf": loss_conf / b,
               "loss_xy": loss_xy / b, "loss_wh": loss_wh / b, "num_pos": num_pos}
        return total, (aux, mutated["batch_stats"])

    return loss_fn, anchors_host, strides_host


def make_yolo_train_step(model, cfg, tx) -> Callable:
    loss_fn, anchors_host, strides_host = make_yolo_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, anchors, strides):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, anchors, strides)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, new_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)
    strides_arg = ConstArg(strides_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, anchors_arg.get(batch.images),
                   strides_arg.get(batch.images))

    return step


def make_yolo_eval_step(model, cfg) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    strides_host = np.concatenate([
        np.full(((s1 - s0),), st, np.float32)
        for (s0, s1, st, _, _) in _level_meta(cfg)])
    bounds = cfg.level_bounds()
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, anchors, strides):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        preds = model.apply(variables, images)
        conf = jax.nn.sigmoid(preds[..., 4])
        cls_prob = jax.nn.sigmoid(preds[..., 5:])
        # YOLO decode: sigmoid xy in-cell offset, exp wh on the anchor box
        xy = jax.nn.sigmoid(preds[..., :2])
        acx = (anchors[:, 0] + anchors[:, 2])[None] * 0.5
        acy = (anchors[:, 1] + anchors[:, 3])[None] * 0.5
        aw = (anchors[:, 2] - anchors[:, 0])[None]
        ah = (anchors[:, 3] - anchors[:, 1])[None]
        cx = (xy[..., 0] - 0.5) * strides[None] + acx
        cy = (xy[..., 1] - 0.5) * strides[None] + acy
        w = jnp.exp(jnp.clip(preds[..., 2], -10, 10)) * aw
        h = jnp.exp(jnp.clip(preds[..., 3], -10, 10)) * ah
        hs = batch.img_shapes[:, 0:1].astype(jnp.float32)
        ws = batch.img_shapes[:, 1:2].astype(jnp.float32)
        boxes = jnp.stack([
            jnp.clip(cx - w / 2, 0, ws), jnp.clip(cy - h / 2, 0, hs),
            jnp.clip(cx + w / 2, 0, ws), jnp.clip(cy + h / 2, 0, hs)], axis=-1)

        gate = (conf > cfg.conf_thr).astype(cls_prob.dtype)
        scores = cls_prob * (conf * gate)[..., None]
        scs, bxs = [], []
        for (s0, s1) in bounds:
            sc = scores[:, s0:s1]
            bx = boxes[:, s0:s1]
            n = s1 - s0
            if n > t.nms_pre:
                mx = (conf * gate)[:, s0:s1]
                _, idx = jax.lax.top_k(mx, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                bx = jnp.take_along_axis(bx, idx[..., None], axis=1)
            scs.append(sc)
            bxs.append(bx)
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
