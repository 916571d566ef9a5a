"""Deformable DETR engine: focal-cost Hungarian criterion, fused AdamW
train step, sigmoid top-k eval.

Behavioral parity targets (reference, /root/reference):
* configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py:76-83 —
  matcher cost = FocalLossCost(2.0) + BBoxL1Cost(5.0, box_format='xywh',
  i.e. normalized cxcywh) + IoUCost(giou, 2.0); AdamW lr 2e-4 wd 1e-4
  with lr_mult 0.1 on backbone / sampling_offsets / reference_points,
  grad clip max_norm 0.1 (:158-169).
* mmdet/core/bbox/match_costs/match_cost.py FocalLossCost —
  pos_cost - neg_cost at the gt class with eps 1e-12.
* mmdet/models/dense_heads/detr_head.py:333-418 loss_single with
  use_sigmoid focal cls (gamma 2, alpha 0.25, weight 2.0):
  cls_avg_factor = num_pos (bg_cls_weight is 0 on the focal path,
  detr_head.py:86-103), L1 on normalized cxcywh and GIoU on absolute
  boxes averaged by num_pos clamped >= 1; auxiliary losses from every
  decoder layer.
* detr_head.py _get_bboxes_single (use_sigmoid branch): flat sigmoid
  top-k over Q*C, label = idx % C, query = idx // C, no NMS.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.hungarian import hungarian_match
from ..ops.losses import _aligned_iou_terms
from ..ops.nms import NMSResult
from .batch import Batch, EvalBatch, prepare_images
from .detr import (cxcywh_to_xyxy, make_detr_optimizer, xyxy_to_cxcywh,
                   _pairwise_giou)
from .train import TrainState

_EPS = 1e-12


class DDETRTargets(NamedTuple):
    labels: jnp.ndarray        # [Q] int32 (num_classes = background)
    bbox_targets: jnp.ndarray  # [Q, 4] normalized cxcywh
    pos: jnp.ndarray           # [Q] bool


def _focal_cost(cls_logits: jnp.ndarray, gt_labels: jnp.ndarray,
                gamma: float, alpha: float) -> jnp.ndarray:
    """FocalLossCost: [Q, C] logits x [G] labels -> [G, Q]."""
    p = jax.nn.sigmoid(cls_logits)
    neg = -jnp.log(1.0 - p + _EPS) * (1.0 - alpha) * p ** gamma
    pos = -jnp.log(p + _EPS) * alpha * (1.0 - p) ** gamma
    return (pos - neg)[:, gt_labels].T


def _match_single(cls_logits, boxes, gt_boxes, gt_labels, gt_valid,
                  img_shape, cfg) -> DDETRTargets:
    """One image, one decoder layer: Hungarian assignment -> targets.
    boxes: [Q, 4] normalized cxcywh."""
    q = boxes.shape[0]
    h = img_shape[0].astype(jnp.float32)
    w = img_shape[1].astype(jnp.float32)
    factor = jnp.stack([w, h, w, h])

    safe_labels = jnp.clip(gt_labels, 0, cfg.num_classes - 1)
    cls_cost = _focal_cost(cls_logits, safe_labels,
                           cfg.focal_gamma, cfg.focal_alpha) * cfg.cls_weight

    gt_xyxy_n = gt_boxes / factor
    gt_cxcywh_n = xyxy_to_cxcywh(gt_xyxy_n)
    # BBoxL1Cost box_format='xywh': L1 on normalized cxcywh
    reg_cost = jnp.abs(gt_cxcywh_n[:, None, :] - boxes[None, :, :]).sum(-1) \
        * cfg.l1_weight
    pred_xyxy_abs = cxcywh_to_xyxy(boxes) * factor
    iou_cost = -_pairwise_giou(gt_boxes, pred_xyxy_abs) * cfg.giou_weight

    cost = cls_cost + reg_cost + iou_cost  # [G, Q]
    col = hungarian_match(cost, gt_valid)  # [G] query per gt

    idx = jnp.where(gt_valid, col, q)  # q = out of range, dropped
    labels = jnp.full((q,), cfg.num_classes, jnp.int32)
    labels = labels.at[idx].set(safe_labels, mode="drop")
    bbox_t = jnp.zeros((q, 4), jnp.float32)
    bbox_t = bbox_t.at[idx].set(gt_cxcywh_n, mode="drop")
    pos = jnp.zeros((q,), bool).at[idx].set(True, mode="drop")
    return DDETRTargets(labels, bbox_t, pos)


def _layer_loss(cls_logits, boxes, targets: DDETRTargets, img_shapes, cfg):
    """Loss for one decoder layer over the batch (loss_single, sigmoid
    focal path)."""
    c = cfg.num_classes
    num_pos = targets.pos.sum().astype(jnp.float32)
    npos = jnp.maximum(num_pos, 1.0)

    # sigmoid focal over C channels; background target = all-zero row
    onehot = jax.nn.one_hot(targets.labels, c)  # label==c -> zeros
    p = jax.nn.sigmoid(cls_logits)
    pt = jnp.where(onehot > 0, p, 1.0 - p)
    alpha_t = jnp.where(onehot > 0, cfg.focal_alpha, 1.0 - cfg.focal_alpha)
    bce = -jnp.log(jnp.clip(pt, _EPS, 1.0))
    focal = alpha_t * (1.0 - pt) ** cfg.focal_gamma * bce
    loss_cls = focal.sum() / npos * cfg.cls_weight

    posf = targets.pos.astype(jnp.float32)
    loss_bbox = (jnp.abs(boxes - targets.bbox_targets).sum(-1)
                 * posf).sum() / npos * cfg.l1_weight

    hh = img_shapes[:, 0:1].astype(jnp.float32)
    ww = img_shapes[:, 1:2].astype(jnp.float32)
    factor = jnp.concatenate([ww, hh, ww, hh], axis=-1)[:, None, :]
    pred_abs = cxcywh_to_xyxy(boxes) * factor
    tgt_abs = cxcywh_to_xyxy(targets.bbox_targets) * factor
    ious, union, enclose_wh = _aligned_iou_terms(pred_abs, tgt_abs, 1e-7)
    enclose = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], 1e-7)
    gious = ious - (enclose - union) / enclose
    loss_iou = ((1.0 - gious) * posf).sum() / npos * cfg.giou_weight
    return loss_cls, loss_bbox, loss_iou, num_pos


def make_deformable_detr_loss_fn(model, cfg):
    match_fn = jax.vmap(functools.partial(_match_single, cfg=cfg),
                        in_axes=(0, 0, 0, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, key):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        all_cls, all_box = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            batch.img_shapes, train=True, rngs={"dropout": key})

        def per_layer(cls_l, box_l):
            targets = match_fn(cls_l, box_l, batch.gt_boxes, batch.gt_labels,
                               batch.gt_valid, batch.img_shapes)
            return _layer_loss(cls_l, box_l, targets, batch.img_shapes, cfg)

        lc, lb, li, np_ = jax.vmap(per_layer)(all_cls, all_box)
        total = lc.sum() + lb.sum() + li.sum()
        aux = {"loss": total, "loss_cls": lc[-1], "loss_bbox": lb[-1],
               "loss_iou": li[-1], "num_pos": np_[-1]}
        return total, aux

    return loss_fn


def make_deformable_detr_optimizer(tcfg, params, frozen_stages: int = 1):
    """AdamW + clip + the reference's custom_keys lr_mults: backbone,
    sampling_offsets, reference_points all x0.1 (config :158-169).
    Builds on the DETR optimizer (backbone mult) and adds a masked
    scale for the deformable-specific parameter names."""
    tx = make_detr_optimizer(tcfg, params, frozen_stages)

    def is_deform_key(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        return any(k in ("sampling_offsets", "reference_points") for k in keys)

    dmask = jax.tree_util.tree_map_with_path(is_deform_key, params)
    # (frozen-stage zeroing already lives inside tx; scaling zeros is a
    # no-op, so order is immaterial)
    return optax.chain(tx, optax.masked(optax.scale(0.1), dmask))


def make_deformable_detr_train_step(model, cfg, tx) -> Callable:
    loss_fn = make_deformable_detr_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    return jax.jit(train_step, donate_argnums=(0,))


def make_deformable_detr_eval_step(model, cfg) -> Callable:
    t = cfg.test

    def eval_step(variables, batch: EvalBatch):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        all_cls, all_box = model.apply(variables, images, batch.img_shapes)
        cls_logits, boxes = all_cls[-1], all_box[-1]  # [B, Q, C], [B, Q, 4]
        b, q, c = cls_logits.shape
        scores = jax.nn.sigmoid(cls_logits).reshape(b, q * c)
        k = min(t.max_per_img, q * c)
        top_scores, idx = jax.lax.top_k(scores, k)
        labels = (idx % c).astype(jnp.int32)
        qidx = idx // c
        boxes = jnp.take_along_axis(boxes, qidx[..., None], axis=1)

        hh = batch.img_shapes[:, 0:1].astype(jnp.float32)
        ww = batch.img_shapes[:, 1:2].astype(jnp.float32)
        factor = jnp.concatenate([ww, hh, ww, hh], axis=-1)[:, None, :]
        xyxy = jnp.clip(cxcywh_to_xyxy(boxes) * factor, 0.0, factor)
        xyxy = xyxy / batch.scale_factors[:, None, :]
        valid = top_scores > t.score_thr
        return NMSResult(xyxy, top_scores, labels, valid, qidx)

    jfn = jax.jit(eval_step)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch)

    return step
