"""DETR engine: Hungarian set criterion, fused train step (AdamW), and
the NMS-free eval step.

Behavioral parity targets (reference, /root/reference):
* mmdet/core/bbox/assigners/hungarian_assigner.py:52-146 + match_cost.py
  — cost = -softmax prob of the gt class (weight 1) + L1 on normalized
  xyxy (weight 5) + (-GIoU) on absolute boxes (weight 2); exact min-cost
  matching (here ops/hungarian.py, fully on device).
* mmdet/models/dense_heads/detr_head.py:333-545 — per decoder layer:
  softmax CE over C+1 with background weight bg_cls_weight (0.1),
  avg_factor = num_pos + bg_cls_weight * num_neg; L1 on normalized
  cxcywh and GIoU on absolute boxes averaged by num_pos (clamped >= 1);
  auxiliary losses from every decoder layer (loss:267-331).
* configs/detr/detr_r50_8x2_150e_coco.py — AdamW lr 1e-4 wd 1e-4,
  backbone lr_mult 0.1, grad clip max_norm 0.1.
* detr_head.py:627-685 (_get_bboxes_single) — eval: softmax scores
  excluding background, per-query class max, top max_per_img queries,
  cxcywh * img_shape, clamp, rescale; no NMS.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.hungarian import hungarian_match
from ..ops.losses import _aligned_iou_terms
from ..ops.nms import NMSResult
from .batch import Batch, EvalBatch, prepare_images
from .train import TrainState, frozen_mask

NEG_LOGIT = -1e8


def cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def _pairwise_giou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] x [M, 4] xyxy -> [N, M] GIoU."""
    ious, union, enclose_wh = _aligned_iou_terms(
        a[:, None, :], b[None, :, :], 1e-7)
    enclose = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], 1e-7)
    return ious - (enclose - union) / enclose


class DETRTargets(NamedTuple):
    labels: jnp.ndarray        # [Q] int32 (num_classes = background)
    bbox_targets: jnp.ndarray  # [Q, 4] normalized cxcywh
    pos: jnp.ndarray           # [Q] bool


def _match_single(cls_logits, boxes, gt_boxes, gt_labels, gt_valid,
                  img_shape, cfg) -> DETRTargets:
    """One image, one decoder layer: Hungarian assignment -> targets."""
    q = boxes.shape[0]
    h = img_shape[0].astype(jnp.float32)
    w = img_shape[1].astype(jnp.float32)
    factor = jnp.stack([w, h, w, h])

    probs = jax.nn.softmax(cls_logits, axis=-1)  # [Q, C+1]
    safe_labels = jnp.clip(gt_labels, 0, cfg.num_classes - 1)
    cls_cost = -probs[:, safe_labels].T * cfg.cls_weight  # [G, Q]

    pred_xyxy_n = cxcywh_to_xyxy(boxes)  # normalized
    gt_xyxy_n = gt_boxes / factor
    reg_cost = jnp.abs(gt_xyxy_n[:, None, :] - pred_xyxy_n[None, :, :]).sum(-1) \
        * cfg.l1_weight

    pred_xyxy_abs = pred_xyxy_n * factor
    iou_cost = -_pairwise_giou(gt_boxes, pred_xyxy_abs) * cfg.giou_weight

    cost = cls_cost + reg_cost + iou_cost  # [G, Q]
    col = hungarian_match(cost, gt_valid)  # [G] query per gt

    idx = jnp.where(gt_valid, col, q)  # q = out of range, dropped
    labels = jnp.full((q,), cfg.num_classes, jnp.int32)
    labels = labels.at[idx].set(safe_labels, mode="drop")
    bbox_t = jnp.zeros((q, 4), jnp.float32)
    bbox_t = bbox_t.at[idx].set(xyxy_to_cxcywh(gt_xyxy_n), mode="drop")
    pos = jnp.zeros((q,), bool).at[idx].set(True, mode="drop")
    return DETRTargets(labels, bbox_t, pos)


def _layer_loss(cls_logits, boxes, targets: DETRTargets, img_shapes, cfg):
    """Loss for one decoder layer over the batch (loss_single)."""
    c = cfg.num_classes
    num_pos = targets.pos.sum().astype(jnp.float32)
    num_neg = (~targets.pos).sum().astype(jnp.float32)
    cls_avg = jnp.maximum(num_pos + num_neg * cfg.bg_cls_weight, 1.0)
    npos = jnp.maximum(num_pos, 1.0)

    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets.labels[..., None], axis=-1)[..., 0]
    wt = jnp.where(targets.labels == c, cfg.bg_cls_weight, 1.0)
    loss_cls = (nll * wt).sum() / cls_avg * cfg.cls_weight

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


def make_detr_loss_fn(model, cfg):
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

        # matching is independent per decoder layer (detr_head.loss)
        lc, lb, li, np_ = jax.vmap(per_layer)(all_cls, all_box)
        total = lc.sum() + lb.sum() + li.sum()
        aux = {"loss": total, "loss_cls": lc[-1], "loss_bbox": lb[-1],
               "loss_iou": li[-1], "num_pos": np_[-1]}
        return total, aux

    return loss_fn


def make_detr_optimizer(tcfg, params, frozen_stages: int = 1):
    """AdamW + global-norm clip + backbone lr_mult, frozen stages
    respected via the shared frozen_mask. Keeps the inject_hyperparams
    layout so engine.train.set_learning_rate works unchanged."""

    def _tx(learning_rate):
        chain = []
        if tcfg.grad_clip:
            chain.append(optax.clip_by_global_norm(tcfg.grad_clip))
        chain.append(optax.scale_by_adam())
        chain.append(optax.add_decayed_weights(tcfg.weight_decay))
        chain.append(optax.scale(-1.0))
        chain.append(optax.scale_by_learning_rate(learning_rate, flip_sign=False))
        return optax.chain(*chain)

    inner = optax.inject_hyperparams(_tx)(learning_rate=tcfg.lr)
    stages = [inner]
    if tcfg.backbone_lr_mult != 1.0:
        def is_backbone(path, _):
            keys = [getattr(p, "key", str(p)) for p in path]
            return bool(keys) and keys[0] == "backbone"

        bmask = jax.tree_util.tree_map_with_path(is_backbone, params)
        stages.append(optax.masked(optax.scale(tcfg.backbone_lr_mult), bmask))
    stages.append(optax.masked(optax.set_to_zero(),
                               frozen_mask(params, frozen_stages)))
    return optax.chain(*stages)


def make_detr_train_step(model, cfg, tx) -> Callable:
    loss_fn = make_detr_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    return jax.jit(train_step, donate_argnums=(0,))


def make_detr_eval_step(model, cfg) -> Callable:
    t = cfg.test

    def eval_step(variables, batch: EvalBatch):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        all_cls, all_box = model.apply(variables, images, batch.img_shapes)
        cls_logits, boxes = all_cls[-1], all_box[-1]  # [B, Q, .]
        probs = jax.nn.softmax(cls_logits, axis=-1)[..., :-1]
        scores = probs.max(-1)
        labels = probs.argmax(-1).astype(jnp.int32)
        k = min(t.max_per_img, scores.shape[1])
        top_scores, qidx = jax.lax.top_k(scores, k)
        labels = jnp.take_along_axis(labels, qidx, axis=1)
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
