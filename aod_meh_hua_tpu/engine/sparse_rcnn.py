"""Sparse R-CNN engine: iterative stage orchestration, per-stage
Hungarian set criterion, fused train step (AdamW), NMS-free eval.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/sparse_roi_head.py:79-225 — per stage:
  RoIAlign on the current (detached) proposals, DIIHead, delta decode
  against the proposals (stds 0.5/0.5/1/1, clip_border=False), Hungarian
  assignment on the DETACHED scores/boxes, set losses; object features
  carry (not detached) across stages; stage_loss_weights all 1.
* mmdet/core/bbox/match_costs/match_cost.py:53-98 (FocalLossCost
  weight 2: pos_cost - neg_cost at the gt label, alpha 0.25 gamma 2,
  eps 1e-12) + BBoxL1Cost (weight 5, normalized xyxy) + IoUCost
  (weight 2, -GIoU absolute).
* mmdet/models/roi_heads/bbox_heads/dii_head.py:197-280 (loss) — focal
  cls over all proposals avg'd by num_pos; L1 on whwh-normalized boxes
  and GIoU on absolute boxes over positives only, avg'd by num_pos.
* sparse_roi_head.py:226-300 (simple_test) — final-stage sigmoid
  scores, flattened top max_per_img over (proposal, class), boxes by
  index // num_classes, rescale; no NMS.
* configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x_coco.py:90-92 — AdamW
  lr 2.5e-5, wd 1e-4, grad clip max_norm 1.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.bbox import delta_decode
from ..ops.hungarian import hungarian_match
from ..ops.losses import _aligned_iou_terms, sigmoid_focal_loss
from ..ops.nms import NMSResult
from ..ops.roi_align import multilevel_roi_align
from .batch import Batch, EvalBatch, prepare_images
from .detr import _pairwise_giou
from .train import TrainState


def _init_proposals(init_boxes, img_shapes):
    """Learnable normalized cxcywh -> absolute xyxy per image
    (embedding_rpn_head.py:52-75)."""
    hh = img_shapes[:, 0:1].astype(jnp.float32)
    ww = img_shapes[:, 1:2].astype(jnp.float32)
    cx = init_boxes[None, :, 0] * ww
    cy = init_boxes[None, :, 1] * hh
    w = init_boxes[None, :, 2] * ww
    h = init_boxes[None, :, 3] * hh
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


class StageTargets(NamedTuple):
    labels: jnp.ndarray        # [N] int32, num_classes = background
    bbox_targets: jnp.ndarray  # [N, 4] absolute xyxy
    pos: jnp.ndarray           # [N] bool


def _match_single(cls_logits, boxes, gt_boxes, gt_labels, gt_valid,
                  img_shape, cfg) -> StageTargets:
    """One image, one stage: FocalLossCost + BBoxL1Cost + IoUCost ->
    exact Hungarian -> per-proposal targets."""
    n = boxes.shape[0]
    eps = 1e-12
    h = img_shape[0].astype(jnp.float32)
    w = img_shape[1].astype(jnp.float32)
    whwh = jnp.stack([w, h, w, h])

    p = jax.nn.sigmoid(cls_logits)  # [N, C]
    a, g = cfg.focal_alpha, cfg.focal_gamma
    pos_cost = -jnp.log(p + eps) * a * (1 - p) ** g
    neg_cost = -jnp.log(1 - p + eps) * (1 - a) * p ** g
    safe_labels = jnp.clip(gt_labels, 0, cfg.num_classes - 1)
    cls_cost = (pos_cost - neg_cost)[:, safe_labels].T * cfg.cls_cost_weight

    reg_cost = jnp.abs(gt_boxes[:, None, :] / whwh
                       - boxes[None, :, :] / whwh).sum(-1) * cfg.l1_cost_weight
    iou_cost = -_pairwise_giou(gt_boxes, boxes) * cfg.giou_cost_weight

    cost = cls_cost + reg_cost + iou_cost  # [G, N]
    col = hungarian_match(cost, gt_valid)

    idx = jnp.where(gt_valid, col, n)  # n = out of range, dropped
    labels = jnp.full((n,), cfg.num_classes, jnp.int32)
    labels = labels.at[idx].set(safe_labels, mode="drop")
    bbox_t = jnp.zeros((n, 4), jnp.float32)
    bbox_t = bbox_t.at[idx].set(gt_boxes, mode="drop")
    pos = jnp.zeros((n,), bool).at[idx].set(True, mode="drop")
    return StageTargets(labels, bbox_t, pos)


def _stage_loss(cls_logits, boxes, targets: StageTargets, img_shapes, cfg):
    num_pos = jnp.maximum(targets.pos.sum().astype(jnp.float32), 1.0)
    c = cfg.num_classes
    loss_cls = sigmoid_focal_loss(
        cls_logits.reshape(-1, c), targets.labels.reshape(-1),
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
        reduction="sum") / num_pos * cfg.cls_loss_weight

    hh = img_shapes[:, 0:1].astype(jnp.float32)
    ww = img_shapes[:, 1:2].astype(jnp.float32)
    whwh = jnp.concatenate([ww, hh, ww, hh], -1)[:, None, :]
    posf = targets.pos.astype(jnp.float32)
    loss_bbox = (jnp.abs(boxes / whwh - targets.bbox_targets / whwh).sum(-1)
                 * posf).sum() / num_pos * cfg.l1_loss_weight

    ious, union, enclose_wh = _aligned_iou_terms(
        boxes, targets.bbox_targets, 1e-7)
    enclose = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], 1e-7)
    gious = ious - (enclose - union) / enclose
    loss_iou = ((1.0 - gious) * posf).sum() / num_pos * cfg.giou_loss_weight
    return loss_cls, loss_bbox, loss_iou, num_pos


def _run_stages(model, variables, cfg, images, img_shapes):
    """Shared forward: returns per-stage (cls [B, N, C], decoded boxes
    [B, N, 4]); boxes detached between stages."""
    feats = model.apply(variables, images, method=lambda m, x: m.features(x))
    feats = [f.astype(jnp.float32) for f in feats]
    init_boxes = variables["params"]["init_proposal_bboxes"]
    pfeat = variables["params"]["init_proposal_features"]
    b = images.shape[0]
    pfeat = jnp.broadcast_to(pfeat[None], (b,) + pfeat.shape)
    boxes = _init_proposals(init_boxes, img_shapes)

    outs = []
    for i in range(cfg.num_stages):
        # vmap over batch: per-image feats + rois
        roi = jax.vmap(lambda fs, bx: multilevel_roi_align(
            fs, bx, cfg.strides, cfg.roi_size, 2, cfg.finest_scale))(
                tuple(feats), jax.lax.stop_gradient(boxes))
        cls, delta, pfeat = model.apply(
            variables, i, roi, pfeat,
            method=lambda m, si, r, pf: m.stage(si, r, pf))
        # decode against the LIVE boxes: at stage 0 gradient reaches the
        # learnable init proposals through delta2bbox (the reference only
        # detaches BETWEEN stages, sparse_roi_head.py:137-139)
        boxes = delta_decode(
            boxes, delta, means=(0.0, 0.0, 0.0, 0.0),
            stds=cfg.target_stds, max_shape=None)
        outs.append((cls, boxes))
        boxes = jax.lax.stop_gradient(boxes)
    return outs


def make_sparse_rcnn_loss_fn(model, cfg):
    match_fn = jax.vmap(functools.partial(_match_single, cfg=cfg),
                        in_axes=(0, 0, 0, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        outs = _run_stages(model, variables, cfg, images, batch.img_shapes)
        total = 0.0
        aux = {}
        for i, (cls, boxes) in enumerate(outs):
            targets = match_fn(jax.lax.stop_gradient(cls),
                               jax.lax.stop_gradient(boxes),
                               batch.gt_boxes, batch.gt_labels,
                               batch.gt_valid, batch.img_shapes)
            lc, lb, li, np_ = _stage_loss(cls, boxes, targets,
                                          batch.img_shapes, cfg)
            total = total + (lc + lb + li) * cfg.stage_loss_weights[i]
            if i == cfg.num_stages - 1:
                aux.update({"loss_cls": lc, "loss_bbox": lb, "loss_iou": li,
                            "num_pos": np_})
        aux["loss"] = total
        return total, aux

    return loss_fn


def make_sparse_rcnn_train_step(model, cfg, tx) -> Callable:
    loss_fn = make_sparse_rcnn_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    return jax.jit(train_step, donate_argnums=(0,))


def make_sparse_rcnn_eval_step(model, cfg) -> Callable:
    t = cfg.test

    def eval_step(variables, batch: EvalBatch):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        outs = _run_stages(model, variables, cfg, images, batch.img_shapes)
        cls, boxes = outs[-1]
        scores = jax.nn.sigmoid(cls)  # [B, N, C]
        b, n, c = scores.shape
        k = min(t.max_per_img, n * c)
        top, idx = jax.lax.top_k(scores.reshape(b, -1), k)
        labels = (idx % c).astype(jnp.int32)
        pidx = idx // c
        sel = jnp.take_along_axis(boxes, pidx[..., None], axis=1)
        sel = sel / batch.scale_factors[:, None, :]
        valid = top > t.score_thr
        return NMSResult(sel, top, labels, valid, pidx)

    return jax.jit(eval_step)
