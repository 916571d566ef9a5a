"""ATSS engine: fused train step and eval step (one jit region each).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/atss_head.py loss()/loss_single(): focal cls
  loss over all anchors with avg_factor = max(num_pos, 1); GIoU loss on
  coder-decoded boxes for positives, weighted by anchor-centerness
  targets and normalized by their sum; BCE centerness with
  avg_factor = num_pos. Targets via the ATSS assigner (topk=9) and
  PseudoSampler; deltas use stds (0.1, 0.1, 0.2, 0.2).
* atss_head.py centerness_target: ltrb from the ANCHOR CENTER to the
  assigned gt's sides.
* _get_bboxes_single: sigmoid scores/centerness, per-level top-k by
  max(score) * centerness, delta decode, NMS on score * centerness.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import atss_assign
from ..ops.bbox import delta_decode, delta_encode
from ..ops.losses import (
    binary_cross_entropy_with_logits,
    giou_loss,
    sigmoid_focal_loss_elementwise,
)
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def _anchor_centerness(anchors: jnp.ndarray, gts: jnp.ndarray) -> jnp.ndarray:
    acx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    acy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    l_ = acx - gts[..., 0]
    t_ = acy - gts[..., 1]
    r_ = gts[..., 2] - acx
    b_ = gts[..., 3] - acy
    lr_min = jnp.minimum(l_, r_)
    lr_max = jnp.maximum(jnp.maximum(l_, r_), 1e-12)
    tb_min = jnp.minimum(t_, b_)
    tb_max = jnp.maximum(jnp.maximum(t_, b_), 1e-12)
    return jnp.sqrt(jnp.clip((lr_min / lr_max) * (tb_min / tb_max), 0.0, None))


def _targets_single(anchors, anchor_valid, gt_boxes, gt_labels, gt_valid, cfg, bounds):
    assigned = atss_assign(anchors, bounds, gt_boxes, gt_valid,
                           topk=cfg.atss_topk, anchor_valid=anchor_valid)
    pos = assigned > 0
    gt_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
    matched = gt_boxes[gt_idx]
    labels = jnp.where(pos, gt_labels[gt_idx], cfg.num_classes).astype(jnp.int32)
    deltas = delta_encode(anchors, matched, stds=cfg.target_stds, eps=1e-6)
    ctr_t = jnp.where(pos, _anchor_centerness(anchors, matched), 0.0)
    return labels, jnp.where(pos[:, None], deltas, 0.0), ctr_t, pos


def make_atss_loss_fn(model, cfg):
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    bounds = tuple(cfg.level_bounds())
    targets_fn = jax.vmap(
        functools.partial(_targets_single, cfg=cfg, bounds=bounds),
        in_axes=(None, 0, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, anchors):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, deltas, centerness = model.apply(variables, images)
        labels, bbox_t, ctr_t, pos = targets_fn(
            anchors, batch.anchor_valid, batch.gt_boxes, batch.gt_labels,
            batch.gt_valid)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

        elem = sigmoid_focal_loss_elementwise(
            cls_scores, labels, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)
        loss_cls = elem.sum() / num_pos

        decoded_pred = delta_decode(anchors[None], deltas, stds=cfg.target_stds)
        decoded_t = delta_decode(anchors[None], bbox_t, stds=cfg.target_stds)
        ctr_w = jnp.where(pos, ctr_t, 0.0)
        denorm = jnp.maximum(ctr_w.sum(), 1.0)  # bbox_avg_factor clamp min 1
        loss_bbox = giou_loss(decoded_pred, decoded_t, weight=ctr_w,
                              reduction="sum", loss_weight=cfg.giou_loss_weight) / denorm

        loss_ctr = (binary_cross_entropy_with_logits(
            centerness, ctr_t, reduction="none")
            * jnp.where(pos, 1.0, 0.0)).sum() / num_pos

        total = loss_cls + loss_bbox + loss_ctr
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "loss_centerness": loss_ctr, "num_pos": num_pos}
        return total, aux

    return loss_fn, anchors_host


def make_atss_train_step(model, cfg, tx) -> Callable:
    loss_fn, anchors_host = make_atss_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, anchors):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, anchors)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, anchors_arg.get(batch.images))

    return step


def make_atss_eval_step(model, cfg) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    bounds = cfg.level_bounds()
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, deltas, centerness = model.apply(variables, images)
        probs = jax.nn.sigmoid(cls_scores)
        ctr = jax.nn.sigmoid(centerness)
        scs, bxs = [], []
        for (s0, s1) in bounds:
            sc = probs[:, s0:s1] * ctr[:, s0:s1, None]
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
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img, t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
