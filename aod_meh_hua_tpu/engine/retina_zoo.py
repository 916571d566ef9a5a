"""Vanilla mmdet-style RetinaNet train step (focal + L1 on MaxIoU
targets) — the base loss shared by the plain-retina zoo variants whose
novelty lives elsewhere (NAS-FPN's neck, backbone swaps).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/anchor_head.py:440-508 (loss_single: focal
  cls avg num_total_pos, L1 bbox avg num_total_pos) with
  configs/_base_/models/retinanet_r50_fpn.py (MaxIoU .5/.4, stds 1.0,
  FocalLoss gamma 2 alpha .25, L1Loss).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import anchor_targets
from ..ops.losses import sigmoid_focal_loss_elementwise
from .batch import Batch, ConstArg, prepare_images
from .train import TrainState


def make_vanilla_retina_train_step(model, cfg, tx) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    targets_fn = jax.vmap(
        functools.partial(
            anchor_targets, num_classes=cfg.num_classes,
            target_stds=cfg.target_stds,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=0.0),
        in_axes=(None, 0, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, anchors):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, deltas = model.apply(variables, images)
        t = targets_fn(anchors, batch.anchor_valid,
                       batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        num_total = jnp.maximum(t.bbox_weights[..., 0].sum(), 1.0)
        loss_cls = (sigmoid_focal_loss_elementwise(
            cls_scores.reshape(-1, cfg.num_classes), t.labels.reshape(-1))
            * t.label_weights.reshape(-1)[:, None]).sum() / num_total
        loss_bbox = (jnp.abs(deltas - t.bbox_targets)
                     * t.bbox_weights).sum() / num_total
        total = loss_cls + loss_bbox
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "num_pos": num_total}
        return total, aux

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
