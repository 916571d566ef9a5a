"""PISA (Prime Sample Attention) RetinaNet engine: ISR-P reweighting +
CARL loss on the standard retina targets.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/losses/pisa_loss.py:
  - isr_p (:8-122): positives get IoU-HLR importance weights — rank the
    decoded-pred-vs-decoded-target IoUs DESCENDING within each (class,
    gt) group, add (max_l_num - rank) to the IoU, re-rank within the
    class group, map rank r to weight lw * (max_l_num - r)/max_l_num,
    sharpen with (bias + w*(1-bias))^k, then rescale so the weighted
    positive cls loss keeps its original sum.
  - carl_loss (:125-183): a third loss — per-positive smooth-L1
    regression weighted by (bias + (1-bias)*sigmoid cls score)^k,
    normalized so the weights sum to num_pos, averaged by num_total_pos.
* mmdet/models/dense_heads/pisa_retinanet_head.py:22-159 (flattened
  multi-level loss with isr/carl; num_total_samples = num_pos).
* configs/pisa/pisa_retinanet_r50_fpn_1x_coco.py: SmoothL1 beta .11,
  isr k=2 bias=0, carl k=1 bias=0.2.

TPU redesign: the reference's nested python loops over unique labels /
gts (with .sort() host syncs per group) collapse to TWO sort-based
dense group rankings — a stable argsort on a composite (group, -value)
key plus a scatter-min of in-sort positions recovers every group's
descending ranks at once, O(N log N), no host round trips.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import anchor_targets
from ..ops.bbox import delta_decode
from ..ops.losses import sigmoid_focal_loss_elementwise
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def group_rank_desc(values, group_id, mask, num_groups):
    """Descending rank (0 = largest) of each masked element WITHIN its
    group. Stable: ties rank by original index. Masked-out elements get
    an arbitrary large rank. group_id must be in [0, num_groups)."""
    n = values.shape[0]
    gid = jnp.where(mask, group_id, num_groups).astype(jnp.int32)
    # lexsort: primary = group (masked last), secondary = value desc,
    # ties stable by index — exact grouped sort at any scale
    order = jnp.lexsort((-values, gid))
    pos = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    gfirst = jnp.full((num_groups + 1,), n, jnp.int32).at[gid].min(pos)
    return pos - gfirst[gid]


def isr_p_label_weights(cls_scores, deltas, t_labels, t_label_weights,
                        t_bbox_targets, anchors, gt_group, num_classes,
                        target_stds, k, bias):
    """Dense isr_p: returns the new [N] label weights (pisa_loss.py:8-122).

    cls_scores [N, C] raw logits, deltas [N, 4], anchors [N, 4];
    gt_group [N] GLOBAL gt index (img * max_gt + gt) of each positive."""
    is_pos = t_labels < num_classes
    num_pos = jnp.maximum(is_pos.sum(), 1).astype(jnp.float32)

    pred_boxes = delta_decode(anchors, jax.lax.stop_gradient(deltas),
                              stds=target_stds)
    target_boxes = delta_decode(anchors, t_bbox_targets, stds=target_stds)
    x1 = jnp.maximum(pred_boxes[:, 0], target_boxes[:, 0])
    y1 = jnp.maximum(pred_boxes[:, 1], target_boxes[:, 1])
    x2 = jnp.minimum(pred_boxes[:, 2], target_boxes[:, 2])
    y2 = jnp.minimum(pred_boxes[:, 3], target_boxes[:, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area_p = (pred_boxes[:, 2] - pred_boxes[:, 0]) * (pred_boxes[:, 3] - pred_boxes[:, 1])
    area_t = (target_boxes[:, 2] - target_boxes[:, 0]) * (target_boxes[:, 3] - target_boxes[:, 1])
    ious = inter / jnp.maximum(area_p + area_t - inter, 1e-6)

    # max_l_num: the largest per-class positive population
    cls_counts = jnp.zeros((num_classes,), jnp.int32).at[
        jnp.where(is_pos, t_labels, 0)].add(is_pos.astype(jnp.int32))
    max_l_num = jnp.maximum(cls_counts.max(), 1).astype(jnp.float32)

    # step 1: rank IoUs desc within each (class, gt) group's positives
    # (the reference loops unique labels THEN unique gts inside, :86-95)
    n = gt_group.shape[0]
    cg = jnp.clip(gt_group, 0, n - 1) * num_classes + jnp.where(
        is_pos, t_labels, 0)
    t_rank = group_rank_desc(ious, cg, is_pos, n * num_classes)
    ious_adj = ious + (max_l_num - t_rank.astype(jnp.float32))
    # step 2: rank adjusted IoUs desc within each CLASS -> IoU-HLR
    l_rank = group_rank_desc(ious_adj, jnp.where(is_pos, t_labels, 0),
                             is_pos, num_classes)
    w = t_label_weights * (max_l_num - l_rank.astype(jnp.float32)) / max_l_num
    w = (bias + w * (1.0 - bias)) ** k

    # rescale so the weighted positive focal-cls loss keeps its sum
    pos_loss = sigmoid_focal_loss_elementwise(
        jax.lax.stop_gradient(cls_scores), t_labels)
    pos_loss = jnp.where(is_pos[:, None], pos_loss, 0.0)
    ori = (pos_loss * t_label_weights[:, None]).sum()
    new = (pos_loss * w[:, None]).sum()
    ratio = ori / jnp.maximum(new, 1e-12)
    return jnp.where(is_pos, w * ratio, t_label_weights)


def carl_loss_dense(cls_scores, t_labels, deltas, t_bbox_targets,
                    num_classes, beta, k, bias, avg_factor):
    """Dense carl_loss (pisa_loss.py:125-183), sigmoid scores, smooth-L1
    regression at `beta`."""
    is_pos = t_labels < num_classes
    num_pos = is_pos.sum().astype(jnp.float32)
    sel = jnp.clip(t_labels, 0, num_classes - 1)
    score = jnp.take_along_axis(jax.nn.sigmoid(cls_scores), sel[:, None],
                                axis=1)[:, 0]
    w = (bias + (1.0 - bias) * score) ** k
    w = jnp.where(is_pos, w, 0.0)
    w = w * (num_pos / jnp.maximum(w.sum(), 1e-12))
    diff = jnp.abs(deltas - t_bbox_targets)
    sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    per = sl1 / jnp.maximum(avg_factor, 1.0)
    return (per * (w * is_pos)[:, None]).sum()


def make_pisa_retina_train_step(model, cfg, tx) -> Callable:
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
        b, a = cls_scores.shape[:2]
        t = targets_fn(anchors, batch.anchor_valid,
                       batch.gt_boxes, batch.gt_labels, batch.gt_valid)

        g = batch.gt_boxes.shape[1]
        gt_group = (jnp.arange(b, dtype=jnp.int32)[:, None] * g
                    + t.gt_inds).reshape(-1)
        flat_cls = cls_scores.reshape(-1, cfg.num_classes)
        flat_deltas = deltas.reshape(-1, 4)
        flat_anchors = jnp.broadcast_to(anchors, (b,) + anchors.shape
                                        ).reshape(-1, 4)
        labels = t.labels.reshape(-1)
        lw = isr_p_label_weights(
            flat_cls, flat_deltas, labels, t.label_weights.reshape(-1),
            t.bbox_targets.reshape(-1, 4), flat_anchors, gt_group,
            cfg.num_classes, cfg.target_stds, cfg.isr_k, cfg.isr_bias)
        lw = jax.lax.stop_gradient(lw)

        num_total = jnp.maximum(
            t.bbox_weights[..., 0].sum(), 1.0)  # focal: num_total_pos
        loss_cls = (sigmoid_focal_loss_elementwise(flat_cls, labels)
                    * lw[:, None]).sum() / num_total
        beta = cfg.smooth_l1_beta
        diff = jnp.abs(flat_deltas - t.bbox_targets.reshape(-1, 4))
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta)
        loss_bbox = (sl1 * t.bbox_weights.reshape(-1, 4)).sum() / num_total
        loss_carl = carl_loss_dense(
            flat_cls, labels, flat_deltas, t.bbox_targets.reshape(-1, 4),
            cfg.num_classes, beta, cfg.carl_k, cfg.carl_bias, num_total)

        total = loss_cls + loss_bbox + loss_carl
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "loss_carl": loss_carl, "num_pos": num_total}
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
