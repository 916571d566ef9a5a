"""Guided Anchoring (GA-RetinaNet) engine: loc/shape/cls/reg losses and
the guided-anchor eval, each one jit region.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/guided_anchor_head.py:
  - ga_loc_targets (:372-475): per-gt scale -> one pyramid level
    (floor(log2(scale) - log2(octave_scale * stride0) + 0.5)); center
    region (ratio (1-center_ratio)/2) -> target 1 / weight 1; ignore
    region (ratio (1-ignore_ratio)/2) on the own AND adjacent levels ->
    weight 0; everything else weight 0.1; avg factor = total cells/200.
  - ga_shape_targets (:477-604): ApproxMaxIoUAssigner (per-square max
    IoU over the 9 approxes, then the standard 4-step rule at
    pos .5/neg .4/min_pos .4), RandomSampler(256, .5), BoundedIoU loss
    on anchors decoded from (0, 0, dw, dh) at wh_ratio_clip 1e-6,
    avg factor = sampled pos+neg count.
  - loss (:633-743): cls/reg targets are computed on the PREDICTED
    (guided) anchors with the base assigner overridden to
    neg_iou_thr .5 / min_pos_iou 0; focal cls (avg num_pos), SmoothL1
    beta .04 (configs/guided_anchoring/ga_retinanet_r50_fpn_1x_coco.py).
  - get_bboxes (:745-807) + _get_guided_anchors_single (:344-370):
    eval decodes from the guided anchors and keeps only cells whose
    loc sigmoid >= loc_filter_thr.

TPU redesign: every per-gt python loop becomes dense [G, H, W] (loc
regions) or [G, A] (assignment) broadcasting; the MaskedConv2d sparsity
is recovered by zeroing scores outside the loc mask (identical
surviving detections, no dynamic shapes). One dense-order deviation is
documented inline (center-vs-ignore write order across DIFFERENT gts).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import anchor_targets, max_iou_assign
from ..ops.bbox import bbox_overlaps, delta_decode
from ..ops.losses import bounded_iou_loss, sigmoid_focal_loss_elementwise
from ..ops.nms import batched_multiclass_nms
from ..ops.sampler import random_sample_pos_neg
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def _ga_tables(cfg):
    """Host-side constants: squares [A, 4], approxes [A, K, 4], per-level
    (size, stride) for the loc maps. A = total cells over levels (one
    square per cell); grid_anchors is position-major so the K approxes of
    a cell are contiguous."""
    sizes = cfg.featmap_sizes()
    sq = np.concatenate(
        cfg.build_anchor_generator().grid_anchors(sizes)).astype(np.float32)
    k = cfg.approxs_per_cell
    ap = np.concatenate([
        a.reshape(-1, k, 4)
        for a in cfg.build_approx_generator().grid_anchors(sizes)
    ]).astype(np.float32)
    return sq, ap, sizes


def _region_mask(gt, ratio, h, w):
    """[G, H, W] cell membership of each gt's proportional region
    (anchor/utils.py:49 calc_region + the +1-inclusive slice writes).
    gt is already in feature-cell coordinates."""
    x1 = jnp.clip(jnp.round((1 - ratio) * gt[:, 0] + ratio * gt[:, 2]), 0, w - 1)
    y1 = jnp.clip(jnp.round((1 - ratio) * gt[:, 1] + ratio * gt[:, 3]), 0, h - 1)
    x2 = jnp.clip(jnp.round(ratio * gt[:, 0] + (1 - ratio) * gt[:, 2]), 0, w - 1)
    y2 = jnp.clip(jnp.round(ratio * gt[:, 1] + (1 - ratio) * gt[:, 3]), 0, h - 1)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    return ((xs >= x1[:, None, None]) & (xs <= x2[:, None, None])
            & (ys >= y1[:, None, None]) & (ys <= y2[:, None, None]))


def _loc_targets_single(gt_boxes, gt_valid, cfg, sizes):
    """Flattened-over-levels (targets [A], weights [A]) for one image.

    Dense redesign of ga_loc_targets' sequential per-gt writes: center
    regions win over ignore regions regardless of gt order (the
    reference's last-writer-wins can zero an EARLIER gt's center cell
    when a LATER gt's ignore region covers it — an order artifact, not a
    modeling choice)."""
    strides = [s if isinstance(s, int) else s[0] for s in cfg.strides]
    r1 = (1 - cfg.center_ratio) / 2
    r2 = (1 - cfg.ignore_ratio) / 2
    num_lvls = len(sizes)

    scale = jnp.sqrt(jnp.maximum(
        (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]),
        1e-12))
    min_size = float(cfg.octave_base_scale * strides[0])
    lvl = jnp.clip(jnp.floor(jnp.log2(scale) - np.log2(min_size) + 0.5),
                   0, num_lvls - 1).astype(jnp.int32)

    t_parts, w_parts = [], []
    for li, ((h, w), stride) in enumerate(zip(sizes, strides)):
        gt = gt_boxes / stride
        own = gt_valid & (lvl == li)
        adj = gt_valid & ((lvl == li - 1) | (lvl == li + 1))
        center = (_region_mask(gt, r1, h, w) & own[:, None, None]).any(0)
        ign_own = (_region_mask(gt, r2, h, w) & own[:, None, None]).any(0)
        ign_adj = (_region_mask(gt, r2, h, w) & adj[:, None, None]).any(0)
        target = center.astype(jnp.float32)
        weight = jnp.where(center, 1.0,
                           jnp.where(ign_own | ign_adj, 0.0, 0.1))
        t_parts.append(target.reshape(-1))
        w_parts.append(weight.reshape(-1))
    return jnp.concatenate(t_parts), jnp.concatenate(w_parts)


def _guided_anchors(squares, shape_pred):
    """Decode squares with the (detached) 2-channel shape prediction
    (_get_guided_anchors_single: bbox_deltas = [0, 0, dw, dh],
    wh_ratio_clip 1e-6, anchor coder stds 1.0)."""
    deltas = jnp.concatenate(
        [jnp.zeros_like(shape_pred), jax.lax.stop_gradient(shape_pred)],
        axis=-1)
    return delta_decode(squares, deltas, wh_ratio_clip=1e-6)


def make_ga_train_step(model, cfg, tx) -> Callable:
    squares_host, approx_host, sizes = _ga_tables(cfg)
    k = cfg.approxs_per_cell
    total_cells = squares_host.shape[0]
    # loc_avg_factor: sum over levels of B*H*W / 200 (ga_loc_targets:471)
    loc_fn = jax.vmap(functools.partial(
        _loc_targets_single, cfg=cfg, sizes=sizes), in_axes=(0, 0))

    cls_targets_fn = jax.vmap(
        functools.partial(
            anchor_targets, num_classes=cfg.num_classes,
            target_stds=cfg.target_stds,
            pos_iou_thr=cfg.cls_pos_iou_thr, neg_iou_thr=cfg.cls_neg_iou_thr,
            min_pos_iou=0.0),
        in_axes=(0, 0, 0, 0, 0))  # anchors are per-image (guided)

    def shape_targets_single(key, squares, approxes, anchor_valid,
                             gt_boxes, gt_labels, gt_valid):
        """-> (is_pos [A], matched_gt [A, 4], num_pos, num_neg)."""
        iou = bbox_overlaps(gt_boxes, approxes.reshape(-1, 4))
        iou = iou.reshape(gt_boxes.shape[0], -1, k).max(axis=-1)  # [G, A]
        assigned = max_iou_assign(
            squares, gt_boxes, gt_valid, anchor_valid=anchor_valid,
            pos_iou_thr=cfg.ga_pos_iou_thr, neg_iou_thr=cfg.ga_neg_iou_thr,
            min_pos_iou=cfg.ga_min_pos_iou, overlaps=iou)
        s = random_sample_pos_neg(key, assigned, anchor_valid,
                                  cfg.ga_sampler_num, cfg.ga_pos_fraction)
        is_pos = jnp.zeros((squares.shape[0],), bool).at[s.inds].max(s.is_pos)
        gt_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
        matched_gt = gt_boxes[gt_idx]
        num_pos = jnp.maximum(s.num_pos, 1)
        num_neg = jnp.maximum(s.valid.sum() - s.num_pos, 1)
        return is_pos, matched_gt, num_pos, num_neg

    def loss_fn(params, batch_stats, batch: Batch, squares, approxes, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, deltas, shape_pred, loc_pred = model.apply(variables, images)
        b = cls_scores.shape[0]

        # ---- loc branch (focal, target 1 = fg class 0 in mmcv's
        # 1-indexed kernel convention)
        loc_t, loc_w = loc_fn(batch.gt_boxes, batch.gt_valid)
        loc_labels = jnp.where(loc_t > 0.5, 0, 1)
        loc_avg = b * total_cells / 200.0
        loss_loc = (sigmoid_focal_loss_elementwise(
            loc_pred[..., None], loc_labels,
            gamma=cfg.loc_focal_gamma, alpha=cfg.loc_focal_alpha,
        )[..., 0] * loc_w).sum() / loc_avg

        # ---- shape branch (BoundedIoU on decoded anchors)
        st = jax.vmap(shape_targets_single, in_axes=(0, None, None, 0, 0, 0, 0))(
            jax.random.split(key, b), squares, approxes, batch.anchor_valid,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        is_pos, matched_gt, num_pos, num_neg = st
        anchor_total = (num_pos + num_neg).sum().astype(jnp.float32)
        pred_anchors = _guided_anchors_grad(squares, shape_pred)
        loss_shape = bounded_iou_loss(
            pred_anchors, matched_gt, weight=is_pos[..., None].astype(jnp.float32),
            beta=cfg.bounded_iou_beta, reduction="sum") / anchor_total

        # ---- cls/reg on the guided anchors
        ga = _guided_anchors(jnp.broadcast_to(squares, (b,) + squares.shape),
                             shape_pred)
        t = cls_targets_fn(ga, batch.anchor_valid,
                           batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        # focal cls -> avg factor is num_total_pos (sampling=False)
        num_total = jnp.maximum(t.bbox_weights[..., 0].sum(), 1.0)
        loss_cls = (sigmoid_focal_loss_elementwise(
            cls_scores.reshape(-1, cfg.num_classes), t.labels.reshape(-1),
        ) * t.label_weights.reshape(-1)[:, None]).sum() / num_total
        beta = cfg.smooth_l1_beta
        diff = jnp.abs(deltas - t.bbox_targets)
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta)
        loss_bbox = (sl1 * t.bbox_weights).sum() / num_total

        total = loss_loc + loss_shape + loss_cls + loss_bbox
        aux = {"loss": total, "loss_loc": loss_loc, "loss_shape": loss_shape,
               "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "num_pos": t.bbox_weights[..., 0].sum()}
        return total, aux

    def train_step(state: TrainState, batch: Batch, squares, approxes, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  squares, approxes, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    sq_arg = ConstArg(squares_host)
    ap_arg = ConstArg(approx_host)

    def step(state: TrainState, batch: Batch, key):
        return jfn(state, batch, sq_arg.get(batch.images),
                   ap_arg.get(batch.images), key)

    return step


def _guided_anchors_grad(squares, shape_pred):
    """Like _guided_anchors but the shape gradient FLOWS (the shape loss
    path, loss_shape_single: bbox_deltas[:, 2:] += shape_pred)."""
    deltas = jnp.concatenate(
        [jnp.zeros_like(shape_pred), shape_pred], axis=-1)
    return delta_decode(squares, deltas, wh_ratio_clip=1e-6)


def make_ga_eval_step(model, cfg) -> Callable:
    """Guided-anchor eval: decode from per-image guided anchors, keep
    only loc-masked cells (scores of filtered cells zeroed — the same
    detections MaskedConv2d + mask indexing would keep), standard
    multiclass NMS."""
    squares_host, _, _ = _ga_tables(cfg)
    bounds = cfg.level_bounds()
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, squares):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, deltas, shape_pred, loc_pred = model.apply(variables, images)
        b = cls_scores.shape[0]
        probs = jax.nn.sigmoid(cls_scores)
        loc_mask = jax.nn.sigmoid(loc_pred) >= cfg.loc_filter_thr
        probs = probs * loc_mask[..., None]
        ga = _guided_anchors(jnp.broadcast_to(squares, (b,) + squares.shape),
                             shape_pred)
        scs, bxs = [], []
        for (s0, s1) in bounds:
            sc = probs[:, s0:s1]
            d = deltas[:, s0:s1]
            anc = ga[:, s0:s1]
            n = s1 - s0
            if n > t.nms_pre:
                mx = sc.max(axis=-1)
                _, idx = jax.lax.top_k(mx, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                d = jnp.take_along_axis(d, idx[..., None], axis=1)
                anc = jnp.take_along_axis(anc, idx[..., None], axis=1)
            boxes = delta_decode(anc, d, stds=cfg.target_stds,
                                 max_shape=batch.img_shapes[:, None, :])
            scs.append(sc)
            bxs.append(boxes)
        scores = jnp.concatenate(scs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1) / batch.scale_factors[:, None, :]
        return batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    sq_arg = ConstArg(squares_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, sq_arg.get(batch.images))

    return step
