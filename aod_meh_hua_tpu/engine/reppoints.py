"""RepPoints training + inference.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/reppoints_head.py:344-363 (offset_to_pts:
  y-first stride-unit offsets -> absolute xy point coords), :168-221
  (points2bbox 'moment': mean +/- unbiased std * exp(moment_transfer)),
  :365-436 (_point_target_single: PointAssigner for the init stage,
  MaxIoUAssigner(0.5/0.4/0) on the init-decoded boxes for the refine
  stage, PseudoSampler), :520-552 (loss_single: focal cls averaged by
  refine positives, SmoothL1(beta .11) on boxes normalized by
  point_base_scale * stride, init weight 0.5 / refine 1.0), :654-749
  (get_bboxes: per-level top-k + multiclass NMS).
* mmdet/core/bbox/assigners/point_assigner.py:23-135 — the per-gt
  python loop over levels becomes one dense masked [P, G] distance
  matrix with per-gt bottom-k candidates; "later gt steals only on
  strictly smaller distance" collapses to a first-occurrence argmin.

TPU redesign: all targets are dense fixed-shape vmapped ops; the
deformable sampling lives in models/reppoints.py as bilinear gathers.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import max_iou_assign
from ..ops.losses import sigmoid_focal_loss_elementwise
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def grid_points(cfg) -> np.ndarray:
    """[P, 3] (x, y, stride) point centers, MlvlPointGenerator(offset=0)
    order (row-major per level, levels concatenated)."""
    pts = []
    for (fh, fw), s in zip(cfg.featmap_sizes(), cfg.strides):
        ys, xs = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
        pts.append(np.stack([xs.reshape(-1) * s, ys.reshape(-1) * s,
                             np.full(fh * fw, s)], axis=-1))
    return np.concatenate(pts).astype(np.float32)


def points2bbox_moment(pts_xy: jnp.ndarray, moments: jnp.ndarray) -> jnp.ndarray:
    """pts_xy [..., n, 2] absolute coords -> [..., 4] boxes via the
    'moment' transform (unbiased std, torch.std default)."""
    n = pts_xy.shape[-2]
    mean = pts_xy.mean(axis=-2)
    var = ((pts_xy - mean[..., None, :]) ** 2).sum(axis=-2) / max(n - 1, 1)
    std = jnp.sqrt(var)
    half_w = std[..., 0] * jnp.exp(moments[0])
    half_h = std[..., 1] * jnp.exp(moments[1])
    return jnp.stack([mean[..., 0] - half_w, mean[..., 1] - half_h,
                      mean[..., 0] + half_w, mean[..., 1] + half_h], axis=-1)


def offsets_to_xy(pred: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """pred [B, P, 2n] y-first stride-unit offsets; points [P, 3] ->
    absolute [B, P, n, 2] (x, y) coords."""
    y = pred[..., 0::2]
    x = pred[..., 1::2]
    s = points[None, :, 2, None]
    return jnp.stack([x * s + points[None, :, 0, None],
                      y * s + points[None, :, 1, None]], axis=-1)


def point_assign(points: jnp.ndarray, gt_boxes: jnp.ndarray,
                 gt_valid: jnp.ndarray, point_valid: jnp.ndarray,
                 scale: int = 4, pos_num: int = 1) -> jnp.ndarray:
    """Dense PointAssigner: [P] int32, 0 background, g+1 positive."""
    num_gt = gt_boxes.shape[0]
    pxy = points[:, :2]
    plvl = jnp.log2(points[:, 2]).astype(jnp.int32)
    lvl_min, lvl_max = plvl.min(), plvl.max()

    gxy = (gt_boxes[:, :2] + gt_boxes[:, 2:]) / 2
    gwh = jnp.maximum(gt_boxes[:, 2:] - gt_boxes[:, :2], 1e-6)
    glvl = ((jnp.log2(gwh[:, 0] / scale) + jnp.log2(gwh[:, 1] / scale)) / 2)
    glvl = jnp.clip(glvl.astype(jnp.int32), lvl_min, lvl_max)  # .int() trunc

    d = jnp.linalg.norm((pxy[:, None, :] - gxy[None, :, :]) / gwh[None, :, :],
                        axis=-1)
    ok = ((plvl[:, None] == glvl[None, :]) & gt_valid[None, :]
          & point_valid[:, None])
    d = jnp.where(ok, d, jnp.inf)

    # per-gt k closest points on its level
    _, idx = jax.lax.top_k(-d.T, pos_num)  # [G, k]
    cand = jnp.zeros(d.shape, bool).at[idx.T, jnp.arange(num_gt)[None, :]].set(True)
    cand_d = jnp.where(cand, d, jnp.inf)
    best = jnp.argmin(cand_d, axis=1)  # first min: earlier gt wins ties
    has = jnp.isfinite(cand_d.min(axis=1))
    return jnp.where(has, best.astype(jnp.int32) + 1, 0)


def _stage_targets(assigned, gt_boxes, gt_labels, gt_valid, point_valid,
                   num_classes):
    pos = (assigned > 0) & point_valid
    neg = (assigned == 0) & point_valid
    gidx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
    labels = jnp.where(pos, gt_labels[gidx], num_classes).astype(jnp.int32)
    label_w = jnp.where(pos | neg, 1.0, 0.0)
    bbox_gt = jnp.where(pos[:, None], gt_boxes[gidx], 0.0)
    bbox_w = jnp.where(pos, 1.0, 0.0)
    # reference num_total counts max(pos, 1) per image (get_targets)
    npos = jnp.maximum(pos.sum(), 1)
    return labels, label_w, bbox_gt, bbox_w, npos


def _smooth_l1(pred, tgt, beta):
    d = jnp.abs(pred - tgt)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def make_reppoints_loss_fn(model, cfg):
    points_host = grid_points(cfg)
    c = cfg.num_classes

    init_assign = jax.vmap(functools.partial(
        point_assign, scale=cfg.point_base_scale, pos_num=cfg.init_pos_num),
        in_axes=(None, 0, 0, 0))
    refine_assign = jax.vmap(functools.partial(
        max_iou_assign, pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0),
        in_axes=(0, 0, 0, 0))
    targets = jax.vmap(functools.partial(_stage_targets, num_classes=c),
                       in_axes=(0, 0, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, points):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls, pts_init, pts_refine, mt = model.apply(variables, images)

        xy_init = offsets_to_xy(pts_init, points)      # [B, P, n, 2]
        xy_refine = offsets_to_xy(pts_refine, points)
        box_init = points2bbox_moment(xy_init, mt)
        box_refine = points2bbox_moment(xy_refine, mt)

        a_init = init_assign(points, batch.gt_boxes, batch.gt_valid,
                             batch.anchor_valid)
        _, _, gt_i, w_i, npos_i = targets(
            a_init, batch.gt_boxes, batch.gt_labels, batch.gt_valid,
            batch.anchor_valid)

        boxes0 = jax.lax.stop_gradient(box_init)
        a_ref = refine_assign(boxes0, batch.gt_boxes, batch.gt_valid,
                              batch.anchor_valid)
        labels, lw, gt_r, w_r, npos_r = targets(
            a_ref, batch.gt_boxes, batch.gt_labels, batch.gt_valid,
            batch.anchor_valid)

        n_init = npos_i.sum().astype(jnp.float32)
        n_ref = npos_r.sum().astype(jnp.float32)

        elem = sigmoid_focal_loss_elementwise(
            cls.reshape(-1, c), labels.reshape(-1),
            gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)
        loss_cls = (elem * lw.reshape(-1, 1)).sum() / n_ref

        norm = (cfg.point_base_scale * points[:, 2])[None, :, None]
        li = _smooth_l1(box_init / norm, gt_i / norm, cfg.smooth_l1_beta)
        loss_init = (li * w_i[..., None]).sum() / n_init * cfg.init_loss_weight
        lr_ = _smooth_l1(box_refine / norm, gt_r / norm, cfg.smooth_l1_beta)
        loss_refine = (lr_ * w_r[..., None]).sum() / n_ref * cfg.refine_loss_weight

        total = loss_cls + loss_init + loss_refine
        aux = {"loss": total, "loss_cls": loss_cls,
               "loss_pts_init": loss_init, "loss_pts_refine": loss_refine,
               "num_pos": n_ref}
        return total, aux

    return loss_fn, points_host


def make_reppoints_train_step(model, cfg, tx) -> Callable:
    loss_fn, points_host = make_reppoints_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, points):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, points)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    points_arg = ConstArg(points_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, points_arg.get(batch.images))

    return step


def make_reppoints_eval_step(model, cfg) -> Callable:
    points_host = grid_points(cfg)
    bounds = cfg.level_bounds()
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, points):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls, _, pts_refine, mt = model.apply(variables, images)
        probs = jax.nn.sigmoid(cls)
        boxes_all = points2bbox_moment(offsets_to_xy(pts_refine, points), mt)
        # clamp to the resized image extent (get_bboxes max_shape)
        hw = batch.img_shapes[:, None, :].astype(boxes_all.dtype)
        boxes_all = jnp.stack([
            jnp.clip(boxes_all[..., 0], 0, hw[..., 1]),
            jnp.clip(boxes_all[..., 1], 0, hw[..., 0]),
            jnp.clip(boxes_all[..., 2], 0, hw[..., 1]),
            jnp.clip(boxes_all[..., 3], 0, hw[..., 0])], axis=-1)
        scs, bxs = [], []
        for (s0, s1) in bounds:
            sc = probs[:, s0:s1]
            bx = boxes_all[:, s0:s1]
            if s1 - s0 > t.nms_pre:
                mx = sc.max(axis=-1)
                _, idx = jax.lax.top_k(mx, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                bx = jnp.take_along_axis(bx, idx[..., None], axis=1)
            scs.append(sc)
            bxs.append(bx)
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
