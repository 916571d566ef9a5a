"""AutoAssign engine: fused train step and eval step (one jit region
each).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/autoassign_head.py loss(): positive loss
  (get_pos_loss_single :214) — per gt, p_pos = sigmoid(cls) *
  sigmoid(obj) at the gt label x exp(-5 * GIoU loss), softly reweighted
  by exp(3 * p_pos) * center_prior normalized over the gt's interior
  points, then BCE against 1, x0.25 / total gts; negative loss
  (get_neg_loss_single :258) — every (point, class) cell's joint
  confidence is suppressed by (1 - normalized 1/(1-IoU)) at interior
  cells of same-class gts (LATER gt index wins write conflicts — the
  reference scatters in gt order, :298-304), then focal-like
  logits^2 * BCE(0), x0.75 / total center-prior mass; center loss
  (:419-430) — num_gt / center-prior mass per image, batch-meaned,
  x0.75.
* autoassign_head.py CenterPrior.forward: per-level gaussian
  exp(-((p - gt_center)/stride - mean_c)^2 / (2 sigma_c^2)) masked to
  the gt interior; points carry NO half-stride offset
  (_get_points_single :173-187).
* IoUs for the negative weights are the per-point MAX over gts,
  detached (loss() :384-394).

TPU redesign: the per-gt python loops and scatter writes become dense
[P, G] masks; the later-gt-wins scatter is a lax.scan over the static
max_gt axis updating a [P, C] weight map — everything stays inside the
one jitted step.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.losses import _aligned_iou_terms, giou_loss
from ..ops.nms import batched_multiclass_nms
from ..ops.points import distance2bbox
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState

EPS = 1e-12


def autoassign_points(featmap_sizes, strides):
    """[P, 2] (x, y) = cell_index * stride (no half-stride offset,
    autoassign_head.py:173) plus the per-point stride vector [P]."""
    pts, pstr = [], []
    for (h, w), s in zip(featmap_sizes, strides):
        xs = (np.arange(w) * s).astype(np.float32)
        ys = (np.arange(h) * s).astype(np.float32)
        xx, yy = np.meshgrid(xs, ys)
        pts.append(np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
        pstr.append(np.full(h * w, s, np.float32))
    return np.concatenate(pts, 0), np.concatenate(pstr, 0)


def _image_loss(cls_p, reg, obj_p, prior_mean, prior_sigma, points, pstrides,
                gt_boxes, gt_labels, gt_valid, cfg):
    """Per-image pos/neg/center loss pieces. Returns (pos_sum, neg_sum,
    center_num, prior_sum, n_gt) — batch normalization happens in the
    caller (the reference's reduce_mean over DDP ranks = the global
    batch here)."""
    G = gt_boxes.shape[0]
    joint = cls_p * obj_p[:, None]                       # [P, C]

    # geometry
    l_ = points[:, 0:1] - gt_boxes[None, :, 0]
    t_ = points[:, 1:2] - gt_boxes[None, :, 1]
    r_ = gt_boxes[None, :, 2] - points[:, 0:1]
    b_ = gt_boxes[None, :, 3] - points[:, 1:2]
    ltrb = jnp.stack([l_, t_, r_, b_], axis=-1)          # [P, G, 4]
    inside = (ltrb.min(axis=-1) > 0) & gt_valid[None, :]  # [P, G]

    # learnable center prior
    centers = (gt_boxes[:, :2] + gt_boxes[:, 2:]) * 0.5  # [G, 2]
    mean_g = prior_mean[gt_labels]                       # [G, 2]
    sigma_g = prior_sigma[gt_labels]
    d = ((points[:, None, :] - centers[None]) / pstrides[:, None, None]
         - mean_g[None]) ** 2
    prior = jnp.exp(-d / (2.0 * sigma_g[None] ** 2)).prod(-1)  # [P, G]
    prior = jnp.where(inside, prior, 0.0)

    # elementwise GIoU loss of every point's decoded box vs every gt
    pred_box = distance2bbox(points, reg)                # [P, 4]
    tgt_box = distance2bbox(points[:, None, :], ltrb)    # [P, G, 4]
    reg_loss = giou_loss(pred_box[:, None, :], tgt_box, reduction="none",
                         loss_weight=cfg.giou_loss_weight)  # [P, G]

    # detached per-point max IoU (loss() :384-394)
    ious, _, _ = _aligned_iou_terms(
        jax.lax.stop_gradient(pred_box)[:, None, :], tgt_box, 1e-6)
    ious = jnp.where(gt_valid[None, :], ious, 0.0)
    ious = jnp.where(inside,
                     jnp.max(ious, axis=1, keepdims=True), 0.0)  # [P, G]
    ious = jax.lax.stop_gradient(ious)

    # ---- positive loss (get_pos_loss_single) ----
    p_cls = joint[:, gt_labels]                          # [P, G]
    p_loc = jnp.exp(-reg_loss)
    p_pos = p_cls * p_loc
    conf_w = jnp.exp(p_pos * 3.0) * prior
    w_norm = conf_w / jnp.maximum(conf_w.sum(0, keepdims=True), EPS)
    reweighted = (p_pos * w_norm).sum(0)                 # [G]
    pos_bce = -jnp.log(jnp.clip(reweighted, EPS, 1.0))
    pos_sum = (pos_bce * gt_valid).sum() * cfg.pos_loss_weight

    # ---- negative weights (get_neg_loss_single) ----
    tw = 1.0 / jnp.clip(1.0 - ious, EPS, None)           # [P, G]
    has = inside.any(0)                                  # [G]
    tmin = jnp.where(has, jnp.where(inside, tw, jnp.inf).min(0), 0.0)
    tmax = jnp.where(has, jnp.where(inside, tw, -jnp.inf).max(0), 1.0)
    norm = (tw - tmin[None] + EPS) / (tmax[None] - tmin[None] + EPS)
    norm = jnp.where(inside, norm, 0.0)                  # keep jit NaN-free
    # later gt index wins conflicting (point, class) writes: scan in gt
    # order over the static max_gt axis
    onehot_c = jax.nn.one_hot(gt_labels, cfg.num_classes)  # [G, C]

    def write(neg_w, g):
        upd = inside[:, g].astype(jnp.float32)[:, None] * onehot_c[g][None]
        return neg_w * (1.0 - upd) + (1.0 - norm[:, g])[:, None] * upd, None

    neg_w, _ = jax.lax.scan(write, jnp.ones_like(joint), jnp.arange(G))
    logits = joint * jax.lax.stop_gradient(neg_w)
    neg_bce = -jnp.log(jnp.clip(1.0 - logits, EPS, 1.0))
    neg_sum = (logits ** 2 * neg_bce).sum() * cfg.neg_loss_weight

    # ---- center loss pieces (loss() :419-430) ----
    prior_sum = prior.sum()
    any_inside = inside.any()
    n_gt = gt_valid.sum().astype(jnp.float32)
    center_num = jnp.where(any_inside,
                           n_gt / jnp.maximum(prior_sum, EPS), 0.0)
    return pos_sum, neg_sum, center_num, prior_sum, n_gt


def make_autoassign_loss_fn(model, cfg):
    points_host, pstrides_host = autoassign_points(cfg.featmap_sizes(),
                                                   cfg.strides)
    img_fn = jax.vmap(functools.partial(_image_loss, cfg=cfg),
                      in_axes=(0, 0, 0, None, None, None, None, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, points, pstrides):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls, reg, obj, pmean, psigma = model.apply(variables, images)
        cls_p = jax.nn.sigmoid(cls)
        obj_p = jax.nn.sigmoid(obj)
        pos_s, neg_s, center_n, prior_s, n_gt = img_fn(
            cls_p, reg, obj_p, pmean, psigma, points, pstrides,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        total_gt = jnp.maximum(n_gt.sum(), 1.0)
        loss_pos = pos_s.sum() / total_gt
        loss_neg = neg_s.sum() / jnp.maximum(prior_s.sum(), 1.0)
        loss_center = center_n.mean() * cfg.center_loss_weight
        total = loss_pos + loss_neg + loss_center
        aux = {"loss": total, "loss_pos": loss_pos, "loss_neg": loss_neg,
               "loss_center": loss_center, "num_pos": n_gt.sum()}
        return total, aux

    return loss_fn, points_host, pstrides_host


def make_autoassign_train_step(model, cfg, tx) -> Callable:
    loss_fn, points_host, pstrides_host = make_autoassign_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, points, pstrides):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  points, pstrides)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    points_arg = ConstArg(points_host)
    pstr_arg = ConstArg(pstrides_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, points_arg.get(batch.images),
                   pstr_arg.get(batch.images))

    return step


def make_autoassign_eval_step(model, cfg) -> Callable:
    """FCOS-style decode: per-level top-k on score * objectness,
    distance2bbox (distances already in pixels), multiclass NMS
    (AutoAssignHead inherits FCOSHead.get_bboxes; test nms iou 0.6)."""
    points_host, _ = autoassign_points(cfg.featmap_sizes(), cfg.strides)
    bounds = cfg.level_bounds()
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, points):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls, reg, obj, _, _ = model.apply(variables, images)
        probs = jax.nn.sigmoid(cls)
        objp = jax.nn.sigmoid(obj)
        scs, bxs = [], []
        for (s0, s1) in bounds:
            sc = probs[:, s0:s1] * objp[:, s0:s1, None]
            d = reg[:, s0:s1]
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
