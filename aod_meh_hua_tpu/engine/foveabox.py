"""FoveaBox engine: dense fovea-region targets, fused train step, eval.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/fovea_head.py:207-267 (_get_target_single) —
  per level: gts whose sqrt-area falls in the level's scale range,
  pasted LARGEST-FIRST (descending-area sort) so the smallest gt wins
  overlaps; the positive region is the sigma=0.4-shrunk box (ceil/floor
  of x +- (1 -+ sigma) * half - 0.5, clamped into the map); targets are
  log of ((stride * (i + 0.5) - x1) / base_len ...) clamped to
  [1/16, 16]; background target log(1) = 0.
* fovea_head.py:134-181 (loss) — sigmoid focal (gamma 1.5, alpha 0.4)
  averaged by num_pos + num_imgs; SmoothL1 (beta 0.11) on positives
  averaged by num_pos.
* fovea_head.py:298-349 (_get_bboxes_single) — per-level sigmoid +
  top-k, exp decode around stride * (i + 0.5) scaled by base_len,
  clamp to img_shape - 1, multiclass NMS (iou 0.5).

The reference builds targets in a python loop over hit gts per level;
here a lax.scan over the area-sorted padded gt axis pastes each fovea
rectangle with dense masks — fully on device, vmapped over the batch.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.losses import sigmoid_focal_loss_elementwise, smooth_l1_loss
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def fovea_tables(cfg):
    """Static per-point (x+0.5, y+0.5 cell coords, stride, base_len,
    scale range, level extent) tables over the flattened level axis."""
    cols = [[] for _ in range(8)]
    for (h, w), s, b, (l, u) in zip(cfg.featmap_sizes(), cfg.strides,
                                    cfg.base_edge_list, cfg.scale_ranges):
        yy, xx = np.mgrid[:h, :w]
        for col, val in zip(cols, [
                (xx + 0.5).reshape(-1), (yy + 0.5).reshape(-1),
                np.full(h * w, s), np.full(h * w, b), np.full(h * w, l),
                np.full(h * w, u), np.full(h * w, w - 1),
                np.full(h * w, h - 1)]):
            col.append(val)
    return np.stack([np.concatenate(c).astype(np.float32) for c in cols],
                    axis=-1)  # [P, 8]


def _fovea_targets_single(tables, gt_boxes, gt_labels, gt_valid, cfg):
    """One image -> (labels [P] bg=C, bbox_targets [P, 4] log-space)."""
    x, y, stride, base, lo, hi, wmax, hmax = (tables[:, i] for i in range(8))
    c = cfg.num_classes
    sigma = cfg.sigma

    w = gt_boxes[:, 2] - gt_boxes[:, 0]
    h = gt_boxes[:, 3] - gt_boxes[:, 1]
    areas = jnp.sqrt(jnp.clip(w * h, 0.0, None))
    # paste order: descending area, invalid last (smallest valid wins)
    order = jnp.argsort(jnp.where(gt_valid, -areas, jnp.inf))

    labels0 = jnp.full(x.shape, c, jnp.int32)
    targets0 = jnp.zeros(x.shape + (4,), jnp.float32)  # log(1)

    def paste(carry, g):
        labels, targets = carry
        gi = order[g]
        box = gt_boxes[gi]
        gx1, gy1, gx2, gy2 = box[0], box[1], box[2], box[3]
        # per-point level geometry (each point carries its own stride)
        bx1 = gx1 / stride
        by1 = gy1 / stride
        half_w = 0.5 * (gx2 - gx1) / stride
        half_h = 0.5 * (gy2 - gy1) / stride
        # the reference clamps the window into [0, featmap-1] — a fovea
        # outside the map still paints its nearest edge cells
        px1 = jnp.clip(jnp.ceil(bx1 + (1 - sigma) * half_w - 0.5), 0, wmax)
        px2 = jnp.clip(jnp.floor(bx1 + (1 + sigma) * half_w - 0.5), 0, wmax)
        py1 = jnp.clip(jnp.ceil(by1 + (1 - sigma) * half_h - 0.5), 0, hmax)
        py2 = jnp.clip(jnp.floor(by1 + (1 + sigma) * half_h - 0.5), 0, hmax)
        ci = x - 0.5  # cell index of each point
        ri = y - 0.5
        hit = (areas[gi] >= lo) & (areas[gi] <= hi) & gt_valid[gi]
        inside = (ci >= px1) & (ci <= px2) & (ri >= py1) & (ri <= py2)
        mask = hit & inside
        t = jnp.stack([
            (stride * x - gx1) / base,
            (stride * y - gy1) / base,
            (gx2 - stride * x) / base,
            (gy2 - stride * y) / base,
        ], axis=-1)
        t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
        labels = jnp.where(mask, jnp.clip(gt_labels[gi], 0, c - 1), labels)
        targets = jnp.where(mask[:, None], t, targets)
        return (labels, targets), None

    (labels, targets), _ = jax.lax.scan(
        paste, (labels0, targets0), jnp.arange(gt_boxes.shape[0]))
    return labels, targets


def make_fovea_loss_fn(model, cfg):
    tables_host = fovea_tables(cfg)
    targets_fn = jax.vmap(functools.partial(_fovea_targets_single, cfg=cfg),
                          in_axes=(None, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, tables):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bbox_preds = model.apply(variables, images)
        labels, bbox_t = targets_fn(tables, batch.gt_boxes, batch.gt_labels,
                                    batch.gt_valid)
        pos = labels < cfg.num_classes
        num_pos = pos.sum().astype(jnp.float32)
        num_imgs = cls_scores.shape[0]

        elem = sigmoid_focal_loss_elementwise(
            cls_scores, labels, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)
        loss_cls = elem.sum() / (num_pos + num_imgs)

        l1 = smooth_l1_loss(bbox_preds, bbox_t, beta=cfg.smooth_l1_beta,
                            reduction="none")
        loss_bbox = (l1 * pos[..., None]).sum() / jnp.maximum(num_pos, 1.0)
        total = loss_cls + loss_bbox
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "num_pos": num_pos}
        return total, aux

    return loss_fn, tables_host


def make_fovea_train_step(model, cfg, tx) -> Callable:
    loss_fn, tables_host = make_fovea_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, tables):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  tables)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    tables_arg = ConstArg(tables_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, tables_arg.get(batch.images))

    return step


def make_fovea_eval_step(model, cfg) -> Callable:
    tables_host = fovea_tables(cfg)
    bounds = cfg.level_bounds()
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, tables):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bbox_preds = model.apply(variables, images)
        scores = jax.nn.sigmoid(cls_scores)
        offsets = jnp.exp(bbox_preds)
        x, y, stride, base = (tables[:, i] for i in range(4))

        scs, bxs = [], []
        hs = (batch.img_shapes[:, 0:1].astype(jnp.float32)) - 1
        ws = (batch.img_shapes[:, 1:2].astype(jnp.float32)) - 1
        for (s0, s1) in bounds:
            sc = scores[:, s0:s1]
            off = offsets[:, s0:s1]
            xx = (stride * x)[s0:s1][None]
            yy = (stride * y)[s0:s1][None]
            bb = base[s0:s1][None]
            if s1 - s0 > t.nms_pre:
                key = sc.max(axis=-1)
                _, idx = jax.lax.top_k(key, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                off = jnp.take_along_axis(off, idx[..., None], axis=1)
                xx = jnp.take_along_axis(jnp.broadcast_to(xx, key.shape), idx, axis=1)
                yy = jnp.take_along_axis(jnp.broadcast_to(yy, key.shape), idx, axis=1)
                bb = jnp.take_along_axis(jnp.broadcast_to(bb, key.shape), idx, axis=1)
            boxes = jnp.stack([
                jnp.clip(xx - bb * off[..., 0], 0, ws),
                jnp.clip(yy - bb * off[..., 1], 0, hs),
                jnp.clip(xx + bb * off[..., 2], 0, ws),
                jnp.clip(yy + bb * off[..., 3], 0, hs),
            ], axis=-1)
            scs.append(sc)
            bxs.append(boxes)
        scores = jnp.concatenate(scs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1) / batch.scale_factors[:, None, :]
        return batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    tables_arg = ConstArg(tables_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, tables_arg.get(batch.images))

    return step
