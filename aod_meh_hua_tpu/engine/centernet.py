"""CenterNet engine: dense gaussian-heatmap targets, gaussian focal
loss, fused train step (mutable BN), and the pooling-NMS eval step.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/centernet_head.py:179-258 (get_targets) —
  per gt: integer center on the stride-4 map, gaussian with radius from
  gaussian_radius(min_overlap=0.3) pasted by max; wh/offset/weight at
  the integer center; avg_factor = count(heatmap == 1) clamped >= 1.
* mmdet/models/utils/gaussian_target.py:7-29 (gaussian2D sigma =
  diameter/6), :67-186 (the three-case Vieta radius), :189-203
  (local max via 3x3 max-pool), :206-235 (per-class flattened topk).
* mmdet/models/losses/gaussian_focal_loss.py:15-28 — alpha 2, gamma 4;
  pos at target==1, neg weighted (1-t)^4.
* centernet_head.py:160-177 (loss) — heatmap avg_factor, wh x0.1 and
  offset x1.0 averaged by 2*avg_factor.
* centernet_head.py:315-360 (decode_heatmap) — local max -> topk ->
  gather wh/offset -> boxes x(input/feat), rescale; no box NMS.

The reference builds targets in a python double loop over images and
gts; here a lax.scan over the padded gt axis pastes each gaussian with
a dense masked max — fully on device, vmapped over the batch.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..ops.nms import NMSResult
from .batch import Batch, EvalBatch, prepare_images
from .train import TrainState


def gaussian_radius(height, width, min_overlap=0.3):
    """Vectorized three-case Vieta radius (gaussian_target.py:67-186)."""
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1 * b1 - 4 * c1, 0.0))) / 2

    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2 * b2 - 16 * c2, 0.0))) / 8

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    # reference root: (b3 + sqrt(disc)) / (2*a3) with b3 negative
    # (gaussian_target.py:185); c3 <= 0 so sqrt(disc) >= |b3| and r3 >= 0
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 * b3 - 4 * a3 * c3, 0.0))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def _targets_single(gt_boxes, gt_labels, gt_valid, cfg):
    """One image -> (heatmap [H, W, C], wh [H, W, 2], offset [H, W, 2],
    weight [H, W]) on the stride-4 grid."""
    h, w = cfg.canvas
    fh, fw = h // cfg.out_stride, w // cfg.out_stride
    ratio = 1.0 / cfg.out_stride
    c = cfg.num_classes

    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * ratio / 2
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * ratio / 2
    cxi = jnp.clip(cx.astype(jnp.int32), 0, fw - 1)
    cyi = jnp.clip(cy.astype(jnp.int32), 0, fh - 1)
    sw = (gt_boxes[:, 2] - gt_boxes[:, 0]) * ratio
    sh = (gt_boxes[:, 3] - gt_boxes[:, 1]) * ratio
    radius = jnp.maximum(
        gaussian_radius(sh, sw, cfg.gaussian_min_overlap), 0.0
    ).astype(jnp.int32)  # int() truncation as in the reference

    ys = jnp.arange(fh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(fw, dtype=jnp.float32)[None, :]

    def paste(heat, g):
        r = radius[g].astype(jnp.float32)
        sigma = (2 * r + 1) / 6.0
        dx = xs - cxi[g].astype(jnp.float32)
        dy = ys - cyi[g].astype(jnp.float32)
        gauss = jnp.exp(-(dx * dx + dy * dy) / (2 * sigma * sigma))
        gauss = jnp.where((jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
                          & gt_valid[g], gauss, 0.0)
        lab = jnp.where(gt_valid[g], gt_labels[g], c)
        return heat.at[:, :, lab].max(gauss, mode="drop"), None

    heat, _ = jax.lax.scan(paste, jnp.zeros((fh, fw, c), jnp.float32),
                           jnp.arange(gt_boxes.shape[0]))

    # wh / offset / weight at the integer centers (later gt wins)
    yi = jnp.where(gt_valid, cyi, fh)  # fh = out of range, dropped
    wh = jnp.zeros((fh, fw, 2), jnp.float32)
    wh = wh.at[yi, cxi].set(jnp.stack([sw, sh], -1), mode="drop")
    off = jnp.zeros((fh, fw, 2), jnp.float32)
    off = off.at[yi, cxi].set(
        jnp.stack([cx - cxi.astype(jnp.float32),
                   cy - cyi.astype(jnp.float32)], -1), mode="drop")
    weight = jnp.zeros((fh, fw), jnp.float32).at[yi, cxi].set(1.0, mode="drop")
    return heat, wh, off, weight


def gaussian_focal_loss(pred, target, alpha=2.0, gamma=4.0, eps=1e-12):
    pos = -jnp.log(pred + eps) * (1 - pred) ** alpha * (target == 1.0)
    neg = -jnp.log(1 - pred + eps) * pred ** alpha * (1 - target) ** gamma
    return pos + neg


def make_centernet_loss_fn(model, cfg):
    targets_fn = jax.vmap(functools.partial(_targets_single, cfg=cfg))

    def loss_fn(params, batch_stats, batch: Batch):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        (heat_logits, wh_pred, off_pred), mutated = model.apply(
            variables, images, train=True, mutable=["batch_stats"])
        heat_t, wh_t, off_t, weight = targets_fn(
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        avg = jnp.maximum((heat_t == 1.0).sum().astype(jnp.float32), 1.0)

        p = jax.nn.sigmoid(heat_logits)
        loss_heat = gaussian_focal_loss(p, heat_t).sum() / avg
        w2 = weight[..., None]
        loss_wh = (jnp.abs(wh_pred - wh_t) * w2).sum() / (avg * 2) \
            * cfg.wh_loss_weight
        loss_off = (jnp.abs(off_pred - off_t) * w2).sum() / (avg * 2) \
            * cfg.offset_loss_weight
        total = loss_heat + loss_wh + loss_off
        aux = {"loss": total, "loss_heatmap": loss_heat, "loss_wh": loss_wh,
               "loss_offset": loss_off, "num_pos": avg}
        return total, (aux, mutated["batch_stats"])

    return loss_fn


def make_centernet_train_step(model, cfg, tx) -> Callable:
    loss_fn = make_centernet_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, new_stats, opt_state), aux

    return jax.jit(train_step, donate_argnums=(0,))


def make_centernet_eval_step(model, cfg) -> Callable:
    t = cfg.test
    k_top = t.max_per_img
    kernel = cfg.local_maximum_kernel

    def eval_step(variables, batch: EvalBatch):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        heat_logits, wh_pred, off_pred = model.apply(variables, images)
        b, fh, fw, c = heat_logits.shape
        heat = jax.nn.sigmoid(heat_logits)

        pad = (kernel - 1) // 2
        hmax = jax.lax.reduce_window(
            heat, -jnp.inf, jax.lax.max, (1, kernel, kernel, 1), (1, 1, 1, 1),
            [(0, 0), (pad, pad), (pad, pad), (0, 0)])
        heat = heat * (hmax == heat)

        # per-class flattened topk in the reference's [B, C, H, W] order
        flat = heat.transpose(0, 3, 1, 2).reshape(b, -1)
        scores, idx = jax.lax.top_k(flat, k_top)
        labels = (idx // (fh * fw)).astype(jnp.int32)
        pix = idx % (fh * fw)
        ys = (pix // fw).astype(jnp.float32)
        xs = (pix % fw).astype(jnp.float32)

        wh = jnp.take_along_axis(wh_pred.reshape(b, fh * fw, 2),
                                 pix[..., None], axis=1)
        off = jnp.take_along_axis(off_pred.reshape(b, fh * fw, 2),
                                  pix[..., None], axis=1)
        cx = xs + off[..., 0]
        cy = ys + off[..., 1]
        s = float(cfg.out_stride)
        boxes = jnp.stack([(cx - wh[..., 0] / 2) * s,
                           (cy - wh[..., 1] / 2) * s,
                           (cx + wh[..., 0] / 2) * s,
                           (cy + wh[..., 1] / 2) * s], axis=-1)
        boxes = boxes / batch.scale_factors[:, None, :]
        valid = scores > t.score_thr
        return NMSResult(boxes, scores, labels, valid, pix)

    return jax.jit(eval_step)
