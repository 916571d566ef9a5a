"""CornerNet training + inference: paired-corner keypoints.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/corner_head.py:322-509 (get_targets: per-gt
  gaussian corners at truncated feature coords with ceil-sized radius
  at min_overlap 0.3, sub-pixel offsets at the exact corner pixel,
  per-object corner-coordinate matches for the embedding loss),
  :573-650 (loss_single: gaussian focal / AssociativeEmbedding /
  masked SmoothL1, each tl/br pair averaged), :819-1052
  (decode_heatmap: 3x3 local max, top-k corners, k x k pairing, class/
  embedding-distance/geometry rejection, top num_dets) and
  :788-816 (_bboxes_nms: soft-NMS gaussian + max_per_img).
* mmdet/models/losses/ae_loss.py:10-72 (pull/push on corner pairs).
* configs/cornernet/cornernet_hourglass104_mstest_*.py (corner_topk
  100, local max 3, distance_threshold 0.5, soft_nms gaussian).

TPU redesign: the reference's per-gt python loop becomes a lax.scan of
dense masked gaussian maxima (the CenterNet pattern); the ragged
corner-match list becomes fixed [max_gt] flat corner indices with a
validity mask, so the pull/push losses are dense masked reductions;
decode is fully batched (vmap-free [B, k, k] tensor ops) and soft-NMS
runs as a fixed-iteration lax.scan of gaussian rescoring.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..ops.bbox import bbox_overlaps
from ..ops.nms import NMSResult
from .batch import Batch, EvalBatch, prepare_images
from .centernet import gaussian_focal_loss, gaussian_radius
from .train import TrainState


def corner_targets_single(gt_boxes, gt_labels, gt_valid, cfg):
    """One image -> dict of tl/br heatmaps [fh, fw, C], offsets
    [fh, fw, 2], corner masks [fh, fw], and per-gt flat corner indices
    (for the embedding loss) with validity."""
    h, w = cfg.canvas
    fh, fw = h // cfg.out_stride, w // cfg.out_stride
    rw, rh = fw / w, fh / h
    c = cfg.num_classes

    sl = gt_boxes[:, 0] * rw
    st = gt_boxes[:, 1] * rh
    sr = gt_boxes[:, 2] * rw
    sb = gt_boxes[:, 3] * rh
    li = jnp.minimum(sl, fw - 1).astype(jnp.int32)  # int() truncation
    ti = jnp.minimum(st, fh - 1).astype(jnp.int32)
    ri = jnp.minimum(sr, fw - 1).astype(jnp.int32)
    bi = jnp.minimum(sb, fh - 1).astype(jnp.int32)

    # radius from CEILed scaled box dims (corner_head.py:435-438)
    radius = jnp.maximum(gaussian_radius(jnp.ceil(sb - st), jnp.ceil(sr - sl),
                                         min_overlap=0.3), 0.0).astype(jnp.int32)

    ys = jnp.arange(fh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(fw, dtype=jnp.float32)[None, :]

    def paste(heats, g):
        tl_heat, br_heat = heats
        r = radius[g].astype(jnp.float32)
        sigma = (2 * r + 1) / 6.0
        lab = jnp.where(gt_valid[g], gt_labels[g], c)

        def gauss(cx, cy):
            dx = xs - cx.astype(jnp.float32)
            dy = ys - cy.astype(jnp.float32)
            val = jnp.exp(-(dx * dx + dy * dy) / (2 * sigma * sigma))
            return jnp.where((jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
                             & gt_valid[g], val, 0.0)

        tl_heat = tl_heat.at[:, :, lab].max(gauss(li[g], ti[g]), mode="drop")
        br_heat = br_heat.at[:, :, lab].max(gauss(ri[g], bi[g]), mode="drop")
        return (tl_heat, br_heat), None

    zero = jnp.zeros((fh, fw, c), jnp.float32)
    (tl_heat, br_heat), _ = jax.lax.scan(paste, (zero, zero),
                                         jnp.arange(gt_boxes.shape[0]))

    # sub-pixel offsets at the exact corner pixels (later gt wins in the
    # reference's loop; .at[].set scatters give the same last-wins here)
    ti_v = jnp.where(gt_valid, ti, fh)  # out of range -> dropped
    bi_v = jnp.where(gt_valid, bi, fh)
    tl_off = jnp.zeros((fh, fw, 2), jnp.float32).at[ti_v, li].set(
        jnp.stack([sl - li, st - ti], -1), mode="drop")
    br_off = jnp.zeros((fh, fw, 2), jnp.float32).at[bi_v, ri].set(
        jnp.stack([sr - ri, sb - bi], -1), mode="drop")
    tl_mask = jnp.zeros((fh, fw), jnp.float32).at[ti_v, li].set(1.0, mode="drop")
    br_mask = jnp.zeros((fh, fw), jnp.float32).at[bi_v, ri].set(1.0, mode="drop")

    return dict(
        tl_heat=tl_heat, br_heat=br_heat, tl_off=tl_off, br_off=br_off,
        tl_mask=tl_mask, br_mask=br_mask,
        tl_idx=ti * fw + li, br_idx=bi * fw + ri, emb_valid=gt_valid,
    )


def _ae_loss_single(tl_emb, br_emb, tl_idx, br_idx, valid,
                    pull_weight=0.25, push_weight=0.25, margin=1.0):
    """ae_loss_per_image (ae_loss.py:10-72) as dense masked reductions
    over the fixed [max_gt] corner-index arrays."""
    e_tl = tl_emb.reshape(-1)[tl_idx]
    e_br = br_emb.reshape(-1)[br_idx]
    mean = (e_tl + e_br) / 2.0
    vf = valid.astype(jnp.float32)
    n = vf.sum()
    pull = (((e_tl - mean) ** 2 + (e_br - mean) ** 2) * vf).sum() / jnp.maximum(n, 1.0)

    pair = vf[:, None] * vf[None, :] * (1 - jnp.eye(vf.shape[0]))
    conf = jax.nn.relu(margin - jnp.abs(mean[:, None] - mean[None, :])) * pair
    push = jnp.where(n > 1, conf.sum() / jnp.maximum(n * (n - 1), 1.0), 0.0)
    return pull_weight * pull, push_weight * push


def make_cornernet_loss_fn(model, cfg):
    targets_fn = jax.vmap(functools.partial(corner_targets_single, cfg=cfg))
    ae_fn = jax.vmap(functools.partial(
        _ae_loss_single, pull_weight=cfg.pull_weight,
        push_weight=cfg.push_weight))

    def loss_fn(params, batch_stats, batch: Batch):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        outs, mutated = model.apply(variables, images, train=True,
                                    mutable=["batch_stats"])
        t = targets_fn(batch.gt_boxes, batch.gt_labels, batch.gt_valid)

        det_l = off_l = pull_l = push_l = 0.0
        for (tl_heat, br_heat, tl_emb, br_emb, tl_off, br_off) in outs:
            avg_tl = jnp.maximum((t["tl_heat"] == 1.0).sum().astype(jnp.float32), 1.0)
            avg_br = jnp.maximum((t["br_heat"] == 1.0).sum().astype(jnp.float32), 1.0)
            det_l += (gaussian_focal_loss(jax.nn.sigmoid(tl_heat), t["tl_heat"]).sum() / avg_tl
                      + gaussian_focal_loss(jax.nn.sigmoid(br_heat), t["br_heat"]).sum() / avg_br) / 2.0

            # masked SmoothL1 (beta 1), avg by corner-pixel count
            def sl1(pred, tgt, mask):
                d = jnp.abs(pred - tgt)
                l = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5) * mask[..., None]
                return l.sum() / jnp.maximum(mask.sum(), 1.0)

            off_l += (sl1(tl_off, t["tl_off"], t["tl_mask"])
                      + sl1(br_off, t["br_off"], t["br_mask"])) / 2.0

            # AE loss sums over batch images (AssociativeEmbeddingLoss)
            pull, push = ae_fn(tl_emb[..., 0], br_emb[..., 0],
                               t["tl_idx"], t["br_idx"], t["emb_valid"])
            pull_l += pull.sum()
            push_l += push.sum()

        total = det_l + off_l + pull_l + push_l
        aux = {"loss": total, "loss_det": det_l, "loss_off": off_l,
               "loss_pull": pull_l, "loss_push": push_l}
        return total, (aux, mutated["batch_stats"])

    return loss_fn


def make_cornernet_train_step(model, cfg, tx) -> Callable:
    loss_fn = make_cornernet_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, new_stats, opt_state), aux

    return jax.jit(train_step, donate_argnums=(0,))


def soft_nms_gaussian(boxes, scores, labels, max_out, sigma=0.5,
                      min_score=1e-3):
    """Soft-NMS (gaussian decay), class-aware via the offset trick.
    boxes [N, 4], scores [N], labels [N] -> (sel_idx [max_out],
    sel_scores [max_out], valid [max_out]). Fixed max_out iterations of
    select-max + rescore (mmcv.ops.soft_nms method='gaussian')."""
    off = labels.astype(boxes.dtype)[:, None] * 1e4
    ob = boxes + off
    iou = bbox_overlaps(ob, ob)

    def body(s, _):
        i = jnp.argmax(s)
        top = s[i]
        decay = jnp.exp(-(iou[i] ** 2) / sigma)
        s = s * decay
        s = s.at[i].set(-jnp.inf)
        return s, (i, top)

    _, (idx, sel) = jax.lax.scan(body, scores, None, length=max_out)
    return idx.astype(jnp.int32), sel, sel > min_score


def make_cornernet_eval_step(model, cfg) -> Callable:
    t = cfg.test
    k = cfg.corner_topk
    kernel = cfg.local_maximum_kernel
    num_dets = min(cfg.num_dets, cfg.corner_topk ** 2)

    def eval_step(variables, batch: EvalBatch):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        outs = model.apply(variables, images)
        tl_heat, br_heat, tl_emb, br_emb, tl_off, br_off = outs[-1]
        b, fh, fw, c = tl_heat.shape

        def corners(heat, off, emb):
            p = jax.nn.sigmoid(heat)
            pad = (kernel - 1) // 2
            pmax = jax.lax.reduce_window(
                p, -jnp.inf, jax.lax.max, (1, kernel, kernel, 1),
                (1, 1, 1, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)])
            p = p * (pmax == p)
            flat = p.transpose(0, 3, 1, 2).reshape(b, -1)
            scores, idx = jax.lax.top_k(flat, k)
            cls = (idx // (fh * fw)).astype(jnp.int32)
            pix = idx % (fh * fw)
            ys = (pix // fw).astype(jnp.float32)
            xs = (pix % fw).astype(jnp.float32)
            o = jnp.take_along_axis(off.reshape(b, fh * fw, 2),
                                    pix[..., None], axis=1)
            e = jnp.take_along_axis(emb.reshape(b, fh * fw, 1),
                                    pix[..., None], axis=1)[..., 0]
            return scores, cls, xs + o[..., 0], ys + o[..., 1], e

        tl_s, tl_c, tl_x, tl_y, tl_e = corners(tl_heat, tl_off, tl_emb)
        br_s, br_c, br_x, br_y, br_e = corners(br_heat, br_off, br_emb)

        s = float(cfg.out_stride)
        tl_x = jnp.maximum(tl_x[:, :, None] * s, 0.0)   # [B, k, 1]
        tl_y = jnp.maximum(tl_y[:, :, None] * s, 0.0)
        br_x = jnp.maximum(br_x[:, None, :] * s, 0.0)   # [B, 1, k]
        br_y = jnp.maximum(br_y[:, None, :] * s, 0.0)

        scores = (tl_s[:, :, None] + br_s[:, None, :]) / 2.0
        dists = jnp.abs(tl_e[:, :, None] - br_e[:, None, :])
        bad = ((tl_c[:, :, None] != br_c[:, None, :])
               | (dists > cfg.distance_threshold)
               | (br_x <= tl_x) | (br_y <= tl_y))
        scores = jnp.where(bad, -1.0, scores)

        boxes = jnp.stack(jnp.broadcast_arrays(tl_x, tl_y, br_x, br_y),
                          axis=-1).reshape(b, k * k, 4)
        flat_s = scores.reshape(b, k * k)
        top_s, top_i = jax.lax.top_k(flat_s, num_dets)
        top_b = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
        top_c = jnp.take_along_axis(
            jnp.broadcast_to(tl_c[:, :, None], (b, k, k)).reshape(b, k * k),
            top_i, axis=1)

        def per_image(bx, sc, cl):
            keep = sc > -0.1
            sc = jnp.where(keep, sc, -jnp.inf)
            idx, sel, ok = soft_nms_gaussian(bx, sc, cl, t.max_per_img)
            return bx[idx], sel, cl[idx], ok & jnp.isfinite(sel), idx

        bxs, scs, cls_, ok, idx = jax.vmap(per_image)(top_b, top_s, top_c)
        bxs = bxs / batch.scale_factors[:, None, :]
        return NMSResult(bxs, scs, cls_, ok & (scs > t.score_thr), idx)

    return jax.jit(eval_step)
