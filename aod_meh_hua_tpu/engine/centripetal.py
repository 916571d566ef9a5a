"""CentripetalNet training + inference — corner pairs validated by
centripetal shifts.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/corner_head.py:463-487 (guiding shift
  targets = scaled gt center relative to the corner pixel; centripetal
  shift targets = log of the center-to-exact-corner distance), :907-1001
  (decode: centripetal shifts gathered at the top-k corners, exp'd and
  applied toward the box center; pairs rejected unless BOTH shifted
  points fall inside the mu-shrunken central region, with
  dists = area_ct / area_rcentral <= distance_threshold; mu = 1/2.4,
  or 1/2.1 for boxes with area > 3500).
* mmdet/models/dense_heads/centripetal_head.py:281-361 (loss_single:
  corner det/offset losses from CornerHead + masked SmoothL1 guiding
  (x0.05) and centripetal (x1) losses at the real corner pixels).

The corner-target machinery is shared with engine/cornernet.py; this
module adds the two shift targets as the same last-gt-wins scatters.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..ops.nms import NMSResult
from .batch import Batch, EvalBatch, prepare_images
from .centernet import gaussian_focal_loss
from .cornernet import corner_targets_single, soft_nms_gaussian
from .train import TrainState


def centripetal_targets_single(gt_boxes, gt_labels, gt_valid, cfg):
    """Corner targets + guiding/centripetal shift maps [fh, fw, 2]."""
    t = corner_targets_single(gt_boxes, gt_labels, gt_valid, cfg)
    h, w = cfg.canvas
    fh, fw = h // cfg.out_stride, w // cfg.out_stride
    rw, rh = fw / w, fh / h

    sl = gt_boxes[:, 0] * rw
    st = gt_boxes[:, 1] * rh
    sr = gt_boxes[:, 2] * rw
    sb = gt_boxes[:, 3] * rh
    scx = (sl + sr) / 2.0
    scy = (st + sb) / 2.0
    li = jnp.minimum(sl, fw - 1).astype(jnp.int32)
    ti = jnp.minimum(st, fh - 1).astype(jnp.int32)
    ri = jnp.minimum(sr, fw - 1).astype(jnp.int32)
    bi = jnp.minimum(sb, fh - 1).astype(jnp.int32)
    ti_v = jnp.where(gt_valid, ti, fh)
    bi_v = jnp.where(gt_valid, bi, fh)

    def scatter(row, col, vals):
        return jnp.zeros((fh, fw, 2), jnp.float32).at[row, col].set(
            vals, mode="drop")

    eps = 1e-4  # log() guard for degenerate boxes (reference would -inf)
    t["tl_guide"] = scatter(ti_v, li, jnp.stack(
        [scx - li, scy - ti], -1))
    t["br_guide"] = scatter(bi_v, ri, jnp.stack(
        [ri - scx, bi - scy], -1))
    t["tl_cent"] = scatter(ti_v, li, jnp.stack(
        [jnp.log(jnp.maximum(scx - sl, eps)),
         jnp.log(jnp.maximum(scy - st, eps))], -1))
    t["br_cent"] = scatter(bi_v, ri, jnp.stack(
        [jnp.log(jnp.maximum(sr - scx, eps)),
         jnp.log(jnp.maximum(sb - scy, eps))], -1))
    return t


def _sl1(pred, tgt, mask):
    d = jnp.abs(pred - tgt)
    l = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5) * mask[..., None]
    return l.sum() / jnp.maximum(mask.sum(), 1.0)


def make_centripetal_train_step(model, cfg, tx) -> Callable:
    targets_fn = jax.vmap(functools.partial(centripetal_targets_single,
                                            cfg=cfg))

    def loss_fn(params, batch_stats, batch: Batch):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        outs, mutated = model.apply(variables, images, train=True,
                                    mutable=["batch_stats"])
        t = targets_fn(batch.gt_boxes, batch.gt_labels, batch.gt_valid)

        det_l = off_l = guide_l = cent_l = 0.0
        for (tl_heat, br_heat, tl_off, br_off, tl_g, br_g, tl_c,
             br_c) in outs:
            avg_tl = jnp.maximum(
                (t["tl_heat"] == 1.0).sum().astype(jnp.float32), 1.0)
            avg_br = jnp.maximum(
                (t["br_heat"] == 1.0).sum().astype(jnp.float32), 1.0)
            det_l += (gaussian_focal_loss(
                jax.nn.sigmoid(tl_heat), t["tl_heat"]).sum() / avg_tl
                + gaussian_focal_loss(
                    jax.nn.sigmoid(br_heat), t["br_heat"]).sum() / avg_br) / 2.0
            off_l += (_sl1(tl_off, t["tl_off"], t["tl_mask"])
                      + _sl1(br_off, t["br_off"], t["br_mask"])) / 2.0
            guide_l += 0.05 * (_sl1(tl_g, t["tl_guide"], t["tl_mask"])
                               + _sl1(br_g, t["br_guide"], t["br_mask"])) / 2.0
            cent_l += (_sl1(tl_c, t["tl_cent"], t["tl_mask"])
                       + _sl1(br_c, t["br_cent"], t["br_mask"])) / 2.0

        total = det_l + off_l + guide_l + cent_l
        aux = {"loss": total, "loss_det": det_l, "loss_off": off_l,
               "loss_guide": guide_l, "loss_cent": cent_l}
        return total, (aux, mutated["batch_stats"])

    def train_step(state: TrainState, batch: Batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, new_stats, opt_state), aux

    return jax.jit(train_step, donate_argnums=(0,))


def make_centripetal_eval_step(model, cfg) -> Callable:
    t = cfg.test
    k = cfg.corner_topk
    kernel = cfg.local_maximum_kernel
    num_dets = min(cfg.num_dets, cfg.corner_topk ** 2)

    def eval_step(variables, batch: EvalBatch):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        outs = model.apply(variables, images)
        (tl_heat, br_heat, tl_off, br_off, _, _, tl_cent,
         br_cent) = outs[-1]
        b, fh, fw, c = tl_heat.shape

        def corners(heat, off, cent):
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
            ce = jnp.exp(jnp.take_along_axis(cent.reshape(b, fh * fw, 2),
                                             pix[..., None], axis=1))
            return scores, cls, xs + o[..., 0], ys + o[..., 1], ce

        tl_s, tl_c, tl_x, tl_y, tl_ce = corners(tl_heat, tl_off, tl_cent)
        br_s, br_c, br_x, br_y, br_ce = corners(br_heat, br_off, br_cent)

        s = float(cfg.out_stride)
        # centripetal points move toward the center (decode :912-915),
        # then everything scales to input coords and clamps at 0
        tl_ctx = jnp.maximum((tl_x + tl_ce[..., 0])[:, :, None] * s, 0.0)
        tl_cty = jnp.maximum((tl_y + tl_ce[..., 1])[:, :, None] * s, 0.0)
        br_ctx = jnp.maximum((br_x - br_ce[..., 0])[:, None, :] * s, 0.0)
        br_cty = jnp.maximum((br_y - br_ce[..., 1])[:, None, :] * s, 0.0)
        tl_x = jnp.maximum(tl_x[:, :, None] * s, 0.0)
        tl_y = jnp.maximum(tl_y[:, :, None] * s, 0.0)
        br_x = jnp.maximum(br_x[:, None, :] * s, 0.0)
        br_y = jnp.maximum(br_y[:, None, :] * s, 0.0)

        area = jnp.abs((br_x - tl_x) * (br_y - tl_y))
        area_ct = jnp.abs((br_ctx - tl_ctx) * (br_cty - tl_cty))
        mu = jnp.where(area > 3500.0, 1.0 / 2.1, 1.0 / 2.4)
        cx = (tl_x + br_x) / 2.0
        cy = (tl_y + br_y) / 2.0
        rx1 = cx - mu * (br_x - tl_x) / 2.0
        ry1 = cy - mu * (br_y - tl_y) / 2.0
        rx2 = cx + mu * (br_x - tl_x) / 2.0
        ry2 = cy + mu * (br_y - tl_y) / 2.0
        area_r = jnp.abs((rx2 - rx1) * (ry2 - ry1))
        dists = area_ct / jnp.maximum(area_r, 1e-6)

        inside = ((tl_ctx > rx1) & (tl_ctx < rx2)
                  & (tl_cty > ry1) & (tl_cty < ry2)
                  & (br_ctx > rx1) & (br_ctx < rx2)
                  & (br_cty > ry1) & (br_cty < ry2))
        scores = (tl_s[:, :, None] + br_s[:, None, :]) / 2.0
        bad = ((tl_c[:, :, None] != br_c[:, None, :])
               | (dists > cfg.distance_threshold)
               | (br_x <= tl_x) | (br_y <= tl_y) | ~inside)
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
