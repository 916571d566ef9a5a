"""Grid R-CNN engine: jittered-positive grid heatmap training and the
grid-voted eval refinement.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/grid_roi_head.py:27-50 (_random_jitter:
  amplitude .15 on cxcywh, clipped to img_shape - 1), :79-120 (grid
  branch trains on jittered positives only; cls-only bbox branch).
* mmdet/models/roi_heads/mask_heads/grid_head.py:
  - get_targets (:222-287): positives' 2x-expanded boxes carry, per
    grid point, a radius-`pos_radius` circle at the gt grid point's
    position in 56x56 whole-map coords, cropped to the point's 28x28
    sub-region; boxes with expanded w/h <= grid_size are ignored.
  - loss (:289-295): BCE-with-logits at weight 15 on BOTH the fused and
    unfused heatmaps, mean over all elements.
  - get_bboxes (:297-362): per-point argmax in the sub-region heatmap,
    mapped into the expanded detection box, then boundary voting
    (score-weighted average of the edge points) replaces each box side.
* configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_2x_coco.py (pos_radius 1,
  grid sampler 192 cap — here the fixed positive slots bound it).

TPU redesign: the reference's per-roi/per-point python rasterization
loop becomes one broadcast circle test over static [56] coordinate
vectors; targets never materialize the whole map — each point's 28x28
sub-window is generated directly from its static origin.
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.losses import (binary_cross_entropy_with_logits,
                          softmax_cross_entropy)
from ..ops.nms import batched_multiclass_nms
from ..ops.roi_align import multilevel_roi_align
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState
from .two_stage import (_extract_rois, _roi_sample_single,
                        _rpn_targets_single, _stage1, make_proposal_fn)
from ..models.grid_rcnn import calc_sub_regions


def _jitter_boxes(key, boxes, img_shapes, amplitude=0.15):
    """grid_roi_head.py:27-50 for [S, 4] boxes of one image."""
    off = jax.random.uniform(key, boxes.shape, minval=-amplitude,
                             maxval=amplitude)
    cxcy = (boxes[:, 2:] + boxes[:, :2]) / 2
    wh = jnp.abs(boxes[:, 2:] - boxes[:, :2])
    new_c = cxcy + wh * off[:, :2]
    new_wh = wh * (1 + off[:, 2:])
    b = jnp.concatenate([new_c - new_wh / 2, new_c + new_wh / 2], axis=1)
    h, w = img_shapes[0], img_shapes[1]
    return jnp.stack([
        jnp.clip(b[:, 0], 0, w - 1), jnp.clip(b[:, 1], 0, h - 1),
        jnp.clip(b[:, 2], 0, w - 1), jnp.clip(b[:, 3], 0, h - 1)], axis=1)


def _grid_point_factors(grid_points, grid_size):
    f = []
    for j in range(grid_points):
        f.append((1 - (j // grid_size) / (grid_size - 1),
                  1 - (j % grid_size) / (grid_size - 1)))
    return np.asarray(f, np.float32)  # [(fx, fy)]


def grid_targets(pos_boxes, gt_boxes, grid_points, whole_map, pos_radius):
    """Dense get_targets for [S, 4] jittered positives + matched gts.
    Returns (targets [S, gp, half, half], roi_valid [S])."""
    gs = int(math.isqrt(grid_points))
    half = whole_map // 4 * 2
    subs = calc_sub_regions(grid_points, gs, whole_map)
    fac = _grid_point_factors(grid_points, gs)

    w = pos_boxes[:, 2] - pos_boxes[:, 0]
    h = pos_boxes[:, 3] - pos_boxes[:, 1]
    ex1 = pos_boxes[:, 0] - w / 2
    ey1 = pos_boxes[:, 1] - h / 2
    ew = 2 * w
    eh = 2 * h
    ok = (ew > gs) & (eh > gs)

    outs = []
    for j in range(grid_points):
        fx, fy = fac[j]
        gx = fx * gt_boxes[:, 0] + (1 - fx) * gt_boxes[:, 2]
        gy = fy * gt_boxes[:, 1] + (1 - fy) * gt_boxes[:, 3]
        # int() truncation == floor for the in-box (positive) case
        cx = jnp.floor((gx - ex1) / jnp.maximum(ew, 1e-6) * whole_map)
        cy = jnp.floor((gy - ey1) / jnp.maximum(eh, 1e-6) * whole_map)
        sx, sy = subs[j][0], subs[j][1]
        xs = jnp.arange(half, dtype=jnp.float32) + sx    # whole-map coords
        ys = jnp.arange(half, dtype=jnp.float32) + sy
        d2 = ((xs[None, None, :] - cx[:, None, None]) ** 2
              + (ys[None, :, None] - cy[:, None, None]) ** 2)
        outs.append((d2 <= pos_radius ** 2).astype(jnp.float32))
    return jnp.stack(outs, axis=1), ok


def make_grid_rcnn_train_step(model, cfg, tx) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)

    def _roi_cls(m, feats):
        return m.roi_cls(feats)

    def _grid(m, feats, train):
        return m.grid(feats, train)

    def loss_fn(params, batch_stats, batch: Batch, anchors, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        b = rpn_cls.shape[0]

        k_rpn, k_roi, k_jit = jax.random.split(key, 3)
        t = jax.vmap(functools.partial(_rpn_targets_single, rpn_cfg=cfg.rpn),
                     in_axes=(0, None, 0, 0, 0))(
            jax.random.split(k_rpn, b), anchors,
            batch.anchor_valid, batch.gt_boxes, batch.gt_valid)
        num_total = jnp.maximum(t.num_samples.sum().astype(jnp.float32), 1.0)
        loss_rpn_cls = (binary_cross_entropy_with_logits(
            rpn_cls, t.is_pos.astype(jnp.float32), reduction="none")
            * t.weights).sum() / num_total
        loss_rpn_bbox = (jnp.abs(rpn_reg - t.bbox_targets)
                         * t.is_pos[..., None]).sum() / num_total

        props, _, prop_valid = proposal_fn(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            anchors, batch.img_shapes,
            cfg.rpn.train_nms_pre, cfg.rpn.train_max_per_img)

        smp = jax.vmap(functools.partial(_roi_sample_single, cfg=cfg))(
            jax.random.split(k_roi, b), props, prop_valid,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)

        # ---- cls-only bbox branch
        roi_feats = _extract_rois(cfg, feats, smp.rois)
        cls = model.apply(variables, roi_feats, method=_roi_cls)
        labels = smp.labels.reshape(-1)
        label_w = smp.label_weights.reshape(-1)
        avg_cls = jnp.maximum((label_w > 0).sum().astype(jnp.float32), 1.0)
        loss_cls = (softmax_cross_entropy(cls, labels, reduction="none")
                    * label_w).sum() / avg_cls

        # ---- grid branch on jittered positives
        jit = jax.vmap(_jitter_boxes)(jax.random.split(k_jit, b), smp.rois,
                                      batch.img_shapes)
        matched_gt = jnp.take_along_axis(
            batch.gt_boxes, smp.gt_idx[..., None], axis=1)
        tg, ok = jax.vmap(functools.partial(
            grid_targets, grid_points=cfg.grid_points,
            whole_map=cfg.grid_roi_size * 4,
            pos_radius=cfg.grid_pos_radius))(jit, matched_gt)
        roi_ok = (smp.is_pos & ok).reshape(-1)

        grid_feats = _extract_rois(cfg, feats, jit,
                                   roi_size=cfg.grid_roi_size)
        fused, unfused = model.apply(variables, grid_feats, True,
                                     method=_grid)
        # heads emit NHWC [N, half, half, gp]; targets are [N, gp, h, w]
        tg = tg.reshape((-1,) + tg.shape[2:]).transpose(0, 2, 3, 1)
        per_elem = (binary_cross_entropy_with_logits(
            fused, tg, reduction="none")
            + binary_cross_entropy_with_logits(unfused, tg, reduction="none"))
        denom = jnp.maximum(roi_ok.sum().astype(jnp.float32), 1.0) * float(
            np.prod(tg.shape[1:]))
        loss_grid = cfg.grid_loss_weight * (
            per_elem * roi_ok[:, None, None, None]).sum() / denom

        total = loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_grid
        aux = {"loss": total, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox, "loss_cls": loss_cls,
               "loss_grid": loss_grid,
               "num_pos": smp.is_pos.sum().astype(jnp.float32)}
        return total, aux

    def train_step(state: TrainState, batch: Batch, anchors, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: Batch, key):
        return jfn(state, batch, anchors_arg.get(batch.images), key)

    return step


def make_grid_rcnn_eval_step(model, cfg) -> Callable:
    """Eval: proposals scored by the cls head (boxes ARE the proposals,
    with_reg=False), multiclass NMS, then grid refinement by boundary
    voting (grid_head.get_bboxes)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes
    gp = cfg.grid_points
    gs = int(math.isqrt(gp))
    whole = cfg.grid_roi_size * 4
    half = whole // 4 * 2
    subs = np.asarray(calc_sub_regions(gp, gs, whole), np.float32)

    def _roi_cls(m, feats):
        return m.roi_cls(feats)

    def _grid(m, feats, train):
        return m.grid(feats, train)

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        props, _, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        roi_feats = _extract_rois(cfg, feats, props)
        cls = model.apply(variables, roi_feats, method=_roi_cls)
        b, p = props.shape[:2]
        probs = jax.nn.softmax(cls, axis=-1).reshape(b, p, c + 1)
        fg = probs[..., :c] * prop_valid[..., None]
        orig = props / batch.scale_factors[:, None, :]
        boxes = jnp.broadcast_to(orig[:, :, None, :], (b, p, c, 4))
        dets = batched_multiclass_nms(
            boxes, fg, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

        # grid refinement on the kept detections (image coords: the
        # dets are in ORIGINAL coords; grid feats need network coords)
        det_net = dets.boxes * batch.scale_factors[:, None, :]
        grid_feats = _extract_rois(cfg, feats, det_net,
                                   roi_size=cfg.grid_roi_size)
        heat, _ = model.apply(variables, grid_feats, False, method=_grid)
        n = heat.shape[0]
        hm = jax.nn.sigmoid(heat.transpose(0, 3, 1, 2).reshape(n, gp, -1))
        score = hm.max(axis=-1)                              # [N, gp]
        idx = hm.argmax(axis=-1)
        xs = (idx % half).astype(jnp.float32) + subs[None, :, 0]
        ys = (idx // half).astype(jnp.float32) + subs[None, :, 1]

        db = det_net.reshape(n, 4)
        w = (db[:, 2] - db[:, 0])[:, None]
        h = (db[:, 3] - db[:, 1])[:, None]
        x1e = db[:, 0][:, None] - w / 2
        y1e = db[:, 1][:, None] - h / 2
        abs_x = (xs + 0.5) / half * w + x1e
        abs_y = (ys + 0.5) / half * h + y1e

        x1_i = [i for i in range(gs)]
        y1_i = [i * gs for i in range(gs)]
        x2_i = [gp - gs + i for i in range(gs)]
        y2_i = [(i + 1) * gs - 1 for i in range(gs)]

        def vote(vals, sc, inds):
            s = sc[:, inds]
            return (vals[:, inds] * s).sum(1) / jnp.maximum(s.sum(1), 1e-6)

        nx1 = vote(abs_x, score, x1_i)
        ny1 = vote(abs_y, score, y1_i)
        nx2 = vote(abs_x, score, x2_i)
        ny2 = vote(abs_y, score, y2_i)
        refined = jnp.stack([nx1, ny1, nx2, ny2], axis=1).reshape(b, -1, 4)
        shp = batch.img_shapes[:, None, :].astype(jnp.float32)
        refined = jnp.stack([
            jnp.clip(refined[..., 0], 0, shp[..., 1]),
            jnp.clip(refined[..., 1], 0, shp[..., 0]),
            jnp.clip(refined[..., 2], 0, shp[..., 1]),
            jnp.clip(refined[..., 3], 0, shp[..., 0])], axis=-1)
        refined = refined / batch.scale_factors[:, None, :]
        return dets._replace(boxes=jnp.where(dets.valid[..., None],
                                             refined, dets.boxes))

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
