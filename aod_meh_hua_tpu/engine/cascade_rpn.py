"""Cascade RPN engine — one fused jit step over both refinement stages.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/cascade_rpn_head.py:713 (forward_train:
  stage 0 on region-assigned static anchors, refine_bboxes, anchor
  offsets feeding the stage-1 deform conv, stage 1 on MaxIoU-assigned
  refined anchors), :326 (anchor_offset: center + shape offsets), :530
  (refine_bboxes: per-stage coder decode clipped to the image), :547
  (proposals: per-level top-k, level-grouped NMS iou 0.8).
* configs/cascade_rpn/crpn_r50_caffe_fpn_1x_coco.py — stage 0:
  RegionAssigner(0.2, 0.5), PseudoSampler, no cls, linear IoU loss x10
  on decoded boxes, stds (.1,.1,.5,.5), avg factor A_tot/200 (the
  guided-anchoring constant, cascade_rpn_head.py:477-480); stage 1:
  MaxIoU (.7/.7/.3) + RandomSampler 256, sigmoid BCE + linear IoU x10,
  stds (.05,.05,.1,.1).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import max_iou_assign, region_assign
from ..ops.bbox import delta_decode
from ..ops.losses import binary_cross_entropy_with_logits, iou_loss
from ..ops.nms import grouped_nms
from ..ops.sampler import random_sample_pos_neg
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .rpn_only import ProposalResult
from .train import TrainState

# kernel taps of a 3x3 deform kernel, row-major (dy, dx) — must match
# models/deform.py's _BASE_YX ordering
_TAPS = np.array([(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                 dtype=np.float32)


def anchor_offsets(anchors_flat, bounds, featmap_sizes, strides):
    """Refined anchors [B, A, 4] -> per-level deform-conv offsets
    [B, H, W, 18], (dy, dx) interleaved per tap.

    anchor_offset (cascade_rpn_head.py:326): sampling position k becomes
    anchor_center + tap_k * (anchor_extent / stride / 2), expressed as an
    offset from the regular dilation-1 grid."""
    outs = []
    for (s0, s1), (h, w), stride in zip(bounds, featmap_sizes, strides):
        a = anchors_flat[:, s0:s1].reshape(-1, h, w, 4)
        cx = (a[..., 0] + a[..., 2]) * 0.5 / stride
        cy = (a[..., 1] + a[..., 3]) * 0.5 / stride
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        c_off_x = cx - gx
        c_off_y = cy - gy
        s_off_x = (a[..., 2] - a[..., 0]) / stride / 2.0 - 1.0
        s_off_y = (a[..., 3] - a[..., 1]) / stride / 2.0 - 1.0
        off_y = (s_off_y[..., None] * _TAPS[None, None, None, :, 0]
                 + c_off_y[..., None])                       # [B, H, W, 9]
        off_x = (s_off_x[..., None] * _TAPS[None, None, None, :, 1]
                 + c_off_x[..., None])
        outs.append(jnp.stack([off_y, off_x], axis=-1).reshape(
            off_y.shape[:3] + (18,)))
    return outs


def _anchor_tables(cfg):
    """Static per-anchor host tables for the region assigner."""
    gen = cfg.build_anchor_generator()
    sizes = cfg.featmap_sizes()
    anchors = np.concatenate(gen.grid_anchors(sizes)).astype(np.float32)
    lvl_ids, strides, feat_wh = [], [], []
    for li, ((h, w), s) in enumerate(zip(sizes, cfg.rpn.anchor_strides)):
        n = h * w
        lvl_ids.append(np.full(n, li, np.int32))
        strides.append(np.full(n, s, np.float32))
        feat_wh.append(np.tile([[w, h]], (n, 1)).astype(np.float32))
    return (anchors, np.concatenate(lvl_ids), np.concatenate(strides),
            np.concatenate(feat_wh))


class _Stage1Targets(NamedTuple):
    is_pos: jnp.ndarray    # [A] bool
    weights: jnp.ndarray   # [A] float (sampled pos+neg)
    gt_box: jnp.ndarray    # [A, 4] matched gt (pos rows)
    num_samples: jnp.ndarray


def _stage1_targets_single(key, anchors, anchor_valid, gt_boxes, gt_valid,
                           rpn_cfg):
    assigned = max_iou_assign(
        anchors, gt_boxes, gt_valid, anchor_valid=anchor_valid,
        pos_iou_thr=rpn_cfg.pos_iou_thr, neg_iou_thr=rpn_cfg.neg_iou_thr,
        min_pos_iou=rpn_cfg.min_pos_iou, gt_max_assign_all=True)
    s = random_sample_pos_neg(key, assigned, anchor_valid,
                              rpn_cfg.sampler_num, rpn_cfg.pos_fraction)
    a = anchors.shape[0]
    w = jnp.zeros((a,), jnp.float32).at[s.inds].add(
        jnp.where(s.valid, 1.0, 0.0))
    pos = jnp.zeros((a,), jnp.int32).at[s.inds].add(
        jnp.where(s.is_pos & s.valid, 1, 0)) > 0
    gt_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
    return _Stage1Targets(pos, w, gt_boxes[gt_idx],
                          s.valid.sum().astype(jnp.int32))


def make_crpn_train_step(model, cfg, tx) -> Callable:
    anchors_host, lvl_host, stride_host, featwh_host = _anchor_tables(cfg)
    bounds = cfg.level_bounds()
    sizes = cfg.featmap_sizes()
    num_lvls = len(sizes)

    def loss_fn(params, batch_stats, batch: Batch, anchors, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats = model.apply(variables, images,
                            method=lambda m, im: m.features(im))
        bridged, reg0 = model.apply(variables, feats,
                                    method=lambda m, f: m.stage0(f))
        b, a_tot = reg0.shape[:2]

        # ---- stage 0: region-assigned IoU regression on static anchors
        assigned0 = jax.vmap(functools.partial(
            region_assign, anchors, level_ids=jnp.asarray(lvl_host),
            anchor_strides=jnp.asarray(stride_host),
            feat_wh=jnp.asarray(featwh_host),
            anchor_scale=float(cfg.rpn.anchor_scale),
            base_stride=float(cfg.rpn.anchor_strides[0]),
            num_lvls=num_lvls, center_ratio=cfg.center_ratio,
            ignore_ratio=cfg.ignore_ratio),
            in_axes=(0, 0, 0))(batch.gt_boxes, batch.gt_valid,
                               batch.anchor_valid)
        pos0 = assigned0 > 0
        gt_idx0 = jnp.clip(assigned0 - 1, 0, batch.gt_boxes.shape[1] - 1)
        gt0 = jnp.take_along_axis(batch.gt_boxes,
                                  gt_idx0[..., None], axis=1)
        boxes0 = delta_decode(anchors[None], reg0, stds=cfg.s0_stds)
        avg0 = b * a_tot / 200.0
        loss_s0 = (iou_loss(boxes0.reshape(-1, 4), gt0.reshape(-1, 4),
                            linear=True, reduction="none")
                   * pos0.reshape(-1)).sum() / avg0 * 10.0

        # ---- refine anchors, compute deform offsets
        anchors1 = delta_decode(anchors[None], reg0, stds=cfg.s0_stds,
                                max_shape=batch.img_shapes[:, None, :])
        anchors1 = jax.lax.stop_gradient(anchors1)
        offsets = anchor_offsets(anchors1, bounds, sizes,
                                 cfg.rpn.anchor_strides)

        # ---- stage 1: MaxIoU + sampled BCE/IoU on refined anchors
        cls1, reg1 = model.apply(variables, bridged, offsets,
                                 method=lambda m, f, o: m.stage1(f, o))
        t = jax.vmap(functools.partial(_stage1_targets_single,
                                       rpn_cfg=cfg.rpn),
                     in_axes=(0, 0, 0, 0, 0))(
            jax.random.split(key, b), anchors1,
            batch.anchor_valid, batch.gt_boxes, batch.gt_valid)
        num_total = jnp.maximum(t.num_samples.sum().astype(jnp.float32), 1.0)
        loss_cls = (binary_cross_entropy_with_logits(
            cls1, t.is_pos.astype(jnp.float32), reduction="none")
            * t.weights).sum() / num_total
        boxes1 = delta_decode(anchors1, reg1, stds=cfg.s1_stds)
        loss_s1 = (iou_loss(boxes1.reshape(-1, 4), t.gt_box.reshape(-1, 4),
                            linear=True, reduction="none")
                   * t.is_pos.reshape(-1)).sum() / num_total * 10.0

        total = loss_s0 + loss_cls + loss_s1
        aux = {"loss": total, "loss_s0_reg": loss_s0,
               "loss_s1_cls": loss_cls, "loss_s1_reg": loss_s1,
               "num_pos": t.is_pos.sum().astype(jnp.float32)}
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


def make_crpn_eval_step(model, cfg) -> Callable:
    """step(variables, batch: EvalBatch) -> ProposalResult (proposals as
    single-class detections, the rpn.py simple_test contract)."""
    anchors_host = _anchor_tables(cfg)[0]
    bounds = cfg.level_bounds()
    sizes = cfg.featmap_sizes()
    nms_pre = cfg.rpn.test_nms_pre
    max_out = cfg.rpn.test_max_per_img

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats = model.apply(variables, images,
                            method=lambda m, im: m.features(im))
        bridged, reg0 = model.apply(variables, feats,
                                    method=lambda m, f: m.stage0(f))
        anchors1 = delta_decode(anchors[None], reg0, stds=cfg.s0_stds,
                                max_shape=batch.img_shapes[:, None, :])
        offsets = anchor_offsets(anchors1, bounds, sizes,
                                 cfg.rpn.anchor_strides)
        cls1, reg1 = model.apply(variables, bridged, offsets,
                                 method=lambda m, f, o: m.stage1(f, o))

        scs, bxs, lvls = [], [], []
        for li, (s0, s1) in enumerate(bounds):
            sc = jax.nn.sigmoid(cls1[:, s0:s1])
            reg = reg1[:, s0:s1]
            anc = anchors1[:, s0:s1]
            n = s1 - s0
            if n > nms_pre:
                sc, idx = jax.lax.top_k(sc, nms_pre)
                reg = jnp.take_along_axis(reg, idx[..., None], axis=1)
                anc = jnp.take_along_axis(anc, idx[..., None], axis=1)
                n = nms_pre
            boxes = delta_decode(anc, reg, stds=cfg.s1_stds,
                                 max_shape=batch.img_shapes[:, None, :])
            scs.append(sc)
            bxs.append(boxes)
            lvls.append(jnp.full((n,), li, jnp.int32))
        scores = jnp.concatenate(scs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1)
        lvl = jnp.broadcast_to(jnp.concatenate(lvls)[None], scores.shape)
        ok = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
        dets = jax.vmap(functools.partial(
            grouped_nms, iou_thr=cfg.rpn.nms_iou_thr, max_out=max_out))(
            boxes, scores, lvl, ok)
        out_boxes = dets.boxes / batch.scale_factors[:, None, :]
        labels = jnp.zeros(dets.scores.shape, jnp.int32)
        idx = jnp.broadcast_to(
            jnp.arange(dets.scores.shape[1], dtype=jnp.int32)[None],
            dets.scores.shape)
        return ProposalResult(out_boxes, dets.scores, labels, dets.valid, idx)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
