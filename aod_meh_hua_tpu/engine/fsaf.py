"""FSAF engine: fused train step and eval step (one jit region each).

Behavioral parity targets (reference, /root/reference):
* mmdet/core/bbox/assigners/center_region_assigner.py: a pixel is
  positive for a gt when its center lies strictly inside the gt AND its
  anchor box overlaps the gt's 0.2-scaled core region with IoF >
  min_pos_iof (0.01); overlapping gts resolve to the SMALLEST area;
  pixels in a gt's 0.2-scaled shadow region (or core-matched to a
  non-winning gt) have that gt's CLASS CHANNEL ignored in the cls loss
  ("shadowed_labels"); a pixel whose own assigned label is also shadowed
  is demoted to background (foreground_dominate=False branch,
  center_region_assigner.py:236-244).
* mmdet/models/dense_heads/fsaf_head.py loss(): elementwise focal cls
  loss + elementwise -log(IoU) reg loss on TBLR-decoded boxes
  (reg_decoded_bbox=True, IoULoss eps 1e-6, preds clamped min 1e-4);
  ONLINE FEATURE SELECTION — per gt, the mean (cls+reg) loss of its
  assigned pixels is collected per FPN level under no_grad
  (collect_loss_level_single, missing levels get 1e6), the argmin level
  wins, and positives of that gt at every other level are zeroed (reg
  weight 0, cls weight 0 at the gt's label channel only,
  reweight_loss_single); avg_factor = num final positives (or
  num_negatives when zero).
* fsaf_head.py _get_targets_single: TBLR targets vs the single
  stride-sized square anchor per cell (TBLRBBoxCoder normalizer 4.0).

TPU redesign: the assigner's sort/nonzero/scatter bookkeeping becomes
dense [A, G] masks; the per-(gt, level) loss means are two [A, G] x
[A, L] MXU contractions; level selection is a gather — the whole
pipeline (targets + selection + reweight) lives inside the one jitted
train step, no host round-trip.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.bbox import bbox_area, bbox_overlaps, tblr_decode
from ..ops.losses import _aligned_iou_terms, sigmoid_focal_loss_elementwise
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState


def _scale_boxes(boxes: jnp.ndarray, scale: float) -> jnp.ndarray:
    """center_region_assigner.py:9 scale_boxes."""
    c = (boxes[..., :2] + boxes[..., 2:]) * 0.5
    half = (boxes[..., 2:] - boxes[..., :2]) * (0.5 * scale)
    return jnp.concatenate([c - half, c + half], axis=-1)


def _center_region_assign(anchors, anchor_valid, gt_boxes, gt_labels,
                          gt_valid, cfg):
    """Dense CenterRegionAssigner for one image.

    Returns (best [A] int32 gt index, matched [A] bool, labels [A] int32
    with background=C, cls_w [A, C] float channel weights)."""
    num_classes = cfg.num_classes
    G = gt_boxes.shape[0]
    centers = (anchors[:, :2] + anchors[:, 2:]) * 0.5

    in_gt = ((centers[:, 0:1] > gt_boxes[None, :, 0])
             & (centers[:, 0:1] < gt_boxes[None, :, 2])
             & (centers[:, 1:2] > gt_boxes[None, :, 1])
             & (centers[:, 1:2] < gt_boxes[None, :, 3]))  # [A, G]
    core_box = _scale_boxes(gt_boxes, cfg.pos_scale)
    shadow_box = _scale_boxes(gt_boxes, cfg.neg_scale)
    iof_core = bbox_overlaps(anchors, core_box, mode="iof")
    iof_shadow = bbox_overlaps(anchors, shadow_box, mode="iof")

    core = (in_gt & (iof_core > cfg.min_pos_iof)
            & gt_valid[None, :] & anchor_valid[:, None])
    shadow = (iof_shadow > cfg.min_pos_iof) & gt_valid[None, :] & ~core

    # Smaller-area gt wins conflicts; ties break to the LATER gt index
    # (descending stable area sort then argsort, assigner
    # get_gt_priorities) — replicate with a lexicographic key.
    areas = jnp.where(gt_valid, bbox_area(gt_boxes), jnp.inf)
    order = jnp.argsort(-areas, stable=True)          # descending area
    priority = jnp.argsort(order)                     # rank: larger = smaller area
    pri = jnp.where(core, priority[None, :], -1)
    best = jnp.argmax(pri, axis=1).astype(jnp.int32)  # [A]
    matched = core.any(axis=1)

    # shadowed (pixel, gt) pairs: the 0.2-0.2 shadow ring plus
    # core-matched-but-not-winning pairs
    not_best = core & (jnp.arange(G)[None, :] != best[:, None])
    shadow2 = shadow | not_best
    # shadowed channel mask via one MXU contraction (no [A, G, C] cube)
    onehot_g = jax.nn.one_hot(gt_labels, num_classes, dtype=jnp.float32)
    shadow_ch = (shadow2.astype(jnp.float32) @ onehot_g) > 0.0  # [A, C]

    labels = jnp.where(matched, gt_labels[best], num_classes).astype(jnp.int32)
    # a pixel both positive and shadowed AT ITS OWN LABEL -> background
    own = jnp.take_along_axis(
        shadow_ch, jnp.clip(labels, 0, num_classes - 1)[:, None], axis=1)[:, 0]
    demote = matched & own
    matched = matched & ~demote
    labels = jnp.where(matched, labels, num_classes)

    cls_w = jnp.where(shadow_ch, 0.0, 1.0) * anchor_valid[:, None]
    return best, matched, labels, cls_w


def make_fsaf_loss_fn(model, cfg):
    gen = cfg.build_anchor_generator()
    per_level = gen.grid_anchors(cfg.featmap_sizes())
    anchors_host = np.concatenate(per_level).astype(np.float32)
    L = len(per_level)
    level_onehot_host = np.zeros((anchors_host.shape[0], L), np.float32)
    off = 0
    for i, a in enumerate(per_level):
        level_onehot_host[off:off + len(a), i] = 1.0
        off += len(a)
    targets_fn = jax.vmap(functools.partial(_center_region_assign, cfg=cfg),
                          in_axes=(None, 0, 0, 0, 0))

    def loss_fn(params, batch_stats, batch: Batch, anchors, level_onehot):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, tblr = model.apply(variables, images)     # [B,A,C], [B,A,4]
        best, matched, labels, cls_w = targets_fn(
            anchors, batch.anchor_valid, batch.gt_boxes, batch.gt_labels,
            batch.gt_valid)
        B, A = matched.shape
        G = batch.gt_boxes.shape[1]

        cls_elem = sigmoid_focal_loss_elementwise(
            cls_scores, labels, gamma=cfg.focal_gamma,
            alpha=cfg.focal_alpha) * cls_w                     # [B,A,C]

        # -log(IoU) on TBLR-decoded boxes vs the assigned gt
        decoded = tblr_decode(anchors[None],
                              jnp.maximum(tblr, 1e-4),        # loss() clamp
                              normalizer=cfg.tblr_normalizer)
        gt_of = jnp.take_along_axis(batch.gt_boxes, best[..., None], axis=1)
        ious, _, _ = _aligned_iou_terms(decoded, gt_of, 1e-6)
        reg_elem = -jnp.log(jnp.clip(ious, 1e-6, None)) * matched  # [B,A]

        # --- online feature selection (no_grad in the reference) ---
        loss_a = jax.lax.stop_gradient(cls_elem.sum(-1) + reg_elem)  # [B,A]
        member = (jax.nn.one_hot(best, G, dtype=jnp.float32)
                  * matched[..., None])                       # [B,A,G]
        cnt = jnp.einsum("bag,al->bgl", member, level_onehot)
        tot = jnp.einsum("bag,al->bgl", member * loss_a[..., None],
                         level_onehot)
        mean_gl = jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1.0), 1e6)
        min_level = jnp.argmin(mean_gl, axis=-1)              # [B,G]
        level_id = jnp.argmax(level_onehot, axis=-1)          # [A]
        best_level = jnp.take_along_axis(min_level, best, axis=1)  # [B,A]
        keep = matched & (best_level == level_id[None, :])

        # zero dropped positives: reg entirely, cls at their label channel
        drop = matched & ~keep
        onehot_lbl = jax.nn.one_hot(labels, cfg.num_classes,
                                    dtype=jnp.float32)        # bg row = 0
        cls_final = cls_elem * (1.0 - drop[..., None] * onehot_lbl)

        num_pos = keep.sum().astype(jnp.float32)
        num_neg = (~matched & batch.anchor_valid).sum().astype(jnp.float32)
        avg = jnp.where(num_pos > 0, num_pos, num_pos + num_neg)
        loss_cls = cls_final.sum() / avg
        loss_bbox = (reg_elem * keep).sum() / avg
        total = loss_cls + loss_bbox
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "num_pos": num_pos}
        return total, aux

    return loss_fn, anchors_host, level_onehot_host


def make_fsaf_train_step(model, cfg, tx) -> Callable:
    loss_fn, anchors_host, level_onehot_host = make_fsaf_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, anchors, level_onehot):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, level_onehot)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)
    lvl_arg = ConstArg(level_onehot_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, anchors_arg.get(batch.images),
                   lvl_arg.get(batch.images))

    return step


def make_fsaf_eval_step(model, cfg) -> Callable:
    """Retina-style per-level top-k + TBLR decode + multiclass NMS
    (FSAFHead inherits RetinaHead.get_bboxes with the TBLR coder)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    bounds = cfg.level_bounds()
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, tblr = model.apply(variables, images)
        probs = jax.nn.sigmoid(cls_scores)
        scs, bxs = [], []
        for (s0, s1) in bounds:
            sc = probs[:, s0:s1]
            d = tblr[:, s0:s1]
            anc = anchors[s0:s1]
            n = s1 - s0
            if n > t.nms_pre:
                mx = sc.max(axis=-1)
                _, idx = jax.lax.top_k(mx, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                d = jnp.take_along_axis(d, idx[..., None], axis=1)
                anc = anc[idx]
            else:
                anc = jnp.broadcast_to(anc[None], (sc.shape[0],) + anc.shape)
            boxes = tblr_decode(anc, d, normalizer=cfg.tblr_normalizer,
                                max_shape=batch.img_shapes[:, None, :])
            scs.append(sc)
            bxs.append(boxes)
        scores = jnp.concatenate(scs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1) / batch.scale_factors[:, None, :]
        return batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
