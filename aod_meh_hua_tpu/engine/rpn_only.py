"""RPN-only and Fast R-CNN engines — the two detachable halves of the
two-stage pipeline, each a fused jit step.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/detectors/rpn.py forward_train (:59): the RPN loss alone,
  gt labels discarded (class-agnostic); simple_test (:87) returns the
  proposal boxes+scores as the detection output. Evaluated with
  fast_eval_recall (mmdet/datasets/coco.py:418: IoU-thresholded recall
  of top-k proposals).
* mmdet/models/detectors/fast_rcnn.py + roi_heads/standard_roi_head.py:
  the RoI criterion on EXTERNALLY supplied proposals (the reference's
  proposal .pkl files -> `ProposalBatch.proposals` here), and the
  standard softmax + delta-decode + NMS eval given eval proposals.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.bbox import bbox_overlaps, delta_decode
from ..ops.losses import binary_cross_entropy_with_logits, softmax_cross_entropy
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState
from .two_stage import (_extract_rois, _roi, _roi_sample_single,
                        _rpn_targets_single, _stage1, make_proposal_fn)


# ---------------- RPN-only ----------------

def make_rpn_train_step(model, cfg, tx) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)

    def loss_fn(params, batch_stats, batch: Batch, anchors, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        rpn_cls, rpn_reg = model.apply(variables, images)
        b = rpn_cls.shape[0]
        t = jax.vmap(functools.partial(_rpn_targets_single, rpn_cfg=cfg.rpn),
                     in_axes=(0, None, 0, 0, 0))(
            jax.random.split(key, b), anchors,
            batch.anchor_valid, batch.gt_boxes, batch.gt_valid)
        num_total = jnp.maximum(t.num_samples.sum().astype(jnp.float32), 1.0)
        loss_cls = (binary_cross_entropy_with_logits(
            rpn_cls, t.is_pos.astype(jnp.float32), reduction="none")
            * t.weights).sum() / num_total
        loss_bbox = (jnp.abs(rpn_reg - t.bbox_targets)
                     * t.is_pos[..., None]).sum() / num_total
        total = loss_cls + loss_bbox
        aux = {"loss": total, "loss_rpn_cls": loss_cls,
               "loss_rpn_bbox": loss_bbox,
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


class ProposalResult(NamedTuple):
    """Proposals-as-detections (rpn.py simple_test): one foreground
    class, label 0 everywhere."""

    boxes: jnp.ndarray
    scores: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray
    anchor_idx: jnp.ndarray


def make_rpn_eval_step(model, cfg) -> Callable:
    """step(variables, batch: EvalBatch) -> ProposalResult (the
    inference-API detections contract with num_fg_classes=1)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        rpn_cls, rpn_reg = model.apply(variables, images)
        boxes, scores, valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        boxes = boxes / batch.scale_factors[:, None, :]
        labels = jnp.zeros(scores.shape, jnp.int32)
        idx = jnp.broadcast_to(
            jnp.arange(scores.shape[1], dtype=jnp.int32)[None], scores.shape)
        return ProposalResult(boxes, scores, labels, valid, idx)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step


def proposal_recall(prop_boxes, prop_valid, gt_boxes_list,
                    iou_thr: float = 0.5, top_k: int = 100) -> float:
    """AR@top_k (fast_eval_recall semantics): fraction of gts whose best
    IoU against the image's top-k proposals exceeds iou_thr. Host-side
    numpy; proposals arrive score-sorted from the eval step."""
    hit = total = 0
    for i, gts in enumerate(gt_boxes_list):
        if len(gts) == 0:
            continue
        boxes = np.asarray(prop_boxes[i])[np.asarray(prop_valid[i])][:top_k]
        total += len(gts)
        if len(boxes) == 0:
            continue
        ious = np.asarray(bbox_overlaps(jnp.asarray(gts, jnp.float32),
                                        jnp.asarray(boxes, jnp.float32)))
        hit += int((ious.max(axis=1) > iou_thr).sum())
    return hit / max(total, 1)


# ---------------- Fast R-CNN ----------------

class ProposalBatch(NamedTuple):
    """Batch + externally supplied proposals (the reference's
    proposal_file path, datasets/custom.py proposals)."""

    images: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_labels: jnp.ndarray
    gt_valid: jnp.ndarray
    img_shapes: jnp.ndarray
    proposals: jnp.ndarray   # [B, P, 4] canvas coords
    prop_valid: jnp.ndarray  # [B, P] bool


def make_fast_rcnn_train_step(model, cfg, tx) -> Callable:
    def loss_fn(params, batch_stats, batch: ProposalBatch, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats = model.apply(variables, images, method=lambda m, im: m.features(im))
        b = images.shape[0]
        smp = jax.vmap(functools.partial(_roi_sample_single, cfg=cfg))(
            jax.random.split(key, b), batch.proposals, batch.prop_valid,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        roi_feats = _extract_rois(cfg, feats, smp.rois)
        cls, reg = model.apply(variables, roi_feats, method=_roi)

        labels = smp.labels.reshape(-1)
        label_w = smp.label_weights.reshape(-1)
        avg_cls = jnp.maximum((label_w > 0).sum().astype(jnp.float32), 1.0)
        loss_cls = (softmax_cross_entropy(cls, labels, reduction="none")
                    * label_w).sum() / avg_cls
        sel = jnp.clip(labels, 0, cfg.num_classes - 1)
        reg_sel = jnp.take_along_axis(
            reg, jnp.repeat(sel[:, None, None], 4, axis=-1), axis=1)[:, 0]
        pos = smp.is_pos.reshape(-1)
        avg_reg = jnp.maximum(smp.valid.sum().astype(jnp.float32), 1.0)
        loss_bbox = (jnp.abs(reg_sel - smp.bbox_targets.reshape(-1, 4))
                     * pos[:, None]).sum() / avg_reg
        total = loss_cls + loss_bbox
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "num_pos": pos.sum().astype(jnp.float32)}
        return total, aux

    def train_step(state: TrainState, batch: ProposalBatch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))

    def step(state: TrainState, batch: ProposalBatch, key):
        return jfn(state, batch, key)

    return step


def make_fast_rcnn_eval_step(model, cfg) -> Callable:
    """step(variables, batch: EvalBatch, proposals [B, P, 4],
    prop_valid [B, P]) -> NMSResult. Proposals are CANVAS coordinates."""
    t = cfg.test
    c = cfg.num_classes

    def eval_step(variables, batch: EvalBatch, proposals, prop_valid):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats = model.apply(variables, images, method=lambda m, im: m.features(im))
        roi_feats = _extract_rois(cfg, feats, proposals)
        cls, reg = model.apply(variables, roi_feats, method=_roi)
        b, p = proposals.shape[:2]
        probs = jax.nn.softmax(cls, axis=-1).reshape(b, p, c + 1)
        boxes = delta_decode(
            proposals[:, :, None, :], reg.reshape(b, p, c, 4),
            stds=cfg.rcnn.target_stds, max_shape=batch.img_shapes[:, None, :])
        boxes = boxes / batch.scale_factors[:, None, None, :]
        fg = probs[..., :c] * prop_valid[..., None]
        return batched_multiclass_nms(
            boxes, fg, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

    return jax.jit(eval_step)
