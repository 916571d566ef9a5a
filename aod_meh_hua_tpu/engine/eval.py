"""Evaluation engine: jitted detection step + host-side VOC mAP.

Behavioral parity targets (reference, /root/reference):
* mmdet/apis/test.py:138-195 (single_gpu_test: eval-mode inference with
  rescale=True) -> Lambda_L2.simple_test else-branch -> get_bboxes with
  NMS -> bbox2result (mmdet/core/bbox/transforms.py:99)
* mmdet/core/evaluation/eval_hooks.py + datasets/voc.py:27 (mAP eval).

The jit region covers forward -> score transform -> topk -> decode ->
rescale -> fixed-shape NMS; only the final [B, max_per_img] detections
cross to the host, where eval_map (utils/voc_eval.py) computes VOC mAP.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import batched_multiclass_nms
from ..utils.config import RetinaNetConfig
from .batch import EvalBatch, prepare_images, ConstArg
from .postprocess import make_candidate_selector


def make_eval_step(model, cfg: RetinaNetConfig, with_uncertainty: bool = False):
    """with_uncertainty: also return the per-DETECTION Shannon entropy of
    each NMS survivor's foreground class distribution — the reference's
    per-det uncertainty that bbox2tupleresult carries into results and
    versatile_imshow_det_bboxes draws as the 6th column
    (core/bbox/transforms.py:118, core/visualization/image.py:260-262;
    producer formula L_anchor_head.py:473-481)."""
    select, anchors_host = make_candidate_selector(cfg)
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bbox_preds, _ = model.apply(variables, images, with_meh=False)
        cand = select(anchors, cls_scores, bbox_preds, None, batch.img_shapes)
        # rescale to original image coordinates before NMS (reference
        # divides batch_mlvl_bboxes by scale_factors, Lambda_L2.py:307-308)
        boxes = cand.boxes / batch.scale_factors[:, None, :]
        # NMS over foreground columns only (multiclass_nms strips BG)
        fg_scores = cand.scores[..., : cfg.num_fg_classes]
        dets = batched_multiclass_nms(
            boxes, fg_scores, t.score_thr, t.nms_iou_thr, t.max_per_img, t.pre_nms_cands
        )
        if not with_uncertainty:
            return dets
        # H(p) over the survivor anchor's FG scores (nms_scores entropy,
        # L_anchor_head.py:478-479), gathered via the NMS keep indices
        p = fg_scores
        h = -(p * jnp.log(jnp.maximum(p, 1e-38))).sum(axis=-1)  # [B, A]
        det_unc = jnp.take_along_axis(h, dets.anchor_idx, axis=1)  # [B, K]
        return dets, jnp.where(dets.valid, det_unc, 0.0)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    # anchors ride as an argument, not a baked constant — see
    # make_candidate_selector's docstring for the TPU-relay rationale
    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step


def detections_to_per_class(dets, num_classes: int, batch_valid=None,
                            unc=None) -> List[List[np.ndarray]]:
    """Device NMSResult -> the reference's bbox2result format:
    per image, per class float32 arrays [k, 5] (x1, y1, x2, y2, score).

    With `unc` ([B, K] per-detection uncertainty from
    make_eval_step(with_uncertainty=True)) the arrays are [k, 6] with
    the uncertainty appended — the bbox2tupleresult format
    (core/bbox/transforms.py:118-124)."""
    boxes = np.asarray(dets.boxes)
    scores = np.asarray(dets.scores)
    labels = np.asarray(dets.labels)
    valid = np.asarray(dets.valid)
    unc = None if unc is None else np.asarray(unc)
    out = []
    for i in range(boxes.shape[0]):
        if batch_valid is not None and not batch_valid[i]:
            continue
        per_cls = []
        for c in range(num_classes):
            m = valid[i] & (labels[i] == c)
            cols = [boxes[i][m], scores[i][m][:, None]]
            if unc is not None:
                cols.append(unc[i][m][:, None])
            per_cls.append(np.concatenate(cols, axis=1).astype(np.float32))
        out.append(per_cls)
    return out


def mask_detections_to_per_class(dets, num_classes: int, batch_valid=None):
    """Device MaskDetections -> the reference's (bbox_results,
    segm_results) pair (mmdet two_stage.py simple_test with masks):
    per image, per class ([k, 5] boxes, [k, s, s] box-aligned sigmoid
    mask probs), rows aligned. Feed the pair to
    utils.coco_eval.eval_coco_map(det_masks=...) for segm mAP."""
    results = detections_to_per_class(dets, num_classes, batch_valid)
    masks = np.asarray(dets.masks)
    labels = np.asarray(dets.labels)
    valid = np.asarray(dets.valid)
    out_masks = []
    row = 0
    for i in range(masks.shape[0]):
        if batch_valid is not None and not batch_valid[i]:
            continue
        per_cls = []
        for c in range(num_classes):
            m = valid[i] & (labels[i] == c)
            per_cls.append(masks[i][m].astype(np.float32))
            assert len(per_cls[-1]) == len(results[row][c])
        out_masks.append(per_cls)
        row += 1
    return results, out_masks
