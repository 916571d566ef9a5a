"""Test-time augmentation: multi-scale + flip inference with merged NMS.

Behavioral parity target (reference, /root/reference):
* mmdet/datasets/pipelines/test_time_aug.py:10 (MultiScaleFlipAug — one
  pipeline replay per (scale, flip)),
* mmdet/models/dense_heads/dense_test_mixins.py:71-143 (aug_test_bboxes:
  per aug get_bboxes(with_nms=False) candidates -> bbox_mapping_back
  (undo flip in the aug image frame, then divide by scale_factor) ->
  concat across augs -> ONE multiclass_nms),
* mmdet/models/detectors/single_stage.py:81 (aug_test entry).

TPU-native shape discipline: each (scale, orientation) pair is its own
fixed-canvas jitted candidate program (flip rides as a traced batch
input — no extra compile for flipped augs); the merge is one jitted
batched NMS over the fixed-size concatenation. Deviation (documented):
the merged set is pre-filtered to the top `test.pre_nms_cands` by max
class score before the quadratic NMS — the same fixed-shape cap the
single-aug eval path applies.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.nms import batched_multiclass_nms
from .batch import ConstArg, EvalBatch, prepare_images
from .postprocess import make_candidate_selector


def make_tta_candidate_step(model, cfg):
    """One aug's candidates, mapped back to ORIGINAL image coordinates.

    Returned step: (variables, batch: EvalBatch, flipped [B] bool) ->
    (boxes [B, K, 4] original coords, scores [B, K, C_fg]).
    """
    select, anchors_host = make_candidate_selector(cfg)

    def cand_step(variables, batch: EvalBatch, flipped, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bbox_preds, _ = model.apply(variables, images, with_meh=False)
        cand = select(anchors, cls_scores, bbox_preds, None, batch.img_shapes)
        boxes = cand.boxes
        # bbox_mapping_back (reference core/bbox/transforms.py): undo the
        # horizontal flip in the AUG image frame (width = resized width),
        # then rescale to original coordinates.
        w = batch.img_shapes[:, 1].astype(boxes.dtype)[:, None]
        fb = jnp.stack(
            [w - boxes[..., 2], boxes[..., 1], w - boxes[..., 0], boxes[..., 3]],
            axis=-1,
        )
        boxes = jnp.where(flipped[:, None, None], fb, boxes)
        boxes = boxes / batch.scale_factors[:, None, :]
        return boxes, cand.scores[..., : cfg.num_fg_classes]

    jfn = jax.jit(cand_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch, flipped):
        return jfn(variables, batch, flipped, anchors_arg.get(batch.images))

    return step


def make_tta_merge_step(cfg):
    """Merged NMS over the aug-concatenated candidate set
    (dense_test_mixins.py:121-131): boxes [B, A*K, 4], scores
    [B, A*K, C_fg] -> NMSResult in original image coordinates."""
    t = cfg.test

    @jax.jit
    def merge(boxes: jnp.ndarray, scores: jnp.ndarray):
        return batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img,
            min(boxes.shape[1], t.pre_nms_cands),
            getattr(t, "fast_topk", False),
        )

    return merge


def _flip_x(boxes: jnp.ndarray, flipped: jnp.ndarray, width: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip of [..., 4] boxes where flipped[b] (the mapping is
    its own inverse). width: [B] image width in the boxes' frame."""
    w = width.astype(boxes.dtype).reshape((-1,) + (1,) * (boxes.ndim - 2))
    fb = jnp.stack([w - boxes[..., 2], boxes[..., 1],
                    w - boxes[..., 0], boxes[..., 3]], axis=-1)
    cond = flipped.reshape((-1,) + (1,) * (boxes.ndim - 1))
    return jnp.where(cond, fb, boxes)


def make_tta_rpn_step(model, cfg):
    """Two-stage TTA stage 1 (aug_test_rpn half): one aug's RPN proposals
    mapped back to ORIGINAL coordinates, plus the backbone features for
    reuse by the RoI stage (the reference extracts feats once per aug,
    two_stage.py:184-199).

    step(variables, batch, flipped) -> (feats, props [B, P, 4] original
    coords, scores [B, P], prop_valid [B, P])."""
    from .two_stage import _stage1, make_proposal_fn

    import numpy as np

    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)

    def fn(variables, batch: EvalBatch, flipped, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images, method=_stage1)
        props, scores, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        props = _flip_x(props, flipped, batch.img_shapes[:, 1])
        props = props / batch.scale_factors[:, None, :]
        return feats, props, scores, prop_valid

    jfn = jax.jit(fn)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch, flipped):
        return jfn(variables, batch, flipped, anchors_arg.get(batch.images))

    return step


def make_tta_proposal_merge(cfg):
    """merge_aug_proposals (core/post_processing/merge_augs.py:14): NMS
    the aug-concatenated proposals in original coordinates, keep the RPN
    test budget. boxes [B, A*P, 4], scores/valid [B, A*P]."""

    @jax.jit
    def merge(boxes, scores, valid):
        s = (scores * valid)[..., None]  # class-agnostic: C = 1
        res = batched_multiclass_nms(
            boxes, s, 0.0, cfg.rpn.nms_iou_thr, cfg.rpn.test_max_per_img,
            min(boxes.shape[1], cfg.rpn.test_nms_pre))
        return res.boxes, res.valid

    return merge


def make_tta_roi_step(model, cfg):
    """Two-stage TTA stage 2 (test_mixins.py:116-143 aug_test_bboxes
    body): map the MERGED original-coord proposals into this aug's
    frame (bbox_mapping = scale then flip), run the RoI head on the
    aug's features, decode, and map the per-class boxes back to
    original coordinates. No NMS here — the caller averages across
    augs first.

    step(variables, feats, batch, flipped, props_orig, prop_valid) ->
    (boxes [B, P, C, 4] original coords, probs [B, P, C+1])."""
    from ..ops.bbox import delta_decode
    from .two_stage import _extract_rois, _roi

    c = cfg.num_classes

    def fn(variables, feats, batch: EvalBatch, flipped, props_orig, prop_valid):
        props = props_orig * batch.scale_factors[:, None, :]
        props = _flip_x(props, flipped, batch.img_shapes[:, 1])
        roi_feats = _extract_rois(cfg, feats, props)
        cls, reg = model.apply(variables, roi_feats, method=_roi)
        b, p = props.shape[:2]
        probs = jax.nn.softmax(cls, axis=-1).reshape(b, p, c + 1)
        boxes = delta_decode(
            props[:, :, None, :], reg.reshape(b, p, c, 4),
            stds=cfg.rcnn.target_stds, max_shape=batch.img_shapes[:, None, :])
        boxes = _flip_x(boxes, flipped, batch.img_shapes[:, 1])
        boxes = boxes / batch.scale_factors[:, None, None, :]
        return boxes, probs

    return jax.jit(fn)


def make_tta_two_stage_merge(cfg):
    """merge_aug_bboxes (core/post_processing/merge_augs.py:83) + final
    multiclass NMS: MEAN the per-aug recovered boxes/scores over the
    shared proposal set, then one NMS. boxes [A, B, P, C, 4],
    probs [A, B, P, C+1], prop_valid [B, P]."""
    t = cfg.test
    c = cfg.num_classes

    @jax.jit
    def merge(boxes, probs, prop_valid):
        fg = probs.mean(axis=0)[..., :c] * prop_valid[..., None]
        return batched_multiclass_nms(
            boxes.mean(axis=0), fg, t.score_thr, t.nms_iou_thr,
            t.max_per_img, min(fg.shape[1], t.pre_nms_cands))

    return merge


def _cascade_fusion(model, cfg, variables, feats, family: str):
    """The per-family RoI-feature fusion closure for the cascade TTA
    steps: HTC adds the semantic branch (htc_roi_head.py), SCNet adds
    semantic + broadcast global context (scnet_roi_head.py:465-485)."""
    if family == "cascade":
        return lambda roi_feats, rois, size: roi_feats
    from .htc import _sem_roi

    _, sem_feat = model.apply(variables, feats,
                              method=lambda m, f: m.semantic(f))
    if family == "htc":
        return lambda roi_feats, rois, size: (
            roi_feats + _sem_roi(sem_feat, rois, size))
    assert family == "scnet", family
    _, glb = model.apply(variables, feats,
                         method=lambda m, f: m.glbctx(f))

    def fuse(roi_feats, rois, size):
        roi_feats = roi_feats + _sem_roi(sem_feat, rois, size)
        g = jnp.repeat(glb, rois.shape[1], axis=0)
        return roi_feats + g[:, None, None, :].astype(roi_feats.dtype)

    return fuse


def make_tta_cascade_roi_step(model, cfg, family: str = "cascade"):
    """Cascade TTA stage 2 (reference cascade_roi_head.py:420-459
    aug_test body; htc_roi_head.py:461 / scnet_roi_head.py:450 share
    the flow): map the MERGED original-coord proposals into this aug's
    frame, run EVERY cascade stage with in-loop refinement
    (regress_by_class, class-agnostic), average the per-stage raw
    logits and softmax once (ms_scores sum / get_bboxes), and map the
    final refined boxes back to original coordinates. `family` selects
    the per-stage RoI fusion: htc = semantic branch, scnet = semantic +
    global context (the SCNet roi head also returns the shared feats,
    unused here).

    step(variables, feats, batch, flipped, props_orig, prop_valid) ->
    (boxes [B, P, 4] original coords (class-agnostic), probs [B, P, C+1])."""
    from ..ops.bbox import delta_decode
    from .two_stage import _extract_rois, _roi_stage

    c = cfg.num_classes

    def _roi_scnet(m, f, s):
        return m.roi_forward(f, s)

    def fn(variables, feats, batch: EvalBatch, flipped, props_orig, prop_valid):
        props = props_orig * batch.scale_factors[:, None, :]
        props = _flip_x(props, flipped, batch.img_shapes[:, 1])
        b, p = props.shape[:2]
        fuse = _cascade_fusion(model, cfg, variables, feats, family)
        logits_sum = None
        for stage in range(cfg.num_stages):
            roi_feats = _extract_rois(cfg, feats, props)
            roi_feats = fuse(roi_feats, props, cfg.rcnn.roi_size)
            if family == "scnet":
                cls, reg, _ = model.apply(variables, roi_feats, stage,
                                          method=_roi_scnet)
            else:
                cls, reg = model.apply(variables, roi_feats, stage,
                                       method=_roi_stage)
            logits_sum = cls if logits_sum is None else logits_sum + cls
            props = delta_decode(props, reg[:, 0].reshape(b, p, 4),
                                 stds=cfg.stage_stds[stage],
                                 max_shape=batch.img_shapes[:, None, :])
        probs = jax.nn.softmax(logits_sum / cfg.num_stages, axis=-1)
        probs = probs.reshape(b, p, c + 1)
        boxes = _flip_x(props, flipped, batch.img_shapes[:, 1])
        boxes = boxes / batch.scale_factors[:, None, :]
        return boxes, probs

    return jax.jit(fn)


def make_tta_cascade_merge(cfg):
    """merge_aug_bboxes + final multiclass NMS for the CLASS-AGNOSTIC
    cascade boxes (merge_augs.py:83 stacks the per-aug recovered boxes
    over the shared proposal set and MEANS them): boxes [A, B, P, 4],
    probs [A, B, P, C+1], prop_valid [B, P]."""
    t = cfg.test
    c = cfg.num_classes

    @jax.jit
    def merge(boxes, probs, prop_valid):
        fg = probs.mean(axis=0)[..., :c] * prop_valid[..., None]
        return batched_multiclass_nms(
            boxes.mean(axis=0), fg, t.score_thr, t.nms_iou_thr,
            t.max_per_img, min(fg.shape[1], t.pre_nms_cands))

    return merge


def make_tta_mask_step(model, cfg, family: str = "standard"):
    """One aug's mask forward on the MERGED final detections
    (test_mixins.py aug_test_mask / cascade_roi_head.py:473-497 /
    scnet_roi_head.py:517-545): map the det boxes into this aug's frame
    (bbox_mapping), extract mask RoIs on THIS aug's features, run the
    mask head — every stage for 'htc' (sigmoid probs averaged over
    stages); with the final-stage relayed bbox feature added for
    'scnet' — select the det-label channel, and flip the mask raster
    back horizontally where the aug was flipped (merge_aug_masks
    mask[..., ::-1]). The caller averages the returned probs across
    augs (merge_aug_masks mean).

    step(variables, feats, batch, flipped, det_boxes_orig, det_labels)
    -> [B, D, s, s] sigmoid probs in un-flipped box-local frame."""
    c = cfg.num_classes

    from .two_stage import _extract_rois

    def fn(variables, feats, batch: EvalBatch, flipped, det_boxes, det_labels):
        boxes = det_boxes * batch.scale_factors[:, None, :]
        boxes = _flip_x(boxes, flipped, batch.img_shapes[:, 1])
        b, d = boxes.shape[:2]
        if family == "point_rend":
            # coarse mask + point-subdivision refinement per aug
            # (point_rend_roi_head.py:178-209 aug_test_mask runs
            # _mask_point_forward_test on each aug's features;
            # point_rend uses SimpleRoIAlign inside, not the FPN
            # multi-level extractor)
            from .point_rend import refine_mask_logits

            cur = refine_mask_logits(model, cfg, variables, feats,
                                     boxes, det_labels)
            sel = jax.nn.sigmoid(cur)
            return jnp.where(flipped[:, None, None, None],
                             sel[..., ::-1], sel)
        mfeats = _extract_rois(cfg, feats, boxes, roi_size=cfg.mask_roi_size)
        if family == "htc":
            from .htc import _sem_roi

            def _sem(m, f):
                return m.semantic(f)

            def _mask_stage(m, f, stage, res):
                return m.mask_forward(f, stage, res)

            _, sem_feat = model.apply(variables, feats, method=_sem)
            mfeats = mfeats + _sem_roi(sem_feat, boxes, cfg.mask_roi_size)
            res, msum = None, None
            for stage in range(cfg.num_stages):
                logit, res = model.apply(variables, mfeats, stage, res,
                                         method=_mask_stage)
                prob = jax.nn.sigmoid(logit)
                msum = prob if msum is None else msum + prob
            mprob = msum / cfg.num_stages          # [B*D, s, s, C]
        elif family == "scnet":
            # relayed feature from a final-stage bbox forward over the
            # det boxes (scnet_roi_head.py:529-536), then one mask pass
            fuse = _cascade_fusion(model, cfg, variables, feats, "scnet")
            roi_feats = _extract_rois(cfg, feats, boxes)
            roi_feats = fuse(roi_feats, boxes, cfg.rcnn.roi_size)
            _, _, shared = model.apply(
                variables, roi_feats, cfg.num_stages - 1,
                method=lambda m, f, s: m.roi_forward(f, s))
            relayed = model.apply(variables, shared,
                                  method=lambda m, x: m.relay(x))
            mfeats = fuse(mfeats, boxes, cfg.mask_roi_size)
            mfeats = mfeats + relayed.astype(mfeats.dtype)
            mprob = jax.nn.sigmoid(model.apply(
                variables, mfeats, method=lambda m, f: m.mask_forward(f)))
        else:
            def _mask_fwd(m, f):
                return m.mask_forward(f)

            mprob = jax.nn.sigmoid(
                model.apply(variables, mfeats, method=_mask_fwd))
        lab = jnp.clip(det_labels.reshape(-1), 0, c - 1)
        sel = jnp.take_along_axis(mprob, lab[:, None, None, None],
                                  axis=-1)[..., 0]
        sel = sel.reshape(b, d, sel.shape[-2], sel.shape[-1])
        return jnp.where(flipped[:, None, None, None], sel[..., ::-1], sel)

    return jax.jit(fn)


def canvas_for_scale(img_scale: Tuple[int, int]) -> Tuple[int, int]:
    """Landscape (H, W) canvas bounding every keep_ratio resize to
    img_scale=(long, short), /32-padded — the rule behind the live
    config's (1000, 600) -> (608, 1024)."""
    long_e, short_e = max(img_scale), min(img_scale)
    pad = lambda v: int((v + 31) // 32 * 32)
    return (pad(short_e), pad(long_e))
