"""High-level inference API.

Behavioral parity target (reference, /root/reference):
* mmdet/apis/inference.py:16 (init_detector: config + checkpoint ->
  ready model), :89 (inference_detector: single image / list -> per-class
  det arrays), :212 (show_result helper).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import numpy as np

from .data.pipeline import PipelineConfig, load_image, prepare_sample
from .engine.batch import EvalBatch
from .engine.checkpoint import load_checkpoint
from .engine.eval import detections_to_per_class, make_eval_step
from .models import init_retinanet, init_ssd
from .utils.config import RetinaNetConfig, SSDConfig


def _family(cfg) -> str:
    return getattr(cfg, "family", "retinanet")


def init_detector(cfg, checkpoint: Optional[str] = None, seed: int = 0):
    """Build a detector of any registered family (+ load a checkpoint).
    Returns (model, variables). Families: retinanet (MEH), ssd (MEH),
    faster_rcnn, fcos, atss — the reference's build_detector registry
    collapsed to a config-type dispatch."""
    from .models import (init_atss, init_autoassign, init_cascade_rcnn,
                         init_centernet, init_double_head_rcnn,
                         init_centripetalnet,
                         init_cornernet, init_deformable_detr, init_detr,
                         init_faster_rcnn, init_fcos, init_free_anchor,
                         init_fsaf, init_gfl,
                         init_foveabox,
                         init_fast_rcnn, init_ga_retinanet, init_grid_rcnn,
                         init_htc, init_mask_rcnn, init_sabl_retinanet,
                         init_scnet, init_nasfcos, init_gn_ws,
                         init_yolact,
                         init_mask_scoring_rcnn, init_point_rend,
                         init_reppoints,
                         init_rpn_only, init_sparse_rcnn,
                         init_cascade_rpn, init_trident, init_detectors_rs,
                         init_vfnet, init_yolof, init_yolov3)

    init_fn = {
        "retinanet": init_retinanet,
        "ssd": init_ssd,
        "faster_rcnn": init_faster_rcnn,
        "libra_rcnn": init_faster_rcnn,  # cfg carries the BFP/sampler deltas
        "pafpn": init_faster_rcnn,  # cfg.neck_type switches the neck
        "dynamic_rcnn": init_faster_rcnn,  # novelty is all in the train step
        "double_head_rcnn": init_double_head_rcnn,
        "cascade_rcnn": init_cascade_rcnn,
        "fcos": init_fcos,
        "nas_fcos": init_nasfcos,
        "fsaf": init_fsaf,
        "free_anchor": init_free_anchor,
        "ghm": init_free_anchor,  # same plain retina model; GHM is a loss
        "guided_anchor": init_ga_retinanet,
        "pisa_retinanet": init_free_anchor,  # plain retina model; PISA is loss
        "pisa_faster_rcnn": init_faster_rcnn,  # PISA lives in the train step
        "nasfpn": init_free_anchor,  # plain retina model, cfg swaps the neck
        "grid_rcnn": init_grid_rcnn,
        "sabl": init_sabl_retinanet,
        "htc": init_htc,
        "scnet": init_scnet,
        "yolact": init_yolact,
        "carafe": init_faster_rcnn,  # cfg.neck_type switches the neck
        "autoassign": init_autoassign,
        "atss": init_atss,
        "vfnet": init_vfnet,
        "gfl": init_gfl,
        "ld": init_gfl,  # the LD student IS a GFL model
        "yolov3": init_yolov3,
        "detr": init_detr,
        "centernet": init_centernet,
        "sparse_rcnn": init_sparse_rcnn,
        "yolof": init_yolof,
        "foveabox": init_foveabox,
        "paa": init_atss,  # PAA reuses the ATSS model; engine differs
        "cornernet": init_cornernet,
        "centripetalnet": init_centripetalnet,
        "reppoints": init_reppoints,
        "deformable_detr": init_deformable_detr,
        "mask_rcnn": init_mask_rcnn,
        "seesaw": init_mask_rcnn,  # cfg grows the C+2 seesaw classifier
        "mask_scoring_rcnn": init_mask_scoring_rcnn,
        "point_rend": init_point_rend,
        "rpn": init_rpn_only,
        "cascade_rpn": init_cascade_rpn,
        "tridentnet": init_trident,
        "detectors": init_detectors_rs,
        "hrnet": init_faster_rcnn,  # cfg swaps backbone/neck
        "resnest": init_faster_rcnn,  # cfg swaps the backbone
        "groie": init_faster_rcnn,  # cfg swaps the RoI extractor
        "fpg": init_faster_rcnn,  # cfg swaps the neck
        "gn_ws": init_gn_ws,
        "empirical_attention": init_faster_rcnn,  # backbone plugin
        "fast_rcnn": init_fast_rcnn,
    }[_family(cfg)]
    model, variables = init_fn(cfg, jax.random.PRNGKey(seed))
    if checkpoint:
        variables = load_checkpoint(checkpoint, variables)
    return model, variables


def make_eval_step_for(model, cfg):
    """Family-dispatched jitted eval step (NMSResult contract)."""
    from .engine.atss import make_atss_eval_step
    from .engine.centernet import make_centernet_eval_step
    from .engine.detr import make_detr_eval_step
    from .engine.sparse_rcnn import make_sparse_rcnn_eval_step
    from .engine.yolof import make_yolof_eval_step
    from .engine.foveabox import make_fovea_eval_step
    from .engine.paa import make_paa_eval_step
    from .engine.gfl import make_gfl_eval_step
    from .engine.yolo import make_yolo_eval_step
    from .engine.fcos import make_fcos_eval_step
    from .engine.free_anchor import make_free_anchor_eval_step
    from .engine.guided_anchor import make_ga_eval_step
    from .engine.grid_rcnn import make_grid_rcnn_eval_step
    from .engine.sabl import make_sabl_eval_step
    from .engine.htc import make_htc_eval_step
    from .engine.scnet import make_scnet_eval_step
    from .engine.seesaw import make_seesaw_eval_step
    from .engine.yolact import make_yolact_eval_step
    from .engine.autoassign import make_autoassign_eval_step
    from .engine.fsaf import make_fsaf_eval_step
    from .engine.vfnet import make_vfnet_eval_step
    from .engine.two_stage import (make_cascade_eval_step,
                                   make_double_head_eval_step,
                                   make_faster_rcnn_eval_step)
    from .engine.cornernet import make_cornernet_eval_step
    from .engine.centripetal import make_centripetal_eval_step
    from .engine.deformable_detr import make_deformable_detr_eval_step
    from .engine.mask_rcnn import make_mask_rcnn_eval_step
    from .engine.mask_scoring_rcnn import make_ms_rcnn_eval_step
    from .engine.point_rend import make_point_rend_eval_step
    from .engine.reppoints import make_reppoints_eval_step
    from .engine.rpn_only import make_rpn_eval_step
    from .engine.cascade_rpn import make_crpn_eval_step
    from .engine.trident import make_trident_eval_step

    fn = {
        "retinanet": make_eval_step,
        "ssd": make_eval_step,
        "faster_rcnn": make_faster_rcnn_eval_step,
        "libra_rcnn": make_faster_rcnn_eval_step,
        "pafpn": make_faster_rcnn_eval_step,
        "dynamic_rcnn": make_faster_rcnn_eval_step,
        "double_head_rcnn": make_double_head_eval_step,
        "cascade_rcnn": make_cascade_eval_step,
        "fcos": make_fcos_eval_step,
        "nas_fcos": make_fcos_eval_step,  # same output contract
        "fsaf": make_fsaf_eval_step,
        "free_anchor": make_free_anchor_eval_step,
        "ghm": make_free_anchor_eval_step,  # retina eval, cfg stds differ
        "guided_anchor": make_ga_eval_step,
        "pisa_retinanet": make_free_anchor_eval_step,
        "pisa_faster_rcnn": make_faster_rcnn_eval_step,
        "nasfpn": make_free_anchor_eval_step,
        "grid_rcnn": make_grid_rcnn_eval_step,
        "sabl": make_sabl_eval_step,
        "htc": make_htc_eval_step,
        "scnet": make_scnet_eval_step,
        "yolact": make_yolact_eval_step,
        "carafe": make_faster_rcnn_eval_step,
        "autoassign": make_autoassign_eval_step,
        "atss": make_atss_eval_step,
        "vfnet": make_vfnet_eval_step,
        "gfl": make_gfl_eval_step,
        "ld": make_gfl_eval_step,
        "yolov3": make_yolo_eval_step,
        "detr": make_detr_eval_step,
        "centernet": make_centernet_eval_step,
        "sparse_rcnn": make_sparse_rcnn_eval_step,
        "yolof": make_yolof_eval_step,
        "foveabox": make_fovea_eval_step,
        "paa": make_paa_eval_step,
        "cornernet": make_cornernet_eval_step,
        "centripetalnet": make_centripetal_eval_step,
        "reppoints": make_reppoints_eval_step,
        "deformable_detr": make_deformable_detr_eval_step,
        "mask_rcnn": make_mask_rcnn_eval_step,
        "seesaw": make_seesaw_eval_step,
        "mask_scoring_rcnn": make_ms_rcnn_eval_step,
        "point_rend": make_point_rend_eval_step,
        "rpn": make_rpn_eval_step,
        "cascade_rpn": make_crpn_eval_step,
        "tridentnet": make_trident_eval_step,
        "detectors": make_cascade_eval_step,
        "hrnet": make_faster_rcnn_eval_step,
        "resnest": make_faster_rcnn_eval_step,
        "groie": make_faster_rcnn_eval_step,
        "fpg": make_faster_rcnn_eval_step,
        "gn_ws": make_faster_rcnn_eval_step,
        "empirical_attention": make_faster_rcnn_eval_step,
    }
    if _family(cfg) == "fast_rcnn":
        raise ValueError(
            "fast_rcnn eval needs external proposals: use "
            "engine.rpn_only.make_fast_rcnn_eval_step(model, cfg)"
            "(variables, batch, proposals, prop_valid) — the reference's "
            "proposal_file contract (detectors/fast_rcnn.py)")
    fn = fn[_family(cfg)]
    return fn(model, cfg)


def _default_pipeline(cfg) -> PipelineConfig:
    if getattr(cfg, "family", "retinanet") == "ssd":
        return PipelineConfig(img_scale=cfg.canvas, canvas=cfg.canvas,
                              std=(1.0, 1.0, 1.0), keep_ratio=False,
                              device_normalize=True)
    return PipelineConfig(canvas=cfg.canvas, device_normalize=True)


class Detector:
    """Convenience wrapper caching the per-orientation compiled eval steps."""

    def __init__(self, cfg, model, variables, pipeline: Optional[PipelineConfig] = None,
                 with_uncertainty: bool = False):
        """with_uncertainty (retinanet/ssd families): per-class results
        become [k, 6] with the per-detection Shannon entropy appended —
        the reference's bbox2tupleresult capability; show_result renders
        the extra column like versatile_imshow_det_bboxes
        (core/visualization/image.py:260-262)."""
        if with_uncertainty and getattr(cfg, "family", "retinanet") not in (
                "retinanet", "ssd"):
            raise ValueError("with_uncertainty is a retinanet/ssd capability")
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.pipeline = pipeline or _default_pipeline(cfg)
        self.with_uncertainty = with_uncertainty
        self._steps = {}

    def _step(self, orientation: str):
        if orientation not in self._steps:
            ocfg = self.cfg.for_orientation(orientation)
            if self.with_uncertainty:
                self._steps[orientation] = make_eval_step(
                    self.model, ocfg, with_uncertainty=True)
            else:
                self._steps[orientation] = make_eval_step_for(self.model, ocfg)
        return self._steps[orientation]

    def __call__(self, image: Union[str, np.ndarray]) -> List[np.ndarray]:
        """One image (path or BGR array) -> per-class [k, 5] arrays in
        original image coordinates (the reference's bbox2result format);
        [k, 6] with per-detection uncertainty when with_uncertainty."""
        img = load_image(image) if isinstance(image, str) else image
        s = prepare_sample(img, None, self.pipeline, flip=False)
        batch = EvalBatch(
            s["image"][None], s["img_shape"][None], s["scale_factor"][None],
            np.ones(1, bool),
        )
        out = self._step(s["orientation"])(self.variables, batch)
        if self.with_uncertainty:
            dets, unc = out
            return detections_to_per_class(
                dets, self.cfg.num_fg_classes, unc=unc)[0]
        return detections_to_per_class(out, self.cfg.num_fg_classes)[0]

    def tta(self, image: Union[str, np.ndarray],
            scales: Optional[Sequence] = None,
            flip: bool = True,
            return_masks: bool = False):
        """Test-time-augmented inference (MultiScaleFlipAug + aug_test,
        reference datasets/pipelines/test_time_aug.py:10 +
        dense_test_mixins.py:71): one candidate pass per (scale, flip),
        candidates mapped back to original coordinates, merged through
        ONE NMS. Returns per-class [k, 5] arrays like __call__.

        Covered families: the dense MEH pair, faster_rcnn,
        cascade_rcnn / htc (cascade_roi_head.py:413 aug_test: per-stage
        refinement per aug, stage-averaged logits, mean-merged boxes),
        and mask_rcnn / mask_scoring_rcnn / htc masks
        (aug_test_mask + merge_augs.py merge_aug_masks) — pass
        `return_masks=True` on a mask family to also get the per-class
        [k, s, s] aug-averaged sigmoid mask probs (the reference
        aug_test's (bbox_result, segm_result) pair)."""
        import dataclasses

        from .engine.tta import (canvas_for_scale, make_tta_candidate_step,
                                 make_tta_merge_step)

        img = load_image(image) if isinstance(image, str) else image
        scales = [tuple(s) for s in (scales or [self.pipeline.img_scale])]
        flips = [False, True] if flip else [False]
        fam = _family(self.cfg)
        if fam in ("faster_rcnn", "cascade_rcnn", "htc", "scnet",
                   "mask_rcnn", "mask_scoring_rcnn", "point_rend"):
            return self._tta_two_stage(img, scales, flips, fam, return_masks)
        if fam == "sparse_rcnn":
            # parity: the reference raises too (sparse_roi_head.py:302)
            raise NotImplementedError(
                "Sparse R-CNN does not support `aug_test`")
        if fam not in ("retinanet", "ssd"):
            raise NotImplementedError(
                f"TTA is implemented for the dense MEH families, "
                f"faster_rcnn, cascade_rcnn, htc, scnet, point_rend, and "
                f"the mask families (reference aug_test coverage); got {fam!r}")
        if not hasattr(self, "_tta_steps"):
            self._tta_steps, self._tta_merge = {}, {}
        aug_boxes, aug_scores = [], []
        for scale in scales:
            canvas = (canvas_for_scale(scale) if self.pipeline.keep_ratio
                      else (min(scale), max(scale)))
            pipe = dataclasses.replace(self.pipeline, img_scale=scale,
                                       canvas=canvas)
            for f in flips:
                s = prepare_sample(img, None, pipe, flip=f)
                key = (scale, s["orientation"])
                if key not in self._tta_steps:
                    if _family(self.cfg) == "ssd":
                        cfg_s = dataclasses.replace(
                            self.cfg, input_size=max(scale))
                    else:
                        cfg_s = dataclasses.replace(self.cfg, canvas=canvas)
                    self._tta_steps[key] = make_tta_candidate_step(
                        self.model, cfg_s.for_orientation(s["orientation"]))
                batch = EvalBatch(
                    s["image"][None], s["img_shape"][None],
                    s["scale_factor"][None], np.ones(1, bool),
                )
                b, sc = self._tta_steps[key](
                    self.variables, batch, np.array([f], bool))
                aug_boxes.append(np.asarray(b))
                aug_scores.append(np.asarray(sc))
        boxes = np.concatenate(aug_boxes, axis=1)
        scores = np.concatenate(aug_scores, axis=1)
        mkey = boxes.shape[1]  # one merge program per total candidate count
        if mkey not in self._tta_merge:
            self._tta_merge[mkey] = make_tta_merge_step(self.cfg)
        dets = self._tta_merge[mkey](boxes, scores)
        return detections_to_per_class(dets, self.cfg.num_fg_classes)[0]

    def _tta_two_stage(self, img: np.ndarray, scales, flips,
                       fam: str = "faster_rcnn", return_masks: bool = False):
        """Two-stage TTA (reference two_stage.py:184 aug_test →
        aug_test_rpn + merge_aug_proposals + RoI aug_test_bboxes): RPN
        per aug → merged proposal set in original coords → RoI refine
        per aug on the SHARED proposals → mean boxes/scores → one NMS.
        Cascade/HTC swap the RoI stage for the multi-stage refinement
        (cascade_roi_head.py:413); mask families then run the mask head
        per aug on the merged detections and average the sigmoid probs
        (merge_aug_masks)."""
        import dataclasses

        from .engine.tta import (canvas_for_scale, make_tta_cascade_merge,
                                 make_tta_cascade_roi_step, make_tta_mask_step,
                                 make_tta_proposal_merge, make_tta_roi_step,
                                 make_tta_rpn_step, make_tta_two_stage_merge)

        cascade = fam in ("cascade_rcnn", "htc", "scnet")
        with_mask = fam in ("mask_rcnn", "mask_scoring_rcnn", "htc", "scnet",
                            "point_rend")
        sub_fam = {"cascade_rcnn": "cascade", "htc": "htc",
                   "scnet": "scnet", "point_rend": "point_rend"}.get(
                       fam, "standard")
        if not hasattr(self, "_tta2_steps"):
            self._tta2_steps = {}
            self._tta2_pmerge = make_tta_proposal_merge(self.cfg)
            self._tta2_merge = (make_tta_cascade_merge(self.cfg) if cascade
                                else make_tta_two_stage_merge(self.cfg))

        aug_runs = []  # (steps_key, batch, flipped)
        for scale in scales:
            canvas = (canvas_for_scale(scale) if self.pipeline.keep_ratio
                      else (min(scale), max(scale)))
            pipe = dataclasses.replace(self.pipeline, img_scale=scale,
                                       canvas=canvas)
            for f in flips:
                s = prepare_sample(img, None, pipe, flip=f)
                key = (scale, s["orientation"])
                if key not in self._tta2_steps:
                    cfg_s = dataclasses.replace(self.cfg, canvas=canvas) \
                        .for_orientation(s["orientation"])
                    roi_step = (
                        make_tta_cascade_roi_step(self.model, cfg_s, sub_fam)
                        if cascade else make_tta_roi_step(self.model, cfg_s))
                    # built whenever the family has masks (jit is lazy,
                    # so an unused step costs nothing) — the step cache
                    # must not depend on this call's return_masks
                    mask_step = (make_tta_mask_step(self.model, cfg_s, sub_fam)
                                 if with_mask else None)
                    self._tta2_steps[key] = (
                        make_tta_rpn_step(self.model, cfg_s),
                        roi_step, mask_step)
                batch = EvalBatch(
                    s["image"][None], s["img_shape"][None],
                    s["scale_factor"][None], np.ones(1, bool),
                )
                aug_runs.append((key, batch, np.array([f], bool)))

        # stage 1: RPN per aug (feats stay on device for stage 2)
        stage1 = [self._tta2_steps[k][0](self.variables, b, fl)
                  for k, b, fl in aug_runs]
        all_props = np.concatenate([np.asarray(p) for _, p, _, _ in stage1], axis=1)
        all_scores = np.concatenate([np.asarray(s) for _, _, s, _ in stage1], axis=1)
        all_valid = np.concatenate([np.asarray(v) for _, _, _, v in stage1], axis=1)
        merged, merged_valid = self._tta2_pmerge(all_props, all_scores,
                                                 all_valid)

        # stage 2: RoI refine per aug on the shared merged proposals
        boxes, probs = [], []
        for (k, b, fl), (feats, _, _, _) in zip(aug_runs, stage1):
            bx, pr = self._tta2_steps[k][1](self.variables, feats, b, fl,
                                            merged, merged_valid)
            boxes.append(np.asarray(bx))
            probs.append(np.asarray(pr))
        dets = self._tta2_merge(np.stack(boxes), np.stack(probs),
                                np.asarray(merged_valid))
        if not (with_mask and return_masks):
            return detections_to_per_class(dets, self.cfg.num_fg_classes)[0]

        # mask TTA (aug_test_mask / cascade_roi_head.py:473): mask head
        # per aug on the MERGED detections, sigmoid probs averaged over
        # augs (merge_aug_masks mean; flip-back happens inside the step)
        mprobs = [np.asarray(self._tta2_steps[k][2](
            self.variables, feats, b, fl, dets.boxes, dets.labels))
            for (k, b, fl), (feats, _, _, _) in zip(aug_runs, stage1)]
        masks = (np.mean(mprobs, axis=0)
                 * np.asarray(dets.valid)[:, :, None, None])
        from .engine.eval import mask_detections_to_per_class
        from .engine.mask_rcnn import MaskDetections

        md = MaskDetections(np.asarray(dets.boxes), np.asarray(dets.scores),
                            np.asarray(dets.labels), np.asarray(dets.valid),
                            np.asarray(dets.anchor_idx), masks)
        res, segm = mask_detections_to_per_class(md, self.cfg.num_fg_classes)
        return res[0], segm[0]

    def predict_batch(self, images: Sequence[Union[str, np.ndarray]],
                      max_batch: int = 8) -> List[List[np.ndarray]]:
        """Batched inference for serving: group by orientation, pad each
        group to a FIXED max_batch (one compile per orientation instead
        of one per request count), run the same jitted eval step, return
        per-image per-class arrays in input order. This is the batched
        forward the reference delegates to TorchServe's dynamic batcher
        (tools/deployment/mmdet_handler.py handles lists of requests)."""
        samples = [prepare_sample(load_image(i) if isinstance(i, str) else i,
                                  None, self.pipeline, flip=False)
                   for i in images]
        results: List[Optional[List[np.ndarray]]] = [None] * len(images)
        by_orient = {}
        for idx, s in enumerate(samples):
            by_orient.setdefault(s["orientation"], []).append(idx)
        for orient, idxs in by_orient.items():
            step = self._step(orient)
            for lo in range(0, len(idxs), max_batch):
                chunk = idxs[lo:lo + max_batch]
                n = len(chunk)
                pad = max_batch - n
                imgs = np.stack([samples[i]["image"] for i in chunk]
                                + [samples[chunk[0]]["image"]] * pad)
                shapes = np.stack([samples[i]["img_shape"] for i in chunk]
                                  + [samples[chunk[0]]["img_shape"]] * pad)
                scales = np.stack([samples[i]["scale_factor"] for i in chunk]
                                  + [samples[chunk[0]]["scale_factor"]] * pad)
                bvalid = np.arange(max_batch) < n
                dets = step(self.variables,
                            EvalBatch(imgs, shapes, scales, bvalid))
                per = detections_to_per_class(dets, self.cfg.num_fg_classes,
                                              batch_valid=bvalid)
                for j, i in enumerate(chunk):
                    results[i] = per[j]
        return results  # type: ignore[return-value]


def show_result(
    image: Union[str, np.ndarray],
    per_class_dets: List[np.ndarray],
    out_file: Optional[str] = None,
    score_thr: float = 0.3,
):
    """Reference show_result_pyplot analog: draw per-class detections on
    the original image; returns (and optionally saves) the BGR array.
    6-column rows (bbox2tupleresult format) also render the per-det
    uncertainty, like versatile_imshow_det_bboxes's `label|unc` text
    (core/visualization/image.py:260-262)."""
    from .data.pipeline import load_image as _load
    from .utils.visualize import draw_detections, save_image

    img = _load(image) if isinstance(image, str) else image.copy()
    boxes, labels, scores, uncs = [], [], [], []
    for c, arr in enumerate(per_class_dets):
        for row in arr:
            boxes.append(row[:4])
            scores.append(row[4])
            labels.append(c)
            if len(row) > 5:
                uncs.append(row[5])
    if boxes:
        img = draw_detections(
            img, np.asarray(boxes), np.asarray(labels), np.asarray(scores),
            uncertainties=np.asarray(uncs) if len(uncs) == len(boxes) else None,
            score_thr=score_thr)
    if out_file:
        save_image(img, out_file)
    return img


def inference_detector(detector: Detector, imgs) -> Union[List, List[List]]:
    """Reference-style helper: single image or list of images."""
    if isinstance(imgs, (list, tuple)):
        return [detector(i) for i in imgs]
    return detector(imgs)


async def async_inference_detector(detector: Detector, img):
    """Awaitable single-image inference (reference
    mmdet/apis/inference.py:155 async_inference_detector): the device
    step runs in the default thread-pool executor so the event loop
    stays free while XLA executes — the analog of the reference's
    torch.cuda.stream concurrency."""
    import asyncio

    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(None, detector, img)
