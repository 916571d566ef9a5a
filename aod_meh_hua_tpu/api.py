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
    from .models import (init_atss, init_cascade_rcnn, init_centernet,
                         init_cornernet, init_deformable_detr, init_detr,
                         init_faster_rcnn, init_fcos, init_gfl, init_foveabox,
                         init_mask_rcnn, init_reppoints, init_sparse_rcnn,
                         init_yolof, init_yolov3)

    init_fn = {
        "retinanet": init_retinanet,
        "ssd": init_ssd,
        "faster_rcnn": init_faster_rcnn,
        "cascade_rcnn": init_cascade_rcnn,
        "fcos": init_fcos,
        "atss": init_atss,
        "gfl": init_gfl,
        "yolov3": init_yolov3,
        "detr": init_detr,
        "centernet": init_centernet,
        "sparse_rcnn": init_sparse_rcnn,
        "yolof": init_yolof,
        "foveabox": init_foveabox,
        "paa": init_atss,  # PAA reuses the ATSS model; engine differs
        "cornernet": init_cornernet,
        "reppoints": init_reppoints,
        "deformable_detr": init_deformable_detr,
        "mask_rcnn": init_mask_rcnn,
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
    from .engine.two_stage import make_cascade_eval_step, make_faster_rcnn_eval_step
    from .engine.cornernet import make_cornernet_eval_step
    from .engine.deformable_detr import make_deformable_detr_eval_step
    from .engine.mask_rcnn import make_mask_rcnn_eval_step
    from .engine.reppoints import make_reppoints_eval_step

    fn = {
        "retinanet": make_eval_step,
        "ssd": make_eval_step,
        "faster_rcnn": make_faster_rcnn_eval_step,
        "cascade_rcnn": make_cascade_eval_step,
        "fcos": make_fcos_eval_step,
        "atss": make_atss_eval_step,
        "gfl": make_gfl_eval_step,
        "yolov3": make_yolo_eval_step,
        "detr": make_detr_eval_step,
        "centernet": make_centernet_eval_step,
        "sparse_rcnn": make_sparse_rcnn_eval_step,
        "yolof": make_yolof_eval_step,
        "foveabox": make_fovea_eval_step,
        "paa": make_paa_eval_step,
        "cornernet": make_cornernet_eval_step,
        "reppoints": make_reppoints_eval_step,
        "deformable_detr": make_deformable_detr_eval_step,
        "mask_rcnn": make_mask_rcnn_eval_step,
    }[_family(cfg)]
    return fn(model, cfg)


def _default_pipeline(cfg) -> PipelineConfig:
    if getattr(cfg, "family", "retinanet") == "ssd":
        return PipelineConfig(img_scale=cfg.canvas, canvas=cfg.canvas,
                              std=(1.0, 1.0, 1.0), keep_ratio=False,
                              device_normalize=True)
    return PipelineConfig(canvas=cfg.canvas, device_normalize=True)


class Detector:
    """Convenience wrapper caching the per-orientation compiled eval steps."""

    def __init__(self, cfg, model, variables, pipeline: Optional[PipelineConfig] = None):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.pipeline = pipeline or _default_pipeline(cfg)
        self._steps = {}

    def _step(self, orientation: str):
        if orientation not in self._steps:
            self._steps[orientation] = make_eval_step_for(
                self.model, self.cfg.for_orientation(orientation)
            )
        return self._steps[orientation]

    def __call__(self, image: Union[str, np.ndarray]) -> List[np.ndarray]:
        """One image (path or BGR array) -> per-class [k, 5] arrays in
        original image coordinates (the reference's bbox2result format)."""
        img = load_image(image) if isinstance(image, str) else image
        s = prepare_sample(img, None, self.pipeline, flip=False)
        batch = EvalBatch(
            s["image"][None], s["img_shape"][None], s["scale_factor"][None],
            np.ones(1, bool),
        )
        dets = self._step(s["orientation"])(self.variables, batch)
        return detections_to_per_class(dets, self.cfg.num_fg_classes)[0]


def show_result(
    image: Union[str, np.ndarray],
    per_class_dets: List[np.ndarray],
    out_file: Optional[str] = None,
    score_thr: float = 0.3,
):
    """Reference show_result_pyplot analog: draw per-class detections on
    the original image; returns (and optionally saves) the BGR array."""
    from .data.pipeline import load_image as _load
    from .utils.visualize import draw_detections, save_image

    img = _load(image) if isinstance(image, str) else image.copy()
    boxes, labels, scores = [], [], []
    for c, arr in enumerate(per_class_dets):
        for row in arr:
            boxes.append(row[:4])
            scores.append(row[4])
            labels.append(c)
    if boxes:
        img = draw_detections(img, np.asarray(boxes), np.asarray(labels),
                              np.asarray(scores), score_thr=score_thr)
    if out_file:
        save_image(img, out_file)
    return img


def inference_detector(detector: Detector, imgs) -> Union[List, List[List]]:
    """Reference-style helper: single image or list of images."""
    if isinstance(imgs, (list, tuple)):
        return [detector(i) for i in imgs]
    return detector(imgs)
