"""Deterministic preprocessing into the static canvas.

Behavioral parity targets (reference, /root/reference):
* configs/_base_/Config_RetinaNet.py:101-125 — the live pipelines:
  Load -> Resize(img_scale=(1000, 600), keep_ratio=True) ->
  RandomFlip(0.5) -> Normalize(mean/std, to_rgb=True) -> Pad(/32).
* mmdet/datasets/pipelines/transforms.py — mmcv imrescale rule:
  scale_factor = min(long_edge/max(h,w), short_edge/min(h,w)),
  new size = int(dim * sf + 0.5), bilinear; flip maps x1' = W - x2;
  boxes scale by the *actual* (new/old) ratios and clip to img_shape.

The canvas (e.g. 608 x 1024) is the /32-padded bound of every possible
resized image, so the pad step lands all samples in one static shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


@dataclass(frozen=True)
class PipelineConfig:
    """canvas is the LANDSCAPE canvas (H, W); portrait images (original
    w/h <= 1, the reference's aspect-ratio group flag, custom.py:163) land
    on the transposed canvas. Batches are orientation-homogeneous so each
    jitted program sees exactly one static shape."""

    img_scale: Tuple[int, int] = (1000, 600)  # (long, short) edge bound
    canvas: Tuple[int, int] = (608, 1024)     # landscape (H, W)
    mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    to_rgb: bool = True
    flip_ratio: float = 0.5
    size_divisor: int = 32
    # keep_ratio=False (SSD): warp every image exactly to canvas — one
    # shape, no padding, no orientation bucketing (Config_SSD.py:106)
    keep_ratio: bool = True
    # ship uint8 canvases and normalize ON DEVICE (engine.batch.
    # prepare_images): 4x less host->device traffic and ~3x less host CPU
    # per image. Only applies to uint8 inputs — augmented float images
    # (the SSD PhotoMetric chain) keep the exact host float path.
    device_normalize: bool = False

    def canvas_for(self, orientation: str) -> Tuple[int, int]:
        h, w = self.canvas
        if not self.keep_ratio:
            return (h, w)
        return (h, w) if orientation == "landscape" else (w, h)


def load_image(path: str) -> np.ndarray:
    """Load an image as uint8 BGR HWC (cv2 convention, like the reference)."""
    if cv2 is None:
        raise RuntimeError("cv2 unavailable; cannot decode images")
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img


def rescale_size(w: int, h: int, img_scale: Tuple[int, int]) -> Tuple[int, int, float]:
    """mmcv.imrescale sizing: returns (new_w, new_h, scale_factor)."""
    long_edge, short_edge = max(img_scale), min(img_scale)
    sf = min(long_edge / max(h, w), short_edge / min(h, w))
    return int(w * sf + 0.5), int(h * sf + 0.5), sf


def prepare_sample(
    img: np.ndarray,
    ann: Optional[dict],
    cfg: PipelineConfig,
    rng: Optional[np.random.RandomState] = None,
    flip: Optional[bool] = None,
) -> dict:
    """One sample -> canvas image + transformed GT + shape metadata.

    Returns dict with: image [H, W, 3] float32 (canvas), img_shape (h, w)
    resized, pad_shape (h, w) /32-padded, scale_factor [4], flipped bool,
    and (when ann given) gt_bboxes [n, 4] / gt_labels [n] in resized coords.
    """
    h0, w0 = img.shape[:2]
    orientation = "landscape" if w0 / h0 > 1 else "portrait"
    if cfg.keep_ratio:
        new_w, new_h, _ = rescale_size(w0, h0, cfg.img_scale)
    else:
        new_h, new_w = cfg.canvas  # exact warp
    resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    w_scale, h_scale = new_w / w0, new_h / h0
    scale_factor = np.array([w_scale, h_scale, w_scale, h_scale], np.float32)

    if flip is None:
        flip = bool(rng is not None and cfg.flip_ratio > 0 and rng.rand() < cfg.flip_ratio)
    if flip:
        resized = resized[:, ::-1]

    ch, cw = cfg.canvas_for(orientation)
    if cfg.device_normalize and resized.dtype == np.uint8:
        # raw BGR uint8 canvas; to_rgb/normalize/pad-zeroing happen on
        # device (must use matching cfg.img_mean/img_std/img_to_rgb)
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[:new_h, :new_w] = resized
    else:
        img_f = resized.astype(np.float32)
        if cfg.to_rgb:
            img_f = img_f[..., ::-1]
        img_f = (img_f - np.asarray(cfg.mean, np.float32)) / np.asarray(cfg.std, np.float32)
        canvas = np.zeros((ch, cw, 3), np.float32)
        canvas[:new_h, :new_w] = img_f

    d = cfg.size_divisor
    pad_shape = (int(np.ceil(new_h / d)) * d, int(np.ceil(new_w / d)) * d)

    out = dict(
        image=canvas,
        img_shape=np.array([new_h, new_w], np.int32),
        pad_shape=np.array(pad_shape, np.int32),
        scale_factor=scale_factor,
        flipped=flip,
        orientation=orientation,
    )
    if ann is not None:
        boxes = ann["bboxes"] * scale_factor
        # clip to resized image extent (Resize bbox_clip_border=True)
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, new_w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, new_h)
        if flip:
            x1 = boxes[:, 0].copy()
            boxes[:, 0] = new_w - boxes[:, 2]
            boxes[:, 2] = new_w - x1
        out["gt_bboxes"] = boxes.astype(np.float32)
        out["gt_labels"] = ann["labels"].astype(np.int32)
    return out
