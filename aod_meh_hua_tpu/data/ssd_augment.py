"""SSD train-time augmentations (host numpy/cv2).

Behavioral parity targets (reference, /root/reference):
* mmdet/datasets/pipelines/transforms.py:900 (PhotoMetricDistortion:
  brightness +-32, contrast 0.5-1.5 before-or-after color ops, HSV
  saturation 0.5-1.5, hue +-18, random channel permutation — each
  applied with probability 1/2)
* :1006 (Expand: 1/2 probability, ratio 1-4 canvas filled with the
  normalization mean, image pasted at a random offset, boxes shifted)
* :1098 (MinIoURandomCrop: sample a mode from (1, 0.1, 0.3, 0.5, 0.7,
  0.9, 0), mode 1 = no crop; up to 50 attempts at a 0.3-1.0 crop with
  aspect in (0.5, 2), all patch-vs-box IoUs >= min_iou, at least one
  box center inside; boxes clipped/shifted, outside boxes dropped)

All operate on float32 BGR images + 0-based boxes, before Resize.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def photo_metric_distortion(
    img: np.ndarray,
    rng: np.random.RandomState,
    brightness_delta: float = 32,
    contrast_range: Tuple[float, float] = (0.5, 1.5),
    saturation_range: Tuple[float, float] = (0.5, 1.5),
    hue_delta: float = 18,
) -> np.ndarray:
    """img: float32 BGR."""
    img = img.astype(np.float32)
    if rng.randint(2):
        img = img + rng.uniform(-brightness_delta, brightness_delta)
    mode = rng.randint(2)
    if mode == 1 and rng.randint(2):
        img = img * rng.uniform(*contrast_range)
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    if rng.randint(2):
        hsv[..., 1] = hsv[..., 1] * rng.uniform(*saturation_range)
    if rng.randint(2):
        hsv[..., 0] = hsv[..., 0] + rng.uniform(-hue_delta, hue_delta)
        hsv[..., 0][hsv[..., 0] > 360] -= 360
        hsv[..., 0][hsv[..., 0] < 0] += 360
    img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    if mode == 0 and rng.randint(2):
        img = img * rng.uniform(*contrast_range)
    if rng.randint(2):
        img = img[..., rng.permutation(3)]
    return img


def expand(
    img: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.RandomState,
    mean: Tuple[float, ...] = (123.675, 116.28, 103.53),
    to_rgb: bool = True,
    ratio_range: Tuple[float, float] = (1, 4),
) -> Tuple[np.ndarray, np.ndarray]:
    """Place the BGR image on a mean-filled larger canvas (1/2 prob)."""
    if rng.randint(2):
        return img, boxes
    h, w = img.shape[:2]
    ratio = rng.uniform(*ratio_range)
    fill = np.asarray(mean, np.float32)
    if to_rgb:  # mean given in RGB order, canvas is BGR
        fill = fill[::-1]
    canvas = np.empty((int(h * ratio), int(w * ratio), 3), img.dtype)
    canvas[...] = fill
    left = int(rng.uniform(0, w * ratio - w))
    top = int(rng.uniform(0, h * ratio - h))
    canvas[top:top + h, left:left + w] = img
    out_boxes = boxes + np.array([left, top, left, top], boxes.dtype) if len(boxes) else boxes
    return canvas, out_boxes


def min_iou_random_crop(
    img: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    rng: np.random.RandomState,
    min_ious: Tuple[float, ...] = (0.1, 0.3, 0.5, 0.7, 0.9),
    min_crop_size: float = 0.3,
):
    """Returns (img, boxes, labels); may be unchanged (mode 1)."""
    h, w = img.shape[:2]
    sample_modes = (1, *min_ious, 0)
    while True:
        mode = sample_modes[rng.randint(len(sample_modes))]
        if mode == 1:
            return img, boxes, labels
        min_iou = mode
        for _ in range(50):
            new_w = rng.uniform(min_crop_size * w, w)
            new_h = rng.uniform(min_crop_size * h, h)
            if new_h / new_w < 0.5 or new_h / new_w > 2:
                continue
            left = rng.uniform(w - new_w)
            top = rng.uniform(h - new_h)
            patch = np.array([int(left), int(top), int(left + new_w), int(top + new_h)])
            if patch[2] == patch[0] or patch[3] == patch[1]:
                continue
            if len(boxes):
                # IoU between the patch and every box must clear min_iou
                lt = np.maximum(patch[:2], boxes[:, :2])
                rb = np.minimum(patch[2:], boxes[:, 2:])
                wh = np.clip(rb - lt, 0, None)
                inter = wh[:, 0] * wh[:, 1]
                a_p = (patch[2] - patch[0]) * (patch[3] - patch[1])
                a_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                iou = inter / np.maximum(a_p + a_b - inter, 1e-6)
                if iou.min() < min_iou:
                    continue
                centers = (boxes[:, :2] + boxes[:, 2:]) / 2
                mask = (
                    (centers[:, 0] > patch[0]) & (centers[:, 1] > patch[1])
                    & (centers[:, 0] < patch[2]) & (centers[:, 1] < patch[3])
                )
                if not mask.any():
                    continue
                new_boxes = boxes[mask].copy()
                new_boxes[:, :2] = np.maximum(new_boxes[:, :2], patch[:2])
                new_boxes[:, 2:] = np.minimum(new_boxes[:, 2:], patch[2:])
                new_boxes -= np.tile(patch[:2], 2)
                new_labels = labels[mask]
            else:
                new_boxes, new_labels = boxes, labels
            cropped = img[patch[1]:patch[3], patch[0]:patch[2]]
            return cropped, new_boxes, new_labels


def ssd_train_augment(img, ann, rng, mean=(123.675, 116.28, 103.53), to_rgb=True):
    """The full SSD train augmentation chain before Resize
    (Config_SSD.py:88-106). img: uint8/float BGR; ann: bboxes/labels."""
    img = img.astype(np.float32)
    boxes = ann["bboxes"].astype(np.float32)
    labels = ann["labels"]
    img = photo_metric_distortion(img, rng)
    img, boxes = expand(img, boxes, rng, mean=mean, to_rgb=to_rgb)
    img, boxes, labels = min_iou_random_crop(img, boxes, labels, rng)
    return img, {"bboxes": boxes, "labels": labels}
