"""Visual debugging harness.

Behavioral parity targets (reference, /root/reference):
* mmdet/utils/functions.py:14-47 (visualize: tensor -> image/heatmap
  dump), :128-177 (DrawGT: boxes + labels onto an image)
* mmdet/core/visualization/image.py:28 (imshow_det_bboxes), :188
  (versatile_imshow_det_bboxes with per-det uncertainty column)
* mmdet/models/dense_heads/Lambda_L2.py:434-487 (DrawUncertainty:
  per-level lambda / epistemic heatmaps)

Host-side numpy/cv2; consumes the framework's normalized canvases or
raw images.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..data.voc import VOC_CLASSES

_PALETTE = [(np.array([37 * (i + 1) % 255, 91 * (i + 3) % 255, 53 * (i + 7) % 255]))
            for i in range(32)]


def denormalize(image: np.ndarray, mean, std, to_rgb: bool = True) -> np.ndarray:
    """Normalized canvas float image -> uint8 BGR for cv2 drawing."""
    img = image * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    if to_rgb:
        img = img[..., ::-1]  # stored RGB -> BGR
    return np.clip(img, 0, 255).astype(np.uint8).copy()


def draw_detections(
    img_bgr: np.ndarray,
    boxes: np.ndarray,
    labels: Optional[np.ndarray] = None,
    scores: Optional[np.ndarray] = None,
    uncertainties: Optional[np.ndarray] = None,
    class_names: Sequence[str] = VOC_CLASSES,
    score_thr: float = 0.0,
) -> np.ndarray:
    """DrawGT / imshow_det_bboxes equivalent; returns the drawn image."""
    out = img_bgr.copy()
    for i, box in enumerate(np.asarray(boxes)):
        if scores is not None and scores[i] < score_thr:
            continue
        c = _PALETTE[int(labels[i]) % len(_PALETTE)] if labels is not None else (0, 255, 0)
        c = tuple(int(v) for v in np.asarray(c).ravel()[:3])
        x1, y1, x2, y2 = box[:4].astype(int)
        cv2.rectangle(out, (x1, y1), (x2, y2), c, 2)
        parts = []
        if labels is not None:
            parts.append(str(class_names[int(labels[i])]) if int(labels[i]) < len(class_names)
                         else str(int(labels[i])))
        if scores is not None:
            parts.append(f"{scores[i]:.2f}")
        if uncertainties is not None:
            parts.append(f"u={uncertainties[i]:.3f}")
        if parts:
            cv2.putText(out, " ".join(parts), (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.45, c, 1, cv2.LINE_AA)
    return out


def heatmap(values: np.ndarray, size: Optional[tuple] = None) -> np.ndarray:
    """Scalar map -> JET heatmap image (the reference's visualize(...,
    heatmap=True)). values: [H, W]."""
    v = np.asarray(values, np.float32)
    v = (v - v.min()) / (v.max() - v.min() + 1e-12)
    hm = cv2.applyColorMap((v * 255).astype(np.uint8), cv2.COLORMAP_JET)
    if size is not None:
        hm = cv2.resize(hm, (size[1], size[0]), interpolation=cv2.INTER_NEAREST)
    return hm


def save_image(img: np.ndarray, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, img)


def dump_level_heatmaps(
    per_anchor_values: np.ndarray,
    featmap_sizes: Sequence[tuple],
    num_anchors: int,
    out_dir: str,
    prefix: str = "unc",
    canvas: Optional[tuple] = None,
    reduce: str = "max",
):
    """DrawUncertainty-style dumps: flattened per-anchor values [A_tot]
    -> one heatmap per pyramid level (max or mean over anchors/cell)."""
    off = 0
    red = {"max": np.max, "mean": np.mean}[reduce]
    for li, (h, w) in enumerate(featmap_sizes):
        n = h * w * num_anchors
        v = per_anchor_values[off:off + n].reshape(h, w, num_anchors)
        hm = heatmap(red(v, axis=-1), size=canvas)
        save_image(hm, os.path.join(out_dir, f"{prefix}_level{li}.jpg"))
        off += n
