"""Box primitives: IoU/IoF overlaps and delta-XYWH box coding.

Behavioral parity targets (reference, /root/reference):
* mmdet/core/bbox/iou_calculators/iou2d_calculator.py (bbox_overlaps)
* mmdet/core/bbox/coder/delta_xywh_bbox_coder.py (bbox2delta:98, delta2bbox:144)

All functions are pure jax, broadcast over leading batch dims, and are
safe to vmap/jit. Boxes are (x1, y1, x2, y2) in pixels; areas use the
mmdet-2.x convention area = (x2 - x1) * (y2 - y1) (no +1).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def bbox_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of boxes [..., 4] -> [...]."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def bbox_overlaps(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    mode: str = "iou",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Pairwise overlaps between boxes1 [..., N, 4] and boxes2 [..., M, 4].

    mode='iou': intersection over union.
    mode='iof': intersection over the area of boxes1 (the candidates).

    Returns [..., N, M]. Degenerate (zero-area) boxes yield 0 rows/cols,
    matching the reference's clamp-then-divide-by-max(union, eps).
    """
    if mode not in ("iou", "iof"):
        raise ValueError(f"unsupported mode {mode!r}")
    a1 = bbox_area(boxes1)[..., :, None]  # [..., N, 1]
    a2 = bbox_area(boxes2)[..., None, :]  # [..., 1, M]

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]

    union = a1 + a2 - inter if mode == "iou" else a1 + jnp.zeros_like(a2)
    union = jnp.maximum(union, eps)
    return inter / union


def delta_encode(
    proposals: jnp.ndarray,
    gt: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    eps: float = 0.0,
) -> jnp.ndarray:
    """Encode gt boxes as (dx, dy, dw, dh) deltas w.r.t. proposals.

    Mirrors bbox2delta (delta_xywh_bbox_coder.py:98). `eps` guards the log
    for padded/degenerate rows (reference relies on valid inputs; padded GT
    rows here are masked out downstream, the guard only keeps jit NaN-free).
    """
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]

    pw = jnp.maximum(pw, eps) if eps else pw
    ph = jnp.maximum(ph, eps) if eps else ph

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(jnp.maximum(gw / pw, 1e-12))
    dh = jnp.log(jnp.maximum(gh / ph, 1e-12))
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)

    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    return (deltas - means) / stds


def delta_decode(
    rois: jnp.ndarray,
    deltas: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    max_shape=None,
    wh_ratio_clip: float = 16.0 / 1000.0,
) -> jnp.ndarray:
    """Apply (dx, dy, dw, dh) deltas to rois; optionally clip to max_shape.

    Mirrors delta2bbox (delta_xywh_bbox_coder.py:144): denormalize, clamp
    dw/dh to ±|log(wh_ratio_clip)|, shift/scale centers, clip x to [0, W]
    and y to [0, H] when max_shape=(H, W) is given. max_shape may carry
    leading batch dims matching rois' batch dims (per-image shapes).
    """
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    d = deltas * stds + means

    max_ratio = abs(math.log(wh_ratio_clip))
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)

    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]

    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)

    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5

    if max_shape is not None:
        max_shape = jnp.asarray(max_shape)
        h = max_shape[..., 0]
        w = max_shape[..., 1]
        # broadcast per-image (H, W) over the box axis
        while h.ndim < x1.ndim:
            h = h[..., None]
            w = w[..., None]
        x1 = jnp.clip(x1, 0.0, w)
        y1 = jnp.clip(y1, 0.0, h)
        x2 = jnp.clip(x2, 0.0, w)
        y2 = jnp.clip(y2, 0.0, h)

    return jnp.stack([x1, y1, x2, y2], axis=-1)


def tblr_encode(
    priors: jnp.ndarray,
    gt: jnp.ndarray,
    normalizer: float = 4.0,
) -> jnp.ndarray:
    """Encode gt boxes as (top, bottom, left, right) distances from the
    prior CENTER, normalized by the prior's height/width then by
    `normalizer`.

    Mirrors bboxes2tblr (reference
    mmdet/core/bbox/coder/tblr_bbox_coder.py:66, normalize_by_wh=True —
    the FSAF config's TBLRBBoxCoder(normalizer=4.0)).
    """
    cx = (priors[..., 0] + priors[..., 2]) * 0.5
    cy = (priors[..., 1] + priors[..., 3]) * 0.5
    w = priors[..., 2] - priors[..., 0]
    h = priors[..., 3] - priors[..., 1]
    top = (cy - gt[..., 1]) / jnp.maximum(h, 1e-6)
    bottom = (gt[..., 3] - cy) / jnp.maximum(h, 1e-6)
    left = (cx - gt[..., 0]) / jnp.maximum(w, 1e-6)
    right = (gt[..., 2] - cx) / jnp.maximum(w, 1e-6)
    return jnp.stack([top, bottom, left, right], axis=-1) / normalizer


def tblr_decode(
    priors: jnp.ndarray,
    tblr: jnp.ndarray,
    normalizer: float = 4.0,
    max_shape=None,
) -> jnp.ndarray:
    """Decode (top, bottom, left, right) distances back to x1y1x2y2.

    Mirrors tblr2bboxes (reference
    mmdet/core/bbox/coder/tblr_bbox_coder.py:119): denormalize by
    `normalizer` then by the prior's h (top/bottom) and w (left/right),
    offset from the prior center, optionally clip to (H, W)."""
    cx = (priors[..., 0] + priors[..., 2]) * 0.5
    cy = (priors[..., 1] + priors[..., 3]) * 0.5
    w = priors[..., 2] - priors[..., 0]
    h = priors[..., 3] - priors[..., 1]
    d = tblr * normalizer
    top, bottom = d[..., 0] * h, d[..., 1] * h
    left, right = d[..., 2] * w, d[..., 3] * w
    x1, y1 = cx - left, cy - top
    x2, y2 = cx + right, cy + bottom
    if max_shape is not None:
        max_shape = jnp.asarray(max_shape)
        hh = max_shape[..., 0]
        ww = max_shape[..., 1]
        while hh.ndim < x1.ndim:
            hh = hh[..., None]
            ww = ww[..., None]
        x1 = jnp.clip(x1, 0.0, ww)
        y1 = jnp.clip(y1, 0.0, hh)
        x2 = jnp.clip(x2, 0.0, ww)
        y2 = jnp.clip(y2, 0.0, hh)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
