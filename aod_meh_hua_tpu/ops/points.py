"""Point grids + distance-box coding for anchor-free heads (FCOS).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/anchor_free_head.py _get_points_single:
  point = (col * stride, row * stride) + stride // 2, row-major cells —
  the same layout as flatten_levels' [B, H*W, C] reshape.
* mmdet/core/bbox/transforms.py distance2bbox / bbox2distance.
* mmdet/models/dense_heads/fcos_head.py get_targets/_get_target_single:
  inside-gt test, per-level regress ranges on max(ltrb), min-area
  disambiguation, INF -> background.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

INF = 1e8


def fcos_points(featmap_sizes: Sequence[Tuple[int, int]],
                strides: Sequence[int]) -> np.ndarray:
    """Concatenated [P_tot, 2] (x, y) point centers, level-major."""
    out = []
    for (h, w), s in zip(featmap_sizes, strides):
        xs = (np.arange(w) * s + s // 2).astype(np.float32)
        ys = (np.arange(h) * s + s // 2).astype(np.float32)
        xx, yy = np.meshgrid(xs, ys)  # row-major cells
        out.append(np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
    return np.concatenate(out, axis=0)


def expand_regress_ranges(featmap_sizes, regress_ranges) -> np.ndarray:
    """Per-point [P_tot, 2] (lo, hi) range bounds."""
    out = []
    for (h, w), (lo, hi) in zip(featmap_sizes, regress_ranges):
        out.append(np.tile([[lo, hi]], (h * w, 1)).astype(np.float32))
    return np.concatenate(out, axis=0)


def distance2bbox(points: jnp.ndarray, distances: jnp.ndarray,
                  max_shape=None) -> jnp.ndarray:
    """(x, y) + (l, t, r, b) -> (x1, y1, x2, y2), optional clip."""
    x1 = points[..., 0] - distances[..., 0]
    y1 = points[..., 1] - distances[..., 1]
    x2 = points[..., 0] + distances[..., 2]
    y2 = points[..., 1] + distances[..., 3]
    if max_shape is not None:
        max_shape = jnp.asarray(max_shape)
        h = max_shape[..., 0]
        w = max_shape[..., 1]
        while h.ndim < x1.ndim:
            h = h[..., None]
            w = w[..., None]
        x1 = jnp.clip(x1, 0.0, w)
        y1 = jnp.clip(y1, 0.0, h)
        x2 = jnp.clip(x2, 0.0, w)
        y2 = jnp.clip(y2, 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def fcos_targets_single(
    points: jnp.ndarray,
    regress_ranges: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    num_classes: int,
):
    """One image's FCOS targets (vmap over the batch).

    Returns (labels [P] int32 with num_classes = background,
    bbox_targets [P, 4] ltrb distances to the assigned gt).
    """
    xs = points[:, 0][:, None]  # [P, 1]
    ys = points[:, 1][:, None]
    left = xs - gt_boxes[None, :, 0]
    top = ys - gt_boxes[None, :, 1]
    right = gt_boxes[None, :, 2] - xs
    bottom = gt_boxes[None, :, 3] - ys
    ltrb = jnp.stack([left, top, right, bottom], axis=-1)  # [P, G, 4]

    inside = ltrb.min(axis=-1) > 0
    maxreg = ltrb.max(axis=-1)
    in_range = (maxreg >= regress_ranges[:, 0:1]) & (maxreg <= regress_ranges[:, 1:2])
    areas = ((gt_boxes[:, 2] - gt_boxes[:, 0])
             * (gt_boxes[:, 3] - gt_boxes[:, 1]))[None, :]  # [1, G]
    areas = jnp.where(inside & in_range & gt_valid[None, :], areas, INF)

    min_area = areas.min(axis=1)
    argmin = areas.argmin(axis=1)
    labels = jnp.where(min_area < INF, gt_labels[argmin], num_classes).astype(jnp.int32)
    bbox_targets = jnp.take_along_axis(ltrb, argmin[:, None, None], axis=1)[:, 0]
    return labels, bbox_targets


def centerness_target(ltrb: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))) (fcos_head.py)."""
    lr = ltrb[..., 0::2]
    tb = ltrb[..., 1::2]
    num = lr.min(axis=-1) * tb.min(axis=-1)
    den = jnp.maximum(lr.max(axis=-1) * tb.max(axis=-1), 1e-12)
    return jnp.sqrt(jnp.clip(num / den, 0.0, None))
