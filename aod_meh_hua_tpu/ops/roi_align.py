"""RoIAlign as vectorized bilinear gathers — the TPU-native equivalent of
mmcv's CUDA RoIAlign kernel.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:10
  (FPN level routing by sqrt-area, finest_scale=56) — the reference's
  per-level dynamic scatter becomes a static per-level compute + masked
  select (4x gather cost, zero dynamic shapes; gathers are negligible
  next to the RoI-head matmuls).
* mmcv.ops.RoIAlign semantics with aligned=True (the mmdet>=2.0 default,
  configs/_base_/models/faster_rcnn_r50_fpn.py roi_layer): half-pixel
  offset, bilinear sampling with the torchvision edge rules (zero outside
  [-1, dim], clamp into [0, dim-1] at the border band).

Deviation (documented): the reference config uses sampling_ratio=0
(adaptive ceil(bin_size) sample points per bin — a data-dependent shape).
Static shapes are a TPU requirement, so the sample count is fixed
(default 2, detectron2's standard choice); with output_size=7 on FPN
levels the bins are ~1-2 px so 2x2 sampling is at- or above-density for
almost every RoI.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_gather(feat_flat: jnp.ndarray, h: int, w: int,
                     ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample feat (flattened [h*w, C]) at float coords (ys, xs) [N].

    torchvision/mmcv edge rules: points with y < -1 or y > h (resp. x)
    contribute zero; coords in [-1, 0] clamp to 0, [dim-1, dim] clamp to
    dim-1. Returns [N, C].
    """
    inside = (ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w)
    y = jnp.clip(ys, 0.0, h - 1.0)
    x = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1.0, h - 1.0)
    x1 = jnp.minimum(x0 + 1.0, w - 1.0)
    ly = y - y0
    lx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)

    def take(yy, xx):
        return jnp.take(feat_flat, yy * w + xx, axis=0)  # [N, C]

    val = (take(y0i, x0i) * ((1 - ly) * (1 - lx))[:, None]
           + take(y0i, x1i) * ((1 - ly) * lx)[:, None]
           + take(y1i, x0i) * (ly * (1 - lx))[:, None]
           + take(y1i, x1i) * (ly * lx)[:, None])
    return jnp.where(inside[:, None], val, 0.0)


@functools.partial(jax.jit, static_argnums=(2, 4, 5))
def roi_align(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """Single-level RoIAlign. feat [H, W, C] (one image), rois [R, 4]
    (x1, y1, x2, y2, image coords). Returns [R, out, out, C]."""
    h, w, c = feat.shape
    r = rois.shape[0]
    s = out_size
    n = max(sampling_ratio, 1)
    offset = 0.5 if aligned else 0.0

    scale = jnp.asarray(spatial_scale, rois.dtype)
    x1 = rois[:, 0] * scale - offset
    y1 = rois[:, 1] * scale - offset
    roi_w = rois[:, 2] * scale - offset - x1
    roi_h = rois[:, 3] * scale - offset - y1
    if not aligned:  # legacy mode clamps to min size 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / s
    bin_h = roi_h / s

    # sample grid: [R, S, n] per axis -> outer product into [R, S, S, n, n]
    bins = jnp.arange(s, dtype=rois.dtype)
    pts = (jnp.arange(n, dtype=rois.dtype) + 0.5) / n
    ys = y1[:, None, None] + (bins[None, :, None] + pts[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (bins[None, :, None] + pts[None, None, :]) * bin_w[:, None, None]
    # broadcast to full [R, S, S, n, n]
    yy = jnp.broadcast_to(ys[:, :, None, :, None], (r, s, s, n, n)).reshape(-1)
    xx = jnp.broadcast_to(xs[:, None, :, None, :], (r, s, s, n, n)).reshape(-1)

    vals = _bilinear_gather(feat.reshape(h * w, c), h, w, yy, xx)
    vals = vals.reshape(r, s, s, n * n, c)
    return vals.mean(axis=3)


def map_roi_levels(rois: jnp.ndarray, num_levels: int, finest_scale: int = 56) -> jnp.ndarray:
    """FPN level per RoI: floor(log2(sqrt(area) / finest_scale + 1e-6)),
    clamped to [0, num_levels-1] (single_level_roi_extractor.py:36-54)."""
    scale = jnp.sqrt(jnp.clip(rois[:, 2] - rois[:, 0], 0.0, None)
                     * jnp.clip(rois[:, 3] - rois[:, 1], 0.0, None))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: int = 56,
    routing_rois: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Single-image multi-level extraction: each RoI reads the level its
    scale maps to. Static-shape version of the reference's boolean-index
    scatter: every level is aligned over ALL rois and a [R] mask selects.
    feats: per-level [H_l, W_l, C]. Returns [R, out, out, C] (f32).
    routing_rois: optional boxes used ONLY for the level mapping — the
    reference's roi_scale_factor path routes on the ORIGINAL rois and
    aligns on the rescaled ones (single_level_roi_extractor.py forward:
    map_roi_levels before roi_rescale)."""
    lvls = map_roi_levels(rois if routing_rois is None else routing_rois,
                          len(feats), finest_scale)
    out = None
    for i, (feat, stride) in enumerate(zip(feats, strides)):
        o = roi_align(feat.astype(jnp.float32), rois, out_size,
                      1.0 / stride, sampling_ratio, True)
        sel = (lvls == i)[:, None, None, None]
        out = jnp.where(sel, o, 0.0) if out is None else out + jnp.where(sel, o, 0.0)
    return out
