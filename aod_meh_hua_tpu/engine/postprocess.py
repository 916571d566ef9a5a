"""Shared inference post-processing: score transform, per-level top-k,
box decoding — the jax equivalent of Lambda_L2._get_bboxes's front half.

Behavioral parity target (reference, /root/reference):
* mmdet/models/dense_heads/Lambda_L2.py:264-304 — for the live 'relu'
  activation: alphas = softmax(cls_score); S = sum(alphas) + 1e-20;
  scores = alphas / (S + 1e-9); per-level top nms_pre candidates by
  max foreground score; decode deltas clipped to the resized img shape.

All shapes static: level l contributes min(nms_pre, A_l) candidates.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import AnchorGenerator
from ..ops.bbox import delta_decode
from ..utils.config import RetinaNetConfig


class Candidates(NamedTuple):
    scores: jnp.ndarray   # [B, K, C] transformed class scores (~softmax)
    boxes: jnp.ndarray    # [B, K, 4] decoded, clipped to img shape
    lambdas: Optional[jnp.ndarray]  # [B, K] MEH lambda (None without MEH)
    bounds: Tuple[Tuple[int, int], ...]  # static per-level (start, end) in K


def transform_scores(cls_scores: jnp.ndarray) -> jnp.ndarray:
    """'relu'-activation eval transform (Lambda_L2.py:268-273)."""
    alphas = jax.nn.softmax(cls_scores, axis=-1)
    s = alphas.sum(axis=-1, keepdims=True) + 1e-20
    return alphas / (s + 1e-9)


def make_candidate_selector(cfg: RetinaNetConfig):
    gen = AnchorGenerator(
        strides=cfg.anchor.strides, ratios=cfg.anchor.ratios,
        octave_base_scale=cfg.anchor.octave_base_scale,
        scales_per_octave=cfg.anchor.scales_per_octave,
    )
    level_anchors = [jnp.asarray(a) for a in gen.grid_anchors(cfg.featmap_sizes())]
    bounds = cfg.level_bounds()
    topk_bounds = tuple(cfg.topk_level_bounds())
    nms_pre = cfg.test.nms_pre

    def select(
        cls_scores: jnp.ndarray,
        bbox_preds: jnp.ndarray,
        lambdas: Optional[jnp.ndarray],
        img_shapes: jnp.ndarray,
        use_topk: bool = True,
    ) -> Candidates:
        out_scores, out_boxes, out_lam = [], [], []
        for li, (s0, s1) in enumerate(bounds):
            scores = transform_scores(cls_scores[:, s0:s1])
            preds = bbox_preds[:, s0:s1]
            anchors = level_anchors[li]
            lam = lambdas[:, s0:s1] if lambdas is not None else None
            n = s1 - s0
            if use_topk and n > nms_pre:
                max_scores = scores.max(axis=-1)
                _, idx = jax.lax.top_k(max_scores, nms_pre)  # [B, k]
                scores = jnp.take_along_axis(scores, idx[..., None], axis=1)
                preds = jnp.take_along_axis(preds, idx[..., None], axis=1)
                anchors = anchors[idx]  # [B, k, 4]
                if lam is not None:
                    lam = jnp.take_along_axis(lam, idx, axis=1)
            else:
                anchors = jnp.broadcast_to(anchors[None], (scores.shape[0],) + anchors.shape)
            boxes = delta_decode(
                anchors, preds, means=cfg.target_means, stds=cfg.target_stds,
                max_shape=img_shapes,
            )
            out_scores.append(scores)
            out_boxes.append(boxes)
            if lam is not None:
                out_lam.append(lam)
        cand_lam = jnp.concatenate(out_lam, axis=1) if out_lam else None
        b = topk_bounds if use_topk else tuple(bounds)
        return Candidates(
            jnp.concatenate(out_scores, axis=1), jnp.concatenate(out_boxes, axis=1), cand_lam, b
        )

    return select
