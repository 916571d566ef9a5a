"""Shared inference post-processing: score transform, per-level top-k,
box decoding — the jax equivalent of the heads' _get_bboxes front half.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/Lambda_L2.py:264-304 — 'relu' activation:
  alphas = softmax(cls_score); S = sum(alphas) + 1e-20; scores =
  alphas / (S + 1e-9); top-k by max foreground score.
* mmdet/models/dense_heads/My_L_ssd_head.py:320-356 — 'softmax'
  activation: scores = softmax over C+1 incl. background; top-k by max
  over the FOREGROUND columns only (scores[..., :-1]).

All shapes static: level l contributes min(nms_pre, A_l) candidates.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bbox import delta_decode


class Candidates(NamedTuple):
    scores: jnp.ndarray   # [B, K, C_out] transformed class scores
    boxes: jnp.ndarray    # [B, K, 4] decoded, clipped to img shape
    lambdas: Optional[jnp.ndarray]  # [B, K] MEH lambda (None without MEH)
    bounds: Tuple[Tuple[int, int], ...]  # static per-level (start, end) in K
    max_prob: Optional[jnp.ndarray] = None  # [B] max softmax prob over ALL
    # anchors (getMaxConf) — computed inside the per-level loop from the
    # pre-top-k probabilities so the score step needs no second full-map
    # softmax pass


def transform_scores(cls_scores: jnp.ndarray, family: str = "retinanet") -> jnp.ndarray:
    if family == "ssd":
        return jax.nn.softmax(cls_scores, axis=-1)  # C+1 incl. background
    alphas = jax.nn.softmax(cls_scores, axis=-1)
    s = alphas.sum(axis=-1, keepdims=True) + 1e-20
    return alphas / (s + 1e-9)


def make_candidate_selector(cfg):
    """Returns (select, anchors_host): `select` takes the anchor table as
    a RUNTIME argument. Do NOT close over the table inside a jit: on this
    environment's TPU relay, executing a program with a large gathered
    closure-constant permanently degrades every later host->device
    transfer in the process to ~40 MB/s (measured; args stay >1 GB/s).
    Passing it as an argument also keeps mesh runs shardable."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    bounds = cfg.level_bounds()
    topk_bounds = tuple(cfg.topk_level_bounds())
    nms_pre = cfg.test.nms_pre
    family = getattr(cfg, "family", "retinanet")
    num_fg = cfg.num_fg_classes
    fast_topk = getattr(cfg.test, "fast_topk", False)

    def _topk(max_scores: jnp.ndarray, k: int):
        """Per-anchor ranking scores -> top-k indices. `fast_topk` uses
        the TPU-optimized partial reduction (jax.lax.approx_max_k,
        recall ~= 0.99 of the true top-k); exact lax.top_k (a full sort
        at k=1000) otherwise. With max_per_img=100 survivors out of
        1000 candidates, tail-rank misses are selection-neutral — the
        parity tests run exact mode."""
        if fast_topk:
            _, idx = jax.lax.approx_max_k(max_scores, k, recall_target=0.99)
            return idx
        _, idx = jax.lax.top_k(max_scores, k)
        return idx

    def select(
        all_anchors: jnp.ndarray,
        cls_scores: jnp.ndarray,
        bbox_preds: jnp.ndarray,
        lambdas: Optional[jnp.ndarray],
        img_shapes: jnp.ndarray,
        use_topk: bool = True,
    ) -> Candidates:
        out_scores, out_boxes, out_lam = [], [], []
        max_prob = None
        for li, (s0, s1) in enumerate(bounds):
            logits = cls_scores[:, s0:s1]
            preds = bbox_preds[:, s0:s1]
            anchors = all_anchors[s0:s1]
            lam = lambdas[:, s0:s1] if lambdas is not None else None
            n = s1 - s0
            if use_topk and n > nms_pre:
                # Rank in log domain so the full [B, n, C] softmax is
                # never materialized: per anchor, max fg prob =
                # exp(max fg logit - logsumexp), and log is monotone, so
                # top-k on (max fg logit - lse) IS top-k on max fg prob.
                # The two reductions fuse into the head's output read —
                # the big maps stay un-relaid-out in HBM; only the 1000
                # gathered candidates get the exact score transform.
                lse = jax.scipy.special.logsumexp(logits, axis=-1)  # [B, n]
                key = logits[..., :num_fg].max(axis=-1) - lse
                # getMaxConf rides along: softmax max over ALL classes =
                # exp(max logit - lse). (For the retina 'relu' transform
                # the transformed max differs by a constant 1/(1+eps)
                # factor — ranking-neutral, see transform_scores.)
                lvl_max = jnp.exp((logits.max(axis=-1) - lse).max(axis=-1))
                idx = _topk(key, nms_pre)  # [B, k]
                logits = jnp.take_along_axis(logits, idx[..., None], axis=1)
                preds = jnp.take_along_axis(preds, idx[..., None], axis=1)
                anchors = anchors[idx]  # [B, k, 4]
                if lam is not None:
                    lam = jnp.take_along_axis(lam, idx, axis=1)
                scores = transform_scores(logits, family)
            else:
                scores = transform_scores(logits, family)
                lvl_max = scores.reshape(scores.shape[0], -1).max(axis=-1)
                anchors = jnp.broadcast_to(anchors[None], (scores.shape[0],) + anchors.shape)
            max_prob = lvl_max if max_prob is None else jnp.maximum(max_prob, lvl_max)
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
            jnp.concatenate(out_scores, axis=1), jnp.concatenate(out_boxes, axis=1),
            cand_lam, b, max_prob,
        )

    return select, anchors_host
