"""Fixed-shape multiclass NMS for TPU.

Behavioral parity target (reference, /root/reference):
* mmdet/core/post_processing/bbox_nms.py:7 (multiclass_nms: per-class
  expansion -> score_thr filter -> batched NMS via the class-offset trick
  -> top max_per_img by score)
* mmcv's CUDA nms semantics (greedy by descending score, suppress when
  IoU > iou_threshold, ties by original index).

TPU redesign: no dynamic shapes anywhere. The (anchor, class) candidate
set is capped at `pre_nms_cands` by top-k (the reference keeps every
candidate above score_thr; with max_per_img=100 and softmax scores the
top-1000 cap is selection-equivalent in practice), and the greedy loop
runs a static `max_out` iterations over a masked candidate array. The
whole thing vmaps over the batch and lives inside the jitted eval/score
steps — zero host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bbox import bbox_overlaps

_NEG_INF = -1e10


class NMSResult(NamedTuple):
    boxes: jnp.ndarray    # [K, 4] (x1, y1, x2, y2)
    scores: jnp.ndarray   # [K]
    labels: jnp.ndarray   # [K] int32 class ids (0-based, no background)
    valid: jnp.ndarray    # [K] bool
    anchor_idx: jnp.ndarray  # [K] int32 index into the input box array


def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    score_thr: float,
    iou_thr: float,
    max_out: int,
    pre_nms_cands: int = 1000,
) -> NMSResult:
    """Single-image multiclass NMS with static output shape [max_out].

    Args:
      boxes: [N, 4] shared across classes, or [N, C, 4] class-specific
        (the reference's multiclass_nms accepts both, bbox_nms.py:28-34 —
        the RoI head regresses one box per class); scores: [N, C]
        foreground class scores (background already stripped — the
        reference drops the dummy BG column).
    """
    n, c = scores.shape
    flat = scores.reshape(-1)  # pair (anchor, class): idx = anchor * C + class
    cand = jnp.where(flat > score_thr, flat, _NEG_INF)
    k = min(pre_nms_cands, n * c)
    top_scores, top_idx = jax.lax.top_k(cand, k)
    anchor_idx = (top_idx // c).astype(jnp.int32)
    labels = (top_idx % c).astype(jnp.int32)
    cand_boxes = boxes[anchor_idx, labels] if boxes.ndim == 3 else boxes[anchor_idx]
    cand_ok = top_scores > score_thr

    # class-offset trick: boxes of different classes never overlap
    max_coord = jnp.max(jnp.where(cand_ok[:, None], cand_boxes, 0.0))
    offsets = labels.astype(boxes.dtype) * (max_coord + 1.0)
    off_boxes = cand_boxes + offsets[:, None]

    def body(i, state):
        alive, out_slot, out_ok = state
        masked = jnp.where(alive & cand_ok, top_scores, _NEG_INF)
        best = jnp.argmax(masked)  # candidates sorted desc -> first alive
        ok = masked[best] > _NEG_INF * 0.5
        iou = bbox_overlaps(off_boxes[best][None, :], off_boxes)[0]  # [k]
        suppress = iou > iou_thr  # self-IoU = 1 removes `best` as well
        alive = alive & jnp.where(ok, ~suppress, True)
        alive = alive.at[best].set(False)
        out_slot = out_slot.at[i].set(best.astype(jnp.int32))
        out_ok = out_ok.at[i].set(ok)
        return alive, out_slot, out_ok

    alive0 = jnp.ones((k,), dtype=bool)
    slots0 = jnp.zeros((max_out,), dtype=jnp.int32)
    ok0 = jnp.zeros((max_out,), dtype=bool)
    _, slots, ok = jax.lax.fori_loop(0, max_out, body, (alive0, slots0, ok0))

    out_boxes = jnp.where(ok[:, None], cand_boxes[slots], 0.0)
    out_scores = jnp.where(ok, top_scores[slots], 0.0)
    out_labels = jnp.where(ok, labels[slots], 0).astype(jnp.int32)
    out_anchor = jnp.where(ok, anchor_idx[slots], 0).astype(jnp.int32)
    return NMSResult(out_boxes, out_scores, out_labels, ok, out_anchor)


def grouped_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    group_ids: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thr: float,
    max_out: int,
) -> NMSResult:
    """Single-class greedy NMS where boxes with different group ids never
    suppress each other (mmcv batched_nms semantics with `idxs`; the
    reference's RPN runs it with FPN level ids, rpn_head.py:169-171, and
    its multiclass path with class ids). Fixed shapes: boxes [N, 4],
    scores [N], group_ids [N] int, valid [N] -> NMSResult[max_out];
    `labels` in the result carries the group id."""
    n = boxes.shape[0]
    cand_scores = jnp.where(valid, scores, _NEG_INF)
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    off_boxes = boxes + (group_ids.astype(boxes.dtype) * (max_coord + 1.0))[:, None]

    def body(i, state):
        alive, out_slot, out_ok = state
        masked = jnp.where(alive, cand_scores, _NEG_INF)
        best = jnp.argmax(masked)
        ok = masked[best] > _NEG_INF * 0.5
        iou = bbox_overlaps(off_boxes[best][None, :], off_boxes)[0]
        suppress = iou > iou_thr
        alive = alive & jnp.where(ok, ~suppress, True)
        alive = alive.at[best].set(False)
        out_slot = out_slot.at[i].set(best.astype(jnp.int32))
        out_ok = out_ok.at[i].set(ok)
        return alive, out_slot, out_ok

    alive0 = jnp.ones((n,), dtype=bool)
    slots0 = jnp.zeros((max_out,), dtype=jnp.int32)
    ok0 = jnp.zeros((max_out,), dtype=bool)
    _, slots, ok = jax.lax.fori_loop(0, max_out, body, (alive0, slots0, ok0))

    out_boxes = jnp.where(ok[:, None], boxes[slots], 0.0)
    out_scores = jnp.where(ok, scores[slots], 0.0)
    out_groups = jnp.where(ok, group_ids[slots], 0).astype(jnp.int32)
    out_idx = jnp.where(ok, slots, 0).astype(jnp.int32)
    return NMSResult(out_boxes, out_scores, out_groups, ok, out_idx)


def batched_multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    score_thr: float,
    iou_thr: float,
    max_out: int,
    pre_nms_cands: int = 1000,
) -> NMSResult:
    """vmapped multiclass NMS: boxes [B, N, 4], scores [B, N, C]."""
    fn = lambda b, s: multiclass_nms(b, s, score_thr, iou_thr, max_out, pre_nms_cands)
    return jax.vmap(fn)(boxes, scores)
