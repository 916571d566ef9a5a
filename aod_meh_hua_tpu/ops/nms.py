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


def _compact_keep(keep: jnp.ndarray, max_out: int):
    """Pack the kept candidates (already score-ordered) into the first
    `max_out` slots WITHOUT a sort: position = running count of kept.
    Returns (slots [max_out] int32, ok [max_out] bool)."""
    k = keep.shape[0]
    pos = jnp.cumsum(keep) - 1  # [k], position of each kept candidate
    tgt = jnp.where(keep & (pos < max_out), pos, max_out).astype(jnp.int32)
    slots = jnp.zeros((max_out,), jnp.int32).at[tgt].set(
        jnp.arange(k, dtype=jnp.int32), mode="drop")
    ok = jnp.arange(max_out) < keep.sum()
    return slots, ok


def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    score_thr: float,
    iou_thr: float,
    max_out: int,
    pre_nms_cands: int = 1000,
    fast_topk: bool = False,
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
    if fast_topk and n * c > k:
        # approx bin-reduce + exact top-k of the reduced set (sorted desc)
        top_scores, top_idx = jax.lax.approx_max_k(cand, k, recall_target=0.99)
    else:
        top_scores, top_idx = jax.lax.top_k(cand, k)
    anchor_idx = (top_idx // c).astype(jnp.int32)
    labels = (top_idx % c).astype(jnp.int32)
    cand_boxes = boxes[anchor_idx, labels] if boxes.ndim == 3 else boxes[anchor_idx]
    cand_ok = top_scores > score_thr

    # class-offset trick: boxes of different classes never overlap
    max_coord = jnp.max(jnp.where(cand_ok[:, None], cand_boxes, 0.0))
    offsets = labels.astype(boxes.dtype) * (max_coord + 1.0)
    off_boxes = cand_boxes + offsets[:, None]

    keep = _greedy_keep_sorted(off_boxes, cand_ok, iou_thr)
    slots, ok = _compact_keep(keep, max_out)
    out_boxes = jnp.where(ok[:, None], cand_boxes[slots], 0.0)
    out_scores = jnp.where(ok, top_scores[slots], 0.0)
    out_labels = jnp.where(ok, labels[slots], 0).astype(jnp.int32)
    out_anchor = jnp.where(ok, anchor_idx[slots], 0).astype(jnp.int32)
    return NMSResult(out_boxes, out_scores, out_labels, ok, out_anchor)


def _greedy_keep_sorted(off_boxes: jnp.ndarray, cand_ok: jnp.ndarray,
                        iou_thr: float) -> jnp.ndarray:
    """Exact greedy-NMS keep mask for candidates ALREADY sorted by
    descending score.

    Greedy NMS is the unique fixpoint of
        keep[i] = ok[i] and not exists j < i: keep[j] and IoU(i, j) > thr
    (induction over the sorted index). Iterating that map from
    keep = ok converges to the fixpoint — index 0 is stable after one
    step and each further step extends the stable prefix — in practice
    within the suppression-chain depth (a handful of steps), far fewer
    than the max_out sequential iterations of an explicit greedy loop.
    Each step is one dense [k, k] masked reduction instead of a serial
    argmax + row-IoU, which is what makes it fast on the VPU.
    """
    k = off_boxes.shape[0]
    earlier = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]  # j < i
    if k <= 2048:
        # materialize the [k, k] suppression mask once (4 MB at k=1000)
        iou = bbox_overlaps(off_boxes, off_boxes)
        sup = (iou > iou_thr) & earlier  # sup[j, i]: kept j suppresses i

        def suppressed_by(keep):
            return jnp.any(keep[:, None] & sup, axis=0)
    else:
        # large candidate sets (RPN proposals): recompute the IoU inside
        # each closure step so XLA fuses it into the reduction instead of
        # holding a k^2 buffer per batch lane
        def suppressed_by(keep):
            iou = bbox_overlaps(off_boxes, off_boxes)
            return jnp.any(keep[:, None] & (iou > iou_thr) & earlier, axis=0)

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    def body(state):
        keep, _ = state
        return cand_ok & ~suppressed_by(keep), keep

    keep, _ = jax.lax.while_loop(
        cond, body, (cand_ok, jnp.zeros_like(cand_ok)))
    return keep


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
    # sort candidates by descending score (ties by original index, the
    # mmcv rule) so the suppression-closure greedy applies
    order = jnp.argsort(-jnp.where(valid, scores, _NEG_INF))
    s_boxes = boxes[order]
    s_valid = valid[order]
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    off_boxes = s_boxes + (group_ids[order].astype(boxes.dtype)
                           * (max_coord + 1.0))[:, None]

    keep = _greedy_keep_sorted(off_boxes, s_valid, iou_thr)
    kept_slots, ok = _compact_keep(keep, max_out)
    slots = order[kept_slots]  # back to original candidate indices
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
    fast_topk: bool = False,
) -> NMSResult:
    """vmapped multiclass NMS: boxes [B, N, 4], scores [B, N, C]."""
    fn = lambda b, s: multiclass_nms(b, s, score_thr, iou_thr, max_out,
                                     pre_nms_cands, fast_topk)
    return jax.vmap(fn)(boxes, scores)
