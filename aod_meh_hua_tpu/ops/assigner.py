"""Max-IoU assignment and dense anchor-target construction.

Behavioral parity targets (reference, /root/reference):
* mmdet/core/bbox/assigners/max_iou_assigner.py:10 (assign_wrt_overlaps,
  incl. the ordered low-quality matching of step 4)
* mmdet/models/dense_heads/L_anchor_head.py:155-202 (_get_targets_single)
* mmdet/core/bbox/samplers/pseudo_sampler.py (no sampling: all pos + neg)

Unlike the reference's per-image python loops, this runs as one dense,
fixed-shape program: GT boxes are padded to MAX_GT with a validity mask
and the whole thing vmaps over the batch inside the jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bbox import bbox_overlaps, delta_encode


def max_iou_assign(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchor_valid: jnp.ndarray | None = None,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.4,
    min_pos_iou: float = 0.0,
    gt_max_assign_all: bool = True,
    match_low_quality: bool = True,
    overlaps: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Assign each anchor a gt index following mmdet's 4-step MaxIoU rule.

    Args:
      anchors: [A, 4]; gt_boxes: [G, 4] padded; gt_valid: [G] bool;
      anchor_valid: optional [A] bool — invalid anchors are removed from
      the overlap matrix entirely (the reference assigns on the
      inside_flags subset, which matters for step-4 per-gt maxima).

    Returns assigned [A] int32 in mmdet's encoding:
      -1 ignore (neg_thr <= max_iou < pos_thr and not low-quality matched),
       0 background, g+1 assigned to gt g.

    Step 4 (low-quality matching) iterates gts in order in the reference,
    so a later gt overwrites an earlier one on ties — reproduced here by
    taking the highest matching gt index per anchor.
    """
    num_gt = gt_boxes.shape[0]
    if overlaps is None:
        overlaps = bbox_overlaps(gt_boxes, anchors)  # [G, A]
    # (ApproxMaxIoUAssigner passes per-square max-over-approx overlaps,
    # approx_max_iou_assigner.py:76-82 — the 4-step rule is unchanged)
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)
    if anchor_valid is not None:
        overlaps = jnp.where(anchor_valid[None, :], overlaps, -1.0)

    max_overlaps = overlaps.max(axis=0)  # per anchor, over valid gts (−1 if none)
    argmax_overlaps = overlaps.argmax(axis=0)

    assigned = jnp.full(anchors.shape[:1], -1, dtype=jnp.int32)
    # step 2: negatives. Reference condition: 0 <= max < neg_thr. With no
    # valid gt max_overlaps is -1 here while the reference short-circuits to
    # all-background; handle that below.
    assigned = jnp.where((max_overlaps >= 0) & (max_overlaps < neg_iou_thr), 0, assigned)
    # step 3: positives
    assigned = jnp.where(
        max_overlaps >= pos_iou_thr, argmax_overlaps.astype(jnp.int32) + 1, assigned
    )

    if match_low_quality:
        gt_max = overlaps.max(axis=1, keepdims=True)  # [G, 1]
        if gt_max_assign_all:
            cand = (overlaps == gt_max) & (gt_max >= min_pos_iou) & gt_valid[:, None]
        else:
            gt_arg = overlaps.argmax(axis=1)  # [G]
            is_arg = jnp.zeros_like(overlaps, dtype=bool)
            is_arg = is_arg.at[jnp.arange(num_gt), gt_arg].set(True)
            cand = is_arg & (gt_max >= min_pos_iou) & gt_valid[:, None]
        # last matching gt wins (reference overwrites in gt order)
        gt_ids = jnp.arange(1, num_gt + 1, dtype=jnp.int32)[:, None]
        lowq = jnp.max(jnp.where(cand, gt_ids, 0), axis=0)  # [A], 0 if none
        assigned = jnp.where(lowq > 0, lowq, assigned)

    # reference short-circuit: no gt at all -> everything background
    assigned = jnp.where(jnp.any(gt_valid), assigned, 0)
    return assigned


def atss_assign(
    anchors: jnp.ndarray,
    level_bounds,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    topk: int = 9,
    anchor_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Adaptive Training Sample Selection (reference
    mmdet/core/bbox/assigners/atss_assigner.py:assign):

    per gt, the `topk` center-closest anchors on EACH level are
    candidates; the positive IoU threshold is mean + std (sample std,
    ddof=1) of the candidate IoUs; positives additionally need their
    center strictly inside the gt (margin 0.01); an anchor claimed by
    several gts goes to the highest-IoU one.

    Dense fixed-shape version: the reference's per-level index lists
    become a [A, G] candidate mask built by per-level top-k scatters.
    Returns [A] int32 in mmdet encoding (0 background, g+1 positive).
    """
    num_gt = gt_boxes.shape[0]
    overlaps = bbox_overlaps(anchors, gt_boxes)  # [A, G]

    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    dist = jnp.sqrt((acx[:, None] - gcx[None, :]) ** 2
                    + (acy[:, None] - gcy[None, :]) ** 2)
    if anchor_valid is not None:
        # pad-region anchors can neither be candidates nor positives
        # (the reference assigns on the valid_flags subset)
        dist = jnp.where(anchor_valid[:, None], dist, jnp.inf)
        overlaps = jnp.where(anchor_valid[:, None], overlaps, -1.0)

    cand = jnp.zeros(overlaps.shape, bool)
    g_idx = jnp.arange(num_gt)[None, :]
    for (s0, s1) in level_bounds:
        k = min(topk, s1 - s0)
        _, idx = jax.lax.top_k(-dist[s0:s1].T, k)  # [G, k] closest per gt
        cand = cand.at[idx.T + s0, g_idx].set(True)
    if anchor_valid is not None:
        # a level with < topk valid anchors top-ks into the pad region;
        # drop those so the mean/std statistics see only real candidates
        # (the reference computes them on the valid_flags subset)
        cand = cand & anchor_valid[:, None]

    n_cand = cand.sum(axis=0)  # <= k * num_levels
    c_iou = jnp.where(cand, overlaps, 0.0)
    mean = c_iou.sum(axis=0) / jnp.maximum(n_cand, 1)
    var = jnp.where(cand, (overlaps - mean[None, :]) ** 2, 0.0).sum(axis=0)
    std = jnp.sqrt(var / jnp.maximum(n_cand - 1, 1))
    thr = mean + std  # [G]

    l_ = acx[:, None] - gt_boxes[None, :, 0]
    t_ = acy[:, None] - gt_boxes[None, :, 1]
    r_ = gt_boxes[None, :, 2] - acx[:, None]
    b_ = gt_boxes[None, :, 3] - acy[:, None]
    in_gt = jnp.minimum(jnp.minimum(l_, t_), jnp.minimum(r_, b_)) > 0.01

    is_pos = cand & (overlaps >= thr[None, :]) & in_gt & gt_valid[None, :]
    masked = jnp.where(is_pos, overlaps, -1.0)
    best = masked.argmax(axis=1)
    has = masked.max(axis=1) > -0.5
    return jnp.where(has, best.astype(jnp.int32) + 1, 0)


class AnchorTargets(NamedTuple):
    """Dense per-anchor training targets (all [A] / [A, ...])."""

    labels: jnp.ndarray        # int32 [A]; num_classes = background
    label_weights: jnp.ndarray  # float32 [A]; 1 for pos+neg, 0 for ignored/invalid
    bbox_targets: jnp.ndarray  # float32 [A, 4] encoded deltas (0 for non-pos)
    bbox_weights: jnp.ndarray  # float32 [A, 4]; 1 rows for pos
    num_pos: jnp.ndarray       # int32 scalar: max(#pos, 1) (reference's per-image clamp)
    gt_inds: jnp.ndarray       # int32 [A]; assigned gt index (valid where pos)


def anchor_targets(
    anchors: jnp.ndarray,
    anchor_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    num_classes: int,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.4,
    min_pos_iou: float = 0.0,
    gt_max_assign_all: bool = True,
    pos_weight: float = -1.0,
) -> AnchorTargets:
    """Single-image anchor targets; vmap over the batch.

    Mirrors _get_targets_single with allowed_border=-1 (no inside filter:
    only `anchor_valid` — the pad-region flags — gates anchors) and
    PseudoSampler (every assigned pos/neg is used). Invalid anchors get
    background label with zero weight, reproducing the reference's
    unmap(fill=num_classes) / unmap(fill=0).
    """
    assigned = max_iou_assign(
        anchors, gt_boxes, gt_valid, anchor_valid=anchor_valid,
        pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
        min_pos_iou=min_pos_iou, gt_max_assign_all=gt_max_assign_all,
    )
    pos = (assigned > 0) & anchor_valid
    neg = (assigned == 0) & anchor_valid

    gt_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
    matched_gt = gt_boxes[gt_idx]
    labels = jnp.where(pos, gt_labels[gt_idx], num_classes).astype(jnp.int32)
    pos_w = 1.0 if pos_weight <= 0 else float(pos_weight)
    label_weights = jnp.where(pos, pos_w, 0.0) + jnp.where(neg, 1.0, 0.0)

    deltas = delta_encode(anchors, matched_gt, means=target_means, stds=target_stds, eps=1e-6)
    bbox_targets = jnp.where(pos[:, None], deltas, 0.0)
    bbox_weights = jnp.where(pos[:, None], 1.0, 0.0) * jnp.ones((1, 4), deltas.dtype)

    num_pos = jnp.maximum(pos.sum().astype(jnp.int32), 1)
    return AnchorTargets(labels, label_weights.astype(jnp.float32),
                         bbox_targets.astype(jnp.float32),
                         bbox_weights.astype(jnp.float32), num_pos,
                         gt_idx.astype(jnp.int32))


def region_assign(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchor_valid: jnp.ndarray,
    level_ids: jnp.ndarray,
    anchor_strides: jnp.ndarray,
    feat_wh: jnp.ndarray,
    anchor_scale: float,
    base_stride: float,
    num_lvls: int,
    center_ratio: float = 0.2,
    ignore_ratio: float = 0.5,
) -> jnp.ndarray:
    """RegionAssigner (reference mmdet/core/bbox/assigners/
    region_assigner.py:57): each gt claims anchors at ONE pyramid level —
    the level whose base anchor size best matches sqrt(gt area) — marking
    anchor centers inside the shrunken `center_ratio` region positive and
    the larger `ignore_ratio` region (own level AND the two adjacent
    levels) ignored.

    The reference loops gts sequentially, so a later gt overwrites an
    earlier one; reproduced densely by taking, per anchor, the
    highest-index gt that touched it (pos or own-level ignore), with the
    accumulated adjacent-level ignore flags and the validity mask applied
    afterwards exactly as the reference's trailing steps 4-5.

    Args:
      anchors: [A, 4] flat multi-level anchors (single anchor per cell);
      level_ids / anchor_strides / feat_wh: per-anchor level index,
        stride, and (w, h) featmap clamp bounds — static host tables;
      anchor_scale / base_stride: cfg scale and stride of level 0.

    Returns assigned [A] int32: -1 ignore, 0 background, g+1 positive.
    """
    r1 = (1.0 - center_ratio) / 2.0
    r2 = (1.0 - ignore_ratio) / 2.0

    gw = gt_boxes[:, 2] - gt_boxes[:, 0]
    gh = gt_boxes[:, 3] - gt_boxes[:, 1]
    scale = jnp.sqrt(jnp.maximum(gw * gh, 1e-12))
    target_lvl = jnp.floor(
        jnp.log2(scale) - jnp.log2(jnp.asarray(anchor_scale * base_stride)) + 0.5)
    target_lvl = jnp.clip(target_lvl, 0, num_lvls - 1).astype(jnp.int32)  # [G]

    s = anchor_strides  # [A]
    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5 / s
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5 / s

    def inside(ratio):
        # region of every gt evaluated at every anchor's stride, clamped
        # to that anchor's featmap bounds (calc_region semantics)
        fb = gt_boxes[:, None, :] / s[None, :, None]          # [G, A, 4]
        x1 = jnp.round((1 - ratio) * fb[..., 0] + ratio * fb[..., 2])
        y1 = jnp.round((1 - ratio) * fb[..., 1] + ratio * fb[..., 3])
        x2 = jnp.round(ratio * fb[..., 0] + (1 - ratio) * fb[..., 2])
        y2 = jnp.round(ratio * fb[..., 1] + (1 - ratio) * fb[..., 3])
        fw = feat_wh[None, :, 0]
        fh = feat_wh[None, :, 1]
        x1 = jnp.clip(x1, 0, fw)
        y1 = jnp.clip(y1, 0, fh)
        x2 = jnp.clip(x2, 0, fw)
        y2 = jnp.clip(y2, 0, fh)
        return ((acx[None, :] >= x1) & (acx[None, :] <= x2)
                & (acy[None, :] >= y1) & (acy[None, :] <= y2))  # [G, A]

    lvl_eq = target_lvl[:, None] == level_ids[None, :]            # [G, A]
    lvl_adj = jnp.abs(target_lvl[:, None] - level_ids[None, :]) == 1
    gv = gt_valid[:, None]

    pos_mat = inside(r1) & lvl_eq & gv
    ign_mat = inside(r2)
    ign_own = ign_mat & lvl_eq & gv
    ign_adj = jnp.any(ign_mat & lvl_adj & gv, axis=0)             # [A]

    num_gt = gt_boxes.shape[0]
    gt_ids = jnp.arange(1, num_gt + 1, dtype=jnp.int32)[:, None]
    touched = pos_mat | ign_own
    last = jnp.max(jnp.where(touched, gt_ids, 0), axis=0)         # [A]
    gsel = jnp.clip(last - 1, 0, num_gt - 1)
    last_is_pos = jnp.take_along_axis(pos_mat, gsel[None, :], axis=0)[0]
    assigned = jnp.where(last > 0, jnp.where(last_is_pos, last, -1), 0)
    assigned = jnp.where(ign_adj, -1, assigned)
    assigned = jnp.where(anchor_valid, assigned, -1)
    return assigned.astype(jnp.int32)
