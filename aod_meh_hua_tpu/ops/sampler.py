"""Fixed-shape random pos/neg sampling for two-stage training.

Behavioral parity target (reference, /root/reference):
* mmdet/core/bbox/samplers/random_sampler.py:10 — sample up to
  num * pos_fraction positives uniformly at random, fill the remaining
  slots with uniformly random negatives (neg_pos_ub=-1 in both live
  Faster R-CNN sampler configs).

TPU redesign: the reference's nonzero() + randperm + index_select is
dynamic-shaped; here sampling is one static program — random priorities
ranked within the positive/negative sets, a fixed [num] output slot array
(positives first, then negatives, matching the reference's target-tensor
ordering), and a validity mask for the under-full case.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampleResult(NamedTuple):
    inds: jnp.ndarray     # [num] int32 indices into the candidate array
    is_pos: jnp.ndarray   # [num] bool
    valid: jnp.ndarray    # [num] bool (False for unfilled slots)
    num_pos: jnp.ndarray  # int32 scalar


def _ranks(key: jax.Array, mask: jnp.ndarray) -> jnp.ndarray:
    """Random rank (0 = first drawn) of each True element within `mask`;
    masked-out elements get rank >= mask.sum()."""
    n = mask.shape[0]
    pri = jnp.where(mask, jax.random.uniform(key, (n,)), jnp.inf)
    order = jnp.argsort(pri)
    return jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))


def random_sample_pos_neg(
    key: jax.Array,
    assigned: jnp.ndarray,
    valid: jnp.ndarray,
    num: int,
    pos_fraction: float,
    neg_pos_ub: int = -1,
) -> SampleResult:
    """assigned: [N] mmdet encoding (-1 ignore, 0 background, g+1 -> gt g);
    valid: [N] candidate validity. Returns fixed-size SampleResult[num].
    neg_pos_ub >= 0 caps negatives at neg_pos_ub * max(1, num_pos)
    (base_sampler.sample's upper bound; Libra's RPN uses 5)."""
    kp, kn = jax.random.split(key)
    pos_mask = (assigned > 0) & valid
    neg_mask = (assigned == 0) & valid
    num_expected_pos = int(num * pos_fraction)

    pos_rank = _ranks(kp, pos_mask)
    sel_pos = pos_mask & (pos_rank < num_expected_pos)
    num_pos = jnp.minimum(pos_mask.sum(), num_expected_pos).astype(jnp.int32)

    num_neg = num - num_pos  # neg_pos_ub = -1: negatives fill the rest
    if neg_pos_ub >= 0:
        num_neg = jnp.minimum(num_neg, neg_pos_ub * jnp.maximum(num_pos, 1))
    neg_rank = _ranks(kn, neg_mask)
    sel_neg = neg_mask & (neg_rank < num_neg)

    big = jnp.int32(2 ** 30)
    priority = jnp.where(sel_pos, pos_rank,
                         jnp.where(sel_neg, num + neg_rank, big))
    order = jnp.argsort(priority)[:num]
    slot_ok = priority[order] < big
    inds = jnp.where(slot_ok, order, 0).astype(jnp.int32)
    return SampleResult(inds, sel_pos[order] & slot_ok, slot_ok, num_pos)


def _group_ranks(key: jax.Array, mask: jnp.ndarray, group_id: jnp.ndarray,
                 num_groups: int) -> jnp.ndarray:
    """Random rank (0 = first drawn) of each True element WITHIN its group;
    masked-out elements get a huge rank. group_id must be in [0, num_groups)
    for masked-in elements."""
    n = mask.shape[0]
    pri = jnp.where(mask, jax.random.uniform(key, (n,)), jnp.inf)
    order = jnp.argsort(pri)  # masked-in first, random order within
    g_sorted = jnp.where(mask[order], group_id[order], num_groups)
    onehot = jax.nn.one_hot(g_sorted, num_groups + 1, dtype=jnp.int32)
    before = jnp.cumsum(onehot, axis=0) - onehot  # same-group count before i
    rank_sorted = jnp.take_along_axis(before, g_sorted[:, None], axis=1)[:, 0]
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
    return jnp.where(mask, rank, jnp.int32(2 ** 30))


def libra_sample_pos_neg(
    key: jax.Array,
    assigned: jnp.ndarray,
    valid: jnp.ndarray,
    max_overlaps: jnp.ndarray,
    num: int,
    pos_fraction: float,
    num_gt: int,
    num_bins: int = 3,
) -> SampleResult:
    """Libra R-CNN's CombinedSampler as one static program (reference
    mmdet/core/bbox/samplers/instance_balanced_pos_sampler.py:13 +
    iou_balanced_neg_sampler.py:9 with the live config floor_thr=-1,
    floor_fraction=0, num_bins=3 — configs/libra_rcnn/*.py).

    Positives: equal share per gt instance — each positive gets a random
    rank within its gt's group; ranks < round(expected/num_gts)+1 win,
    random extras fill a shortfall, a random subset resolves an overshoot
    (all dense, no unique()/nonzero()).
    Negatives: binned by max-IoU into num_bins even intervals over
    [0, max_overlaps.max()]; int(expected/num_bins) drawn per bin via
    within-bin random ranks; random leftover negatives fill the remainder
    (the reference's extra_inds top-up).

    max_overlaps: [N] per-candidate max IoU over valid gts (the
    assigner's view; pass 0 for invalid candidates)."""
    kp1, kp2, kp3, kp4, kn1, kn2, km = jax.random.split(key, 7)
    pos_mask = (assigned > 0) & valid
    neg_mask = (assigned == 0) & valid
    num_expected_pos = int(num * pos_fraction)

    # ---- instance-balanced positives ----
    group = jnp.clip(assigned - 1, 0, num_gt - 1)
    has_pos = jnp.zeros((num_gt,), bool).at[group].max(pos_mask)
    num_gts = jnp.maximum(has_pos.sum(), 1)
    num_per_gt = (jnp.round(num_expected_pos / num_gts) + 1).astype(jnp.int32)
    g_rank = _group_ranks(kp1, pos_mask, group, num_gt)
    sel1 = pos_mask & (g_rank < num_per_gt)
    cnt1 = sel1.sum()
    extra_rank = _ranks(kp2, pos_mask & ~sel1)
    sel_grown = sel1 | (pos_mask & ~sel1
                        & (extra_rank < jnp.maximum(num_expected_pos - cnt1, 0)))
    shrink_rank = _ranks(kp3, sel1)
    sel_shrunk = sel1 & (shrink_rank < num_expected_pos)
    sel_pos = jnp.where(cnt1 < num_expected_pos, sel_grown, sel_shrunk)
    # take-all fast path: total positives fit the quota
    sel_pos = jnp.where(pos_mask.sum() <= num_expected_pos, pos_mask, sel_pos)
    num_pos = sel_pos.sum().astype(jnp.int32)

    # ---- IoU-balanced negatives ----
    num_expected_neg = num - num_pos
    max_iou = jnp.max(jnp.where(valid, max_overlaps, 0.0))
    interval = jnp.maximum(max_iou, 1e-12) / num_bins
    bin_id = jnp.floor(max_overlaps / interval).astype(jnp.int32)
    in_bins = neg_mask & (bin_id >= 0) & (bin_id < num_bins)
    per_num = (num_expected_neg // num_bins).astype(jnp.int32)
    b_rank = _group_ranks(kn1, in_bins, jnp.clip(bin_id, 0, num_bins - 1),
                          num_bins)
    sel_b = in_bins & (b_rank < per_num)
    cntb = sel_b.sum()
    nx_rank = _ranks(kn2, neg_mask & ~sel_b)
    sel_neg = sel_b | (neg_mask & ~sel_b
                       & (nx_rank < jnp.maximum(num_expected_neg - cntb, 0)))
    sel_neg = jnp.where(neg_mask.sum() <= num_expected_neg, neg_mask, sel_neg)

    # ---- pack into fixed slots, positives first ----
    pos_order = _ranks(kp4, sel_pos)
    neg_order = _ranks(km, sel_neg)
    big = jnp.int32(2 ** 30)
    priority = jnp.where(sel_pos, pos_order,
                         jnp.where(sel_neg, num + neg_order, big))
    order = jnp.argsort(priority)[:num]
    slot_ok = priority[order] < big
    inds = jnp.where(slot_ok, order, 0).astype(jnp.int32)
    return SampleResult(inds, sel_pos[order] & slot_ok, slot_ok, num_pos)
