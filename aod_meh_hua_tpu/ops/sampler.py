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
) -> SampleResult:
    """assigned: [N] mmdet encoding (-1 ignore, 0 background, g+1 -> gt g);
    valid: [N] candidate validity. Returns fixed-size SampleResult[num]."""
    kp, kn = jax.random.split(key)
    pos_mask = (assigned > 0) & valid
    neg_mask = (assigned == 0) & valid
    num_expected_pos = int(num * pos_fraction)

    pos_rank = _ranks(kp, pos_mask)
    sel_pos = pos_mask & (pos_rank < num_expected_pos)
    num_pos = jnp.minimum(pos_mask.sum(), num_expected_pos).astype(jnp.int32)

    num_neg = num - num_pos  # neg_pos_ub = -1: negatives fill the rest
    neg_rank = _ranks(kn, neg_mask)
    sel_neg = neg_mask & (neg_rank < num_neg)

    big = jnp.int32(2 ** 30)
    priority = jnp.where(sel_pos, pos_rank,
                         jnp.where(sel_neg, num + neg_rank, big))
    order = jnp.argsort(priority)[:num]
    slot_ok = priority[order] < big
    inds = jnp.where(slot_ok, order, 0).astype(jnp.int32)
    return SampleResult(inds, sel_pos[order] & slot_ok, slot_ok, num_pos)
