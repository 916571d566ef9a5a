"""Fixed-shape batch containers (pytrees).

The reference moves data as DataContainer lists with per-image ragged GT
(mmcv collate/scatter); here every batch is a rectangular pytree: GT
padded to max_gt with a validity mask, anchor validity precomputed from
each image's pad extent (ops/anchors.anchor_valid_flags).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Batch(NamedTuple):
    """Training batch."""

    images: jnp.ndarray        # [B, H, W, 3] float32, normalized, canvas-padded
    gt_boxes: jnp.ndarray      # [B, G, 4] float32 in resized-image coords
    gt_labels: jnp.ndarray     # [B, G] int32
    gt_valid: jnp.ndarray      # [B, G] bool
    anchor_valid: jnp.ndarray  # [B, A_tot] bool (pad-region mask)
    img_shapes: jnp.ndarray    # [B, 2] int32 (h, w) resized shape (decode clip)


class EvalBatch(NamedTuple):
    """Inference batch (eval mAP or pool scoring)."""

    images: jnp.ndarray        # [B, H, W, 3]
    img_shapes: jnp.ndarray    # [B, 2] resized (h, w)
    scale_factors: jnp.ndarray  # [B, 4] (w_s, h_s, w_s, h_s) resize scales
    valid: jnp.ndarray         # [B] bool — padding rows in the last pool batch
