"""Corner pooling (CornerNet) as log-depth cumulative maxima.

Behavioral parity target (reference, /root/reference):
* mmcv.ops.CornerPool — the CUDA kernel scans the feature map
  sequentially, propagating a running max toward the corner direction:
  top[i, j]    = max_{i' >= i} x[i', j]
  bottom[i, j] = max_{i' <= i} x[i', j]
  left[i, j]   = max_{j' >= j} x[i, j']
  right[i, j]  = max_{j' <= j} x[i, j']
  (used by mmdet/models/dense_heads/corner_head.py:BiCornerPool).

TPU-native shape: a cumulative max IS an associative scan, so
`jax.lax.associative_scan(maximum)` lowers to a log-depth tree XLA
fuses with the surrounding convs — no sequential kernel, no Pallas
needed (the op is bandwidth-trivial next to the 3x3 convs around it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_AXIS = {"top": -3, "bottom": -3, "left": -2, "right": -2}
_REVERSE = {"top": True, "bottom": False, "left": True, "right": False}


def corner_pool(x: jnp.ndarray, direction: str) -> jnp.ndarray:
    """x: [..., H, W, C] feature map; direction in
    {top, bottom, left, right}. Returns the same shape."""
    if direction not in _AXIS:
        raise ValueError(f"unknown corner-pool direction {direction!r}")
    return jax.lax.associative_scan(
        jnp.maximum, x, axis=x.ndim + _AXIS[direction],
        reverse=_REVERSE[direction])
