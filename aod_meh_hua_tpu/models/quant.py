"""Dynamic int8 post-training quantization for the scoring backbone.

No reference equivalent (the reference scores in fp32); this is the
TPU perf lever VERDICT r2 #5 asked for: v5e's MXU runs int8 at 2x the
bf16 peak (394 TOPS vs 197 TFLOP/s), and the score step is
backbone-conv-bound (docs/ARCHITECTURE.md roofline: 171 ms of the
401 ms batch-128 step). Scheme:

* weights: symmetric per-output-channel int8, quantized from the live
  f32 params at trace time (XLA folds the quantization of the frozen
  weights into constants after the first step);
* activations: symmetric per-tensor DYNAMIC int8 (absmax each call) —
  no calibration pass, no extra state, works on any checkpoint;
* accumulation in int32 on the MXU, dequantize by x_scale * w_scale.

Gated by the selection-parity test
(tests/test_learnability.py::test_int8_scoring_preserves_acquisition):
int8 is an EVAL/SCORING mode only — training never sees it.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray,
              strides: Tuple[int, int], padding, out_dtype) -> jnp.ndarray:
    """int8 x int8 -> int32 NHWC/HWIO conv with dequantize."""
    k32 = kernel.astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(k32), axis=(0, 1, 2)), 1e-12) / 127.0
    w_q = jnp.round(k32 / w_scale).astype(jnp.int8)
    x32 = x.astype(jnp.float32)
    x_scale = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (x_scale * w_scale)).astype(out_dtype)


class Int8Conv(nn.Module):
    """Drop-in for nn.Conv(use_bias=False) with the IDENTICAL parameter
    tree ({kernel: [kh, kw, in, out] f32}), so checkpoints and the
    torchvision converter are oblivious to the flag."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        return int8_conv(x, kernel, self.strides, self.padding, self.dtype)
