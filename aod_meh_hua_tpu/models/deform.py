"""Deformable 3x3 convolution (DCN v1 / modulated v2) for backbones.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/backbones/resnet.py:109-205 (Bottleneck.with_dcn: conv2
  becomes DeformConv2d / ModulatedDeformConv2d, offsets predicted by a
  zero-initialized 3x3 conv on conv2's input, stride follows conv2)
* configs/dcn/*.py (dcn=dict(type='DCN'|'DCNv2', deform_groups=1,
  fallback_on_stride=False), stage_with_dcn=(False, True, True, True))

TPU redesign: mmcv's im2col CUDA kernel becomes 9 bilinear zero-padded
gathers, each contracted with its kernel tap on the MXU — the same
pattern as ops/ms_deform_attn.py and the RepPoints DCN. The offset conv
is zero-initialized, so at init the op IS the plain 3x3 conv (integer
sampling positions, exact); deform_groups collapses to 1 (the shipped
dconv_c3-c5 configs use 1; group4 exists for one ablation only).
Channel layout: offsets (dy, dx) interleaved per tap, then 9 mask
channels for v2 (zero-init makes any fixed layout equivalent — there
are no pretrained DCN weights to match).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# tap offsets of a 3x3 kernel relative to its center, row-major
_BASE_YX = np.array([(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                    dtype=np.float32)


def bilinear_zero(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample feat [H, W, C] at float (ys, xs) [N] with zero padding
    outside; returns [N, C]."""
    h, w, _ = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    out = None
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            yy = y0 + dy
            xx = x0 + dx
            ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            v = feat[yi, xi] * (wy * wx * ok)[:, None].astype(feat.dtype)
            out = v if out is None else out + v
    return out


class ContextBlock(nn.Module):
    """GCNet global-context block (mmcv ContextBlock; reference
    configs/gcnet/*_r{4,16}_gcb_c3-c5_*.py plug it after conv3 of the
    c3-c5 bottlenecks).

    Context modeling: a 1x1 conv -> softmax over H*W produces one
    attention-pooled feature vector; transform: 1x1 conv (C -> C/r) ->
    LayerNorm -> ReLU -> 1x1 conv (C/r -> C), added to every position
    (the default pooling_type='att', fusion_types=('channel_add',)).
    The final transform conv is zero-initialized (last_zero_init), so at
    init the block is the identity."""

    ratio: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        attn = nn.Conv(1, (1, 1), dtype=jnp.float32,
                       kernel_init=nn.initializers.normal(0.01),
                       name="conv_mask")(x.astype(jnp.float32))
        attn = jax.nn.softmax(attn.reshape(b, h * w, 1), axis=1)
        ctx = jnp.einsum("bnc,bno->boc", x.reshape(b, h * w, c).astype(jnp.float32),
                         attn)[:, 0]                       # [B, C]
        y = nn.Dense(planes, dtype=jnp.float32, name="channel_add_conv_0")(ctx)
        y = nn.LayerNorm(name="channel_add_ln")(y)
        y = nn.relu(y)
        y = nn.Dense(c, kernel_init=nn.initializers.zeros,
                     dtype=jnp.float32, name="channel_add_conv_1")(y)
        return x + y[:, None, None, :].astype(x.dtype)


class DeformableConv3x3(nn.Module):
    """3x3 deformable conv, padding 1, optional stride / v2 modulation.

    The offset branch (name 'conv_offset', zero-init — mmcv's
    init_weights) runs at the SAME stride, emitting 18 channels (v1) or
    27 (v2: 18 offsets + 9 modulation masks, sigmoid)."""

    features: int
    stride: int = 1
    modulated: bool = False
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        oh = -(-h // self.stride)
        ow = -(-w // self.stride)
        ch = 27 if self.modulated else 18
        om = nn.Conv(ch, (3, 3), strides=(self.stride, self.stride),
                     padding=((1, 1), (1, 1)),
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=jnp.float32, name="conv_offset")(
            x.astype(jnp.float32))
        off = om[..., :18]
        mask = (jax.nn.sigmoid(om[..., 18:]) if self.modulated
                else jnp.ones(om.shape[:3] + (9,), jnp.float32))

        kernel = self.param("kernel", nn.initializers.he_uniform(),
                            (9, cin, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)

        gy, gx = jnp.meshgrid(
            jnp.arange(oh, dtype=jnp.float32) * self.stride,
            jnp.arange(ow, dtype=jnp.float32) * self.stride, indexing="ij")

        def one_image(feat, o, m):
            out = jnp.zeros((oh * ow, self.features), self.dtype)
            for k in range(9):
                ys = (gy + _BASE_YX[k, 0] + o[..., 2 * k]).reshape(-1)
                xs = (gx + _BASE_YX[k, 1] + o[..., 2 * k + 1]).reshape(-1)
                sampled = bilinear_zero(feat, ys, xs)  # [oh*ow, Cin]
                sampled = sampled * m[..., k].reshape(-1, 1).astype(sampled.dtype)
                out = out + (sampled @ kernel[k].astype(sampled.dtype)
                             ).astype(self.dtype)
            return out.reshape(oh, ow, self.features)

        y = jax.vmap(one_image)(x.astype(self.dtype), off, mask)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
