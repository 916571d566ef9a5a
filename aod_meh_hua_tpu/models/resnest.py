"""ResNeSt backbone (Flax) — split-attention bottlenecks on a ResNetV1d
trunk.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/backbones/resnest.py:40 (SplitAttentionConv2d: grouped
  radix conv -> BN -> relu -> radix-summed GAP -> fc1/BN/relu -> fc2 ->
  radix softmax -> attention-weighted radix sum), :153 (Bottleneck:
  conv2 becomes split-attention at stride 1 with a 3x3 avg-pool
  `avd_layer` carrying the stride), :16 (RSoftmax: softmax over radix
  per group, sigmoid when radix == 1).
* ResNetV1d trunk (mmdet/models/backbones/resnet.py:ResNetV1d): deep
  3x3x3 stem (half-width first two convs) and avg-pool downsample in
  the residual shortcut.
* configs/resnest/faster_rcnn_s50_fpn_syncbn-backbone+head_*.py —
  radix 2, groups 1, base_width 4, reduction_factor 4,
  avg_down_stride True (SyncBN collapses to frozen BN here: detection
  configs run norm_eval=True).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(dtype, name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=dtype,
                        name=name)


class SplitAttentionConv(nn.Module):
    """SplitAttentionConv2d (radix splits of one grouped conv, fused by
    a learned per-channel softmax over the radix axis)."""

    channels: int
    stride: int = 1
    radix: int = 2
    groups: int = 1
    reduction_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r, c = self.radix, self.channels
        inter = max(c * r // self.reduction_factor, 32)
        y = nn.Conv(c * r, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)),
                    feature_group_count=self.groups * r, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        y = nn.relu(_bn(self.dtype, "bn0")(y))
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = splits.sum(axis=3).mean(axis=(1, 2))            # [B, C]
        gap = nn.Dense(inter, use_bias=True, dtype=self.dtype,
                       name="fc1")(gap)
        gap = nn.relu(_bn(self.dtype, "bn1")(gap))
        att = nn.Dense(c * r, use_bias=True, dtype=self.dtype,
                       name="fc2")(gap)
        if r > 1:
            # rsoftmax: softmax over radix per (group, channel)
            att = jax.nn.softmax(att.reshape(b, r, c).astype(jnp.float32),
                                 axis=1).astype(self.dtype)
        else:
            att = jax.nn.sigmoid(att).reshape(b, 1, c)
        return (splits * att[:, None, None, :, :]).sum(axis=3)


class ResNeStBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    radix: int = 2
    groups: int = 1
    reduction_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_bn(self.dtype, "bn1")(y))
        y = SplitAttentionConv(self.planes, stride=1, radix=self.radix,
                               groups=self.groups,
                               reduction_factor=self.reduction_factor,
                               dtype=self.dtype, name="conv2")(y)
        if self.stride > 1:  # avd_layer carries the stride
            y = nn.avg_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding=((1, 1), (1, 1)))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _bn(self.dtype, "bn3")(y)
        if self.downsample:
            if self.stride > 1:  # ResNetV1d avg_down shortcut
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
            identity = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                               dtype=self.dtype,
                               name="downsample_conv")(identity)
            identity = _bn(self.dtype, "downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNeSt(nn.Module):
    """ResNeSt-50 style backbone returning (C2, C3, C4, C5). Deep stem
    (V1d), avg-down shortcuts, split-attention conv2."""

    block_counts: Sequence[int] = (3, 4, 6, 3)
    stem_width: int = 64
    radix: int = 2
    groups: int = 1
    reduction_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        half = max(self.stem_width // 2, 4)
        for i, (f, s) in enumerate(((half, 2), (half, 1),
                                    (self.stem_width, 1))):
            x = nn.Conv(f, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f"stem_conv{i}")(x)
            x = nn.relu(_bn(self.dtype, f"stem_bn{i}")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for stage, n in enumerate(self.block_counts):
            planes = self.stem_width * (2 ** stage)
            for b in range(n):
                x = ResNeStBottleneck(
                    planes=planes, stride=2 if (stage > 0 and b == 0) else 1,
                    downsample=(b == 0), radix=self.radix, groups=self.groups,
                    reduction_factor=self.reduction_factor, dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}")(x)
            outs.append(x)
        return tuple(outs)
