"""CornerNet: HourglassNet backbone + corner-pooled keypoint head (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/backbones/hourglass.py:1-213 — HourglassNet-104: 7x7/s2
  stem (128) + stride-2 BasicBlock to 256 (stride 4), then num_stacks
  recursive hourglass modules (downsample_times=5, stage channels
  (256, 256, 384, 384, 384, 512), stage blocks (2, 2, 2, 2, 2, 4)) with
  inter-stack 1x1 fusion and intermediate supervision outputs.
* mmdet/models/dense_heads/corner_head.py:20-81 (BiCornerPool: two
  3x3 conv+BN branches corner-pooled and summed, 1x1 shortcut, 3x3 out)
  and :157-221 (per-level tl/br heat, embedding, offset branches —
  each 3x3 ConvModule + 1x1 plain conv; heatmap bias init to prob 0.1).
* mmdet/models/detectors/cornernet.py:1 — single-stage assembly.

TPU notes: corner pooling is `ops/corner_pool.py` (associative-scan
cumulative max); BatchNorm trains (mutable batch_stats) exactly like
the CenterNet family.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.corner_pool import corner_pool
from .centernet import BasicBlock, ConvBNReLU


class ConvBN(nn.Module):
    """ConvModule(act=None): conv + BN, no activation."""

    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return x.astype(self.dtype)


class ResLayer(nn.Module):
    """n BasicBlocks, optional stride-2 + channel change on the first
    (mmdet ResLayer as used by hourglass.py)."""

    features: int
    num_blocks: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for b in range(self.num_blocks):
            x = BasicBlock(self.features,
                           stride=self.stride if b == 0 else 1,
                           dtype=self.dtype, name=f"block{b}")(x, train)
        return x


class HourglassModule(nn.Module):
    """One recursive hourglass (hourglass.py:12-90): up1 skip + stride-2
    low path, recurse (or bottleneck), decode block, nearest x2 up."""

    depth: int
    stage_channels: Sequence[int]
    stage_blocks: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_ch, next_ch = self.stage_channels[0], self.stage_channels[1]
        cur_bl, next_bl = self.stage_blocks[0], self.stage_blocks[1]
        up1 = ResLayer(cur_ch, cur_bl, dtype=self.dtype, name="up1")(x, train)
        low1 = ResLayer(next_ch, cur_bl, stride=2, dtype=self.dtype,
                        name="low1")(x, train)
        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                   self.stage_blocks[1:], dtype=self.dtype,
                                   name="low2")(low1, train)
        else:
            low2 = ResLayer(next_ch, next_bl, dtype=self.dtype,
                            name="low2")(low1, train)
        low3 = ResLayer(cur_ch, cur_bl, dtype=self.dtype, name="low3")(low2, train)
        h, w = low3.shape[-3], low3.shape[-2]
        up2 = jnp.repeat(jnp.repeat(low3, 2, axis=-3), 2, axis=-2)
        return up1 + up2


class HourglassNet(nn.Module):
    """Stem to stride 4 + stacked hourglasses with intermediate
    supervision feats; returns a list of num_stacks stride-4 maps."""

    num_stacks: int = 2
    depth: int = 5
    stage_channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Sequence[int] = (2, 2, 2, 2, 2, 4)
    stem_width: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.stage_channels[0]
        x = ConvBNReLU(self.stem_width, 7, stride=2, dtype=self.dtype,
                       name="stem_conv")(x, train)
        x = ResLayer(ch, 1, stride=2, dtype=self.dtype, name="stem_res")(x, train)

        outs = []
        inter = x
        for i in range(self.num_stacks):
            hg = HourglassModule(self.depth, self.stage_channels,
                                 self.stage_blocks, dtype=self.dtype,
                                 name=f"hg{i}")(inter, train)
            out = ConvBNReLU(ch, 3, dtype=self.dtype,
                             name=f"out_conv{i}")(hg, train)
            outs.append(out)
            if i < self.num_stacks - 1:
                a = ConvBN(ch, 1, dtype=self.dtype, name=f"inter_skip{i}")(inter, train)
                b = ConvBN(ch, 1, dtype=self.dtype, name=f"inter_remap{i}")(out, train)
                inter = nn.relu(a + b)
                inter = ResLayer(ch, 1, dtype=self.dtype,
                                 name=f"inter_res{i}")(inter, train)
        return outs


class BiCornerPool(nn.Module):
    """corner_head.py:20-81: two pooled 3x3 branches summed -> 3x3
    conv+BN, plus a 1x1 shortcut, relu, 3x3 out."""

    directions: Tuple[str, str]
    feat_channels: int = 128
    out_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d1 = ConvBNReLU(self.feat_channels, 3, dtype=self.dtype,
                        name="direction1_conv")(x, train)
        d2 = ConvBNReLU(self.feat_channels, 3, dtype=self.dtype,
                        name="direction2_conv")(x, train)
        p = corner_pool(d1, self.directions[0]) + corner_pool(d2, self.directions[1])
        after = ConvBN(self.out_channels, 3, dtype=self.dtype,
                       name="aftpool_conv")(p, train)
        short = ConvBN(self.out_channels, 1, dtype=self.dtype,
                       name="conv1")(x, train)
        y = nn.relu(after + short)
        return ConvBNReLU(self.out_channels, 3, dtype=self.dtype,
                          name="conv2")(y, train)


class _Branch(nn.Module):
    """corner_head._make_layers: 3x3 ConvModule(+ReLU, no norm) then a
    plain 1x1 conv (bias init for the heatmap branch)."""

    out_channels: int
    feat_channels: int
    bias_prob: float = 0.0  # >0: heatmap branch prior
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.feat_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv3x3")(x)
        x = nn.relu(x)
        bias_init = nn.initializers.zeros
        if self.bias_prob > 0:
            import numpy as np

            b = float(-np.log((1 - self.bias_prob) / self.bias_prob))
            bias_init = nn.initializers.constant(b)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       bias_init=bias_init, name="out")(x)


class CornerNet(nn.Module):
    """Returns per-stack (tl_heat, br_heat, tl_emb, br_emb, tl_off,
    br_off) tuples, each [B, H/4, W/4, ch]."""

    cfg: Any

    @nn.compact
    def __call__(self, images, train: bool = False):
        c = self.cfg
        dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        feats = HourglassNet(
            num_stacks=c.num_stacks, depth=c.hourglass_depth,
            stage_channels=c.stage_channels, stage_blocks=c.stage_blocks,
            stem_width=c.stem_width, dtype=dtype, name="backbone")(images, train)
        ch = c.stage_channels[0]
        outs = []
        for i, f in enumerate(feats):
            tl = BiCornerPool(("top", "left"), feat_channels=ch // 2,
                              out_channels=ch, dtype=dtype,
                              name=f"tl_pool{i}")(f, train)
            br = BiCornerPool(("bottom", "right"), feat_channels=ch // 2,
                              out_channels=ch, dtype=dtype,
                              name=f"br_pool{i}")(f, train)
            tl_heat = _Branch(c.num_classes, ch, bias_prob=0.1, dtype=dtype,
                              name=f"tl_heat{i}")(tl)
            br_heat = _Branch(c.num_classes, ch, bias_prob=0.1, dtype=dtype,
                              name=f"br_heat{i}")(br)
            tl_emb = _Branch(c.corner_emb_channels, ch, dtype=dtype,
                             name=f"tl_emb{i}")(tl)
            br_emb = _Branch(c.corner_emb_channels, ch, dtype=dtype,
                             name=f"br_emb{i}")(br)
            tl_off = _Branch(2, ch, dtype=dtype, name=f"tl_off{i}")(tl)
            br_off = _Branch(2, ch, dtype=dtype, name=f"br_off{i}")(br)
            outs.append(tuple(t.astype(jnp.float32) for t in
                              (tl_heat, br_heat, tl_emb, br_emb, tl_off, br_off)))
        return outs


def init_cornernet(cfg, key):
    import jax

    model = CornerNet(cfg)
    h, w = cfg.canvas
    variables = model.init(key, jnp.zeros((1, h, w, 3), jnp.float32))
    return model, variables
