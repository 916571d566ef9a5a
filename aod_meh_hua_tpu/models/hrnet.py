"""HRNet backbone + HRFPN neck (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/backbones/hrnet.py:203 (HRNet: 2x stride-2 3x3 stem,
  bottleneck stage 1, then parallel multi-resolution branches with
  HRModule exchange units), :12 (HRModule: per-branch BasicBlock runs +
  full cross-resolution fusion — 1x1+BN+nearest-up for coarser->finer,
  stride-2 3x3+BN chains for finer->coarser, summed and relu'd), :387
  (transitions: channel-match passthrough, new branch = stride-2 chain
  from the last previous branch).
* mmdet/models/necks/hrfpn.py:12 (HRFPN: bilinear-upsample all branches
  to the finest, concat, 1x1 reduce, avg-pool pyramid, per-level 3x3).
* configs/hrnet/faster_rcnn_hrnetv2p_w{18,32}_1x_coco.py (the w-width
  family: stage channels (w, 2w), (w, 2w, 4w), (w, 2w, 4w, 8w), module
  counts (1, 4, 3), 4 BasicBlocks per branch).

BN is frozen (norm_eval=True in every detection config), so blocks are
pure conv+affine — same convention as models/resnet.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import Bottleneck


def _bn(dtype, name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=dtype,
                        name=name)


class FrozenBasicBlock(nn.Module):
    """torchvision BasicBlock with frozen BN (HRNet branches)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_bn(self.dtype, "bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _bn(self.dtype, "bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = _bn(self.dtype, "downsample_bn")(identity)
        return nn.relu(y + identity)


def _upsample_nearest(x, factor: int):
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return y.reshape(b, h * factor, w * factor, c)


class HRModule(nn.Module):
    """One exchange unit: num_blocks BasicBlocks per branch, then full
    cross-resolution fusion (hrnet.py:120-198)."""

    channels: Sequence[int]   # per-branch widths
    num_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs):
        n = len(self.channels)
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = FrozenBasicBlock(self.channels[i], dtype=self.dtype,
                                     name=f"branch{i}_block{b}")(x)
            ys.append(x)
        if n == 1:
            return ys
        fused = []
        for i in range(n):
            acc = ys[i]
            for j in range(n):
                if j == i:
                    continue
                if j > i:  # coarser -> finer: 1x1 + BN + nearest up
                    v = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"fuse{i}_{j}_conv")(ys[j])
                    v = _bn(self.dtype, f"fuse{i}_{j}_bn")(v)
                    v = _upsample_nearest(v, 2 ** (j - i))
                else:      # finer -> coarser: stride-2 3x3 chain
                    v = ys[j]
                    for k in range(i - j):
                        last = (k == i - j - 1)
                        cout = self.channels[i] if last else self.channels[j]
                        v = nn.Conv(cout, (3, 3), strides=(2, 2),
                                    padding=((1, 1), (1, 1)), use_bias=False,
                                    dtype=self.dtype,
                                    name=f"fuse{i}_{j}_conv{k}")(v)
                        v = _bn(self.dtype, f"fuse{i}_{j}_bn{k}")(v)
                        if not last:
                            v = nn.relu(v)
                acc = acc + v
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """HRNetV2p-w{width}: returns the 4 branch maps (strides 4-32,
    widths w, 2w, 4w, 8w)."""

    width: int = 32
    stage_modules: Sequence[int] = (1, 4, 3)   # stages 2-4
    num_blocks: int = 4
    stage1_blocks: int = 4
    stem_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in (1, 2):
            x = nn.Conv(self.stem_width, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(_bn(self.dtype, f"bn{i}")(x))
        # stage 1: 4 bottlenecks at width 64 (out 256)
        for b in range(self.stage1_blocks):
            x = Bottleneck(planes=self.stem_width, downsample=(b == 0),
                           dtype=self.dtype, name=f"layer1_{b}")(x)

        w = self.width
        widths = [w, 2 * w, 4 * w, 8 * w]
        xs = [x]
        for stage in (2, 3, 4):
            n = stage  # branches in this stage
            nxt = []
            for i in range(n):
                if i < len(xs):
                    v = xs[i]
                    if v.shape[-1] != widths[i]:
                        # channel-adapting transition (3x3 stride 1)
                        v = nn.Conv(widths[i], (3, 3),
                                    padding=((1, 1), (1, 1)), use_bias=False,
                                    dtype=self.dtype,
                                    name=f"trans{stage}_{i}_conv")(v)
                        v = nn.relu(_bn(self.dtype, f"trans{stage}_{i}_bn")(v))
                else:
                    # new branch: stride-2 3x3 from the last prev branch
                    v = nn.Conv(widths[i], (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)), use_bias=False,
                                dtype=self.dtype,
                                name=f"trans{stage}_{i}_conv")(xs[-1])
                    v = nn.relu(_bn(self.dtype, f"trans{stage}_{i}_bn")(v))
                nxt.append(v)
            xs = nxt
            for m in range(self.stage_modules[stage - 2]):
                xs = HRModule(widths[:n], num_blocks=self.num_blocks,
                              dtype=self.dtype,
                              name=f"stage{stage}_module{m}")(xs)
        return tuple(xs)


class HRFPN(nn.Module):
    """hrfpn.py:12 — bilinear-upsample every branch to stride 4, concat,
    1x1 reduce to out_channels, build the pyramid by avg pooling, then a
    3x3 conv per level."""

    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        base = inputs[0]
        outs = [base]
        for i in range(1, len(inputs)):
            v = inputs[i]
            f = 2 ** i
            outs.append(jax.image.resize(
                v, (v.shape[0], v.shape[1] * f, v.shape[2] * f, v.shape[3]),
                method="bilinear").astype(v.dtype))
        cat = jnp.concatenate(outs, axis=-1)
        red = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                      name="reduction_conv")(cat)
        levels = [red]
        for i in range(1, self.num_outs):
            k = 2 ** i
            levels.append(nn.avg_pool(red, (k, k), strides=(k, k)))
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"fpn_conv{i}")(lv)
            for i, lv in enumerate(levels))
