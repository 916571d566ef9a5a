"""Alternative backbones: ResNeXt, Res2Net, RegNet (Flax, NHWC,
frozen-BN inference statistics — the live AL convention, resnet.py).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/backbones/resnext.py:11-90 — grouped 3x3 conv2 with
  width = floor(planes * base_width / 64) * groups (x101: 32x4d/64x4d).
* mmdet/models/backbones/res2net.py:20-235 — Bottle2neck: 1x1 to
  width*scales, hierarchical (scales-1) 3x3 convs over channel splits
  with running-sum reuse ('normal' blocks) or fresh splits + avg-pooled
  last split ('stage' blocks); avg_down downsample path
  (AvgPool + 1x1); res2net50-26w4s configs/res2net/*.py.
* mmdet/models/backbones/regnet.py:12-355 — widths from the quantized
  log-linear schedule (w0, wa, wm, depth), per-stage group widths
  adjusted for divisibility, expansion-1 bottlenecks with grouped 3x3,
  32-wide 3x3/2 stem with NO maxpool (regnetx-3.2GF etc.,
  configs/regnet/*.py).

TPU notes: grouped convs lower to XLA feature_group_count (MXU-tiled
natively); the Res2Net split hierarchy is a static python loop over
`scales` slices, fully unrolled and fused by XLA — no dynamic shapes.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _bn(name, dtype):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=dtype,
                        name=name)


def _conv(feat, k, stride, pad, name, dtype, groups=1):
    return nn.Conv(feat, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=False,
                   feature_group_count=groups, dtype=dtype, name=name)


class ResNeXtBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 32
    base_width: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # max(1, .) guards the shrunken test configs (planes < 64);
        # at reference widths it is the exact resnext.py:31 formula
        width = (self.planes if self.groups == 1 else
                 max(1, math.floor(self.planes * (self.base_width / 64)))
                 * self.groups)
        identity = x
        y = _conv(width, 1, 1, 0, "conv1", self.dtype)(x)
        y = nn.relu(_bn("bn1", self.dtype)(y))
        y = _conv(width, 3, self.stride, 1, "conv2", self.dtype,
                  groups=self.groups)(y)
        y = nn.relu(_bn("bn2", self.dtype)(y))
        y = _conv(self.planes * 4, 1, 1, 0, "conv3", self.dtype)(y)
        y = _bn("bn3", self.dtype)(y)
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride, 0,
                             "downsample_conv", self.dtype)(x)
            identity = _bn("downsample_bn", self.dtype)(identity)
        return nn.relu(y + identity)


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    stage_block: bool = False  # first block of a stage
    scales: int = 4
    base_width: int = 26
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = max(1, int(math.floor(self.planes * (self.base_width / 64))))
        s = self.scales
        identity = x
        y = _conv(width * s, 1, 1, 0, "conv1", self.dtype)(x)
        y = nn.relu(_bn("bn1", self.dtype)(y))

        spx = [y[..., i * width:(i + 1) * width] for i in range(s)]
        outs = []
        sp = None
        for i in range(s - 1):
            sp = spx[i] if (self.stage_block or i == 0) else sp + spx[i]
            sp = _conv(width, 3, self.stride if self.stage_block else 1, 1,
                       f"conv2_{i}", self.dtype)(sp)
            # NOTE: 'normal' blocks always have conv2_stride 1; only the
            # stage block strides (res2net.py:120-135)
            sp = nn.relu(_bn(f"bn2_{i}", self.dtype)(sp))
            outs.append(sp)
        last = spx[s - 1]
        if self.stage_block and self.stride != 1:
            last = nn.avg_pool(last, (3, 3), strides=(self.stride,) * 2,
                               padding=((1, 1), (1, 1)),
                               count_include_pad=False)
        outs.append(last)
        y = jnp.concatenate(outs, axis=-1)

        y = _conv(self.planes * 4, 1, 1, 0, "conv3", self.dtype)(y)
        y = _bn("bn3", self.dtype)(y)
        if self.downsample:
            # avg_down path (Res2Layer: AvgPool(ceil) + 1x1 + BN)
            idt = x
            if self.stride != 1:
                idt = nn.avg_pool(idt, (self.stride,) * 2,
                                  strides=(self.stride,) * 2,
                                  padding="SAME",
                                  count_include_pad=False)
            idt = _conv(self.planes * 4, 1, 1, 0, "downsample_conv",
                        self.dtype)(idt)
            identity = _bn("downsample_bn", self.dtype)(idt)
        return nn.relu(y + identity)


class ResNeXt(nn.Module):
    """Grouped-conv ResNet; returns (C2..C5). Same stem as ResNet."""

    block_counts: Sequence[int] = (3, 4, 23, 3)  # x101 default
    stem_width: int = 64
    groups: int = 32
    base_width: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = _conv(self.stem_width, 7, 2, 3, "conv1", self.dtype)(x)
        x = nn.relu(_bn("bn1", self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for stage, n in enumerate(self.block_counts):
            planes = self.stem_width * (2 ** stage)
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = ResNeXtBottleneck(
                    planes=planes, stride=stride, downsample=(b == 0),
                    groups=self.groups, base_width=self.base_width,
                    dtype=self.dtype, name=f"layer{stage + 1}_{b}")(x)
            outs.append(x)
        return tuple(outs)


class Res2Net(nn.Module):
    """Res2Net-50/101 (26w x 4s default); returns (C2..C5)."""

    block_counts: Sequence[int] = (3, 4, 6, 3)
    stem_width: int = 64
    scales: int = 4
    base_width: int = 26
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = _conv(self.stem_width, 7, 2, 3, "conv1", self.dtype)(x)
        x = nn.relu(_bn("bn1", self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for stage, n in enumerate(self.block_counts):
            planes = self.stem_width * (2 ** stage)
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Bottle2neck(
                    planes=planes, stride=stride, downsample=(b == 0),
                    stage_block=(b == 0), scales=self.scales,
                    base_width=self.base_width, dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}")(x)
            outs.append(x)
        return tuple(outs)


REGNET_ARCHS = {
    # regnet.py:70-87 arch_settings (bot_mul = 1.0 throughout)
    "regnetx_400mf": dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22),
    "regnetx_800mf": dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16),
    "regnetx_1.6gf": dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18),
    "regnetx_3.2gf": dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25),
    "regnetx_4.0gf": dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23),
    "regnetx_6.4gf": dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17),
    "regnetx_8.0gf": dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23),
    "regnetx_12gf": dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19),
}


def regnet_stages(arch: dict, divisor: int = 8):
    """(stage_widths, stage_blocks, stage_groups) from the quantized
    log-linear width schedule (regnet.py:251-341)."""
    w0, wa, wm, depth = arch["w0"], arch["wa"], arch["wm"], arch["depth"]
    widths_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = (np.round(widths / divisor) * divisor).astype(int).tolist()
    diff = [w != p for w, p in zip(widths + [0], [0] + widths)]
    stage_widths = [w for w, d in zip(widths, diff[:-1]) if d]
    stage_blocks = np.diff(
        [i for i, d in enumerate(diff) if d]).tolist()
    gw = arch["group_w"]
    groups = [min(gw, w) for w in stage_widths]
    stage_widths = [int(round(w / g) * g) for w, g in zip(stage_widths, groups)]
    return stage_widths, stage_blocks, groups


class RegNetBlock(nn.Module):
    width: int
    group_width: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = _conv(self.width, 1, 1, 0, "conv1", self.dtype)(x)
        y = nn.relu(_bn("bn1", self.dtype)(y))
        y = _conv(self.width, 3, self.stride, 1, "conv2", self.dtype,
                  groups=self.width // self.group_width)(y)
        y = nn.relu(_bn("bn2", self.dtype)(y))
        y = _conv(self.width, 1, 1, 0, "conv3", self.dtype)(y)
        y = _bn("bn3", self.dtype)(y)
        if self.downsample:
            identity = _conv(self.width, 1, self.stride, 0,
                             "downsample_conv", self.dtype)(x)
            identity = _bn("downsample_bn", self.dtype)(identity)
        return nn.relu(y + identity)


class RegNet(nn.Module):
    """RegNetX; 32-wide 3x3/2 stem, NO maxpool, every stage strides 2 —
    output strides (4, 8, 16, 32) like ResNet. Returns 4 stage outputs."""

    arch: str = "regnetx_3.2gf"
    stem_width: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        widths, blocks, groups = regnet_stages(REGNET_ARCHS[self.arch])
        x = x.astype(self.dtype)
        x = _conv(self.stem_width, 3, 2, 1, "conv1", self.dtype)(x)
        x = nn.relu(_bn("bn1", self.dtype)(x))
        outs = []
        for stage, (w, n, g) in enumerate(zip(widths, blocks, groups)):
            for b in range(n):
                stride = 2 if b == 0 else 1
                x = RegNetBlock(width=w, group_width=g, stride=stride,
                                downsample=(b == 0), dtype=self.dtype,
                                name=f"layer{stage + 1}_{b}")(x)
            outs.append(x)
        return tuple(outs)


def build_backbone(cfg, dtype) -> nn.Module:
    """Config-dispatched backbone (the reference's build_backbone
    registry). cfg.backbone_type: resnet (default) | resnext | res2net |
    regnet; extra knobs read via getattr with reference defaults."""
    kind = getattr(cfg, "backbone_type", "resnet")
    if kind == "resnext":
        return ResNeXt(block_counts=cfg.block_counts,
                       stem_width=cfg.stem_width,
                       groups=getattr(cfg, "resnext_groups", 32),
                       base_width=getattr(cfg, "resnext_base_width", 4),
                       dtype=dtype, name="backbone")
    if kind == "res2net":
        return Res2Net(block_counts=cfg.block_counts,
                       stem_width=cfg.stem_width,
                       scales=getattr(cfg, "res2net_scales", 4),
                       base_width=getattr(cfg, "res2net_base_width", 26),
                       dtype=dtype, name="backbone")
    if kind == "regnet":
        return RegNet(arch=getattr(cfg, "regnet_arch", "regnetx_3.2gf"),
                      stem_width=getattr(cfg, "regnet_stem_width", 32),
                      dtype=dtype, name="backbone")
    if kind == "hrnet":
        from .hrnet import HRNet

        return HRNet(width=getattr(cfg, "hrnet_width", 32),
                     stage_modules=getattr(cfg, "hrnet_stage_modules",
                                           (1, 4, 3)),
                     num_blocks=getattr(cfg, "hrnet_num_blocks", 4),
                     stage1_blocks=getattr(cfg, "hrnet_stage1_blocks", 4),
                     stem_width=getattr(cfg, "hrnet_stem_width", 64),
                     dtype=dtype, name="backbone")
    if kind == "resnest":
        from .resnest import ResNeSt

        return ResNeSt(block_counts=cfg.block_counts,
                       stem_width=cfg.stem_width,
                       radix=getattr(cfg, "resnest_radix", 2),
                       dtype=dtype, name="backbone")
    raise ValueError(f"unknown backbone_type {kind!r}")
