"""NAS-FCOS model (Flax) — the searched FPN + searched head on the FCOS
criterion.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/necks/nasfcos_fpn.py:11 (adapt 1x1 BN+ReLU laterals, the
  7-ConcatCell searched DAG c22/c22/c32/c02/c42/c36/c61, outputs
  P3/P4/P5 = cell f9/f8/f7 + bilinear-resized f5, bilinear-resized back
  to the backbone strides, then 2 stride-2 extra downsamples with
  order ('act', 'norm', 'conv')).
* mmcv ops/merge_cells.py ConcatCell (not in-tree): resize both inputs
  to the larger spatial size (nearest up / max-pool down), optional
  3x3 DCNv2+BN+ReLU input convs, channel concat, and an out conv with
  order BN -> ReLU -> grouped 1x1 (groups = out_channels).
* mmdet/models/dense_heads/nasfcos_head.py:11 (the searched tower
  "dconv3x3, conv3x3, dconv3x3, conv1x1", each + GN(32) + ReLU, on both
  branches; FCOS scale/exp regression and centerness unchanged).
* configs/nas_fcos/nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco.py.

DCNv2 deform_groups=2 collapses to 1 (same precedent as the dcn
backbone configs — models/deform.py docstring). Output contract matches
models/fcos.py, so engine/fcos.py drives this model unchanged.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .deform import DeformableConv3x3
from .detector import flatten_levels
from .resnet import ResNet


def _bn(dtype, name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=dtype,
                        name=name)


def _resize_to(x, hw):
    h, w = hw
    if x.shape[1:3] == (h, w):
        return x
    if x.shape[1] > h:  # downsample: max pool to size
        kh, kw = x.shape[1] // h, x.shape[2] // w
        return nn.max_pool(x, (kh, kw), strides=(kh, kw))
    fy, fx = h // x.shape[1], w // x.shape[2]
    b, hh, ww, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, hh, fy, ww, fx, c))
    return y.reshape(b, hh * fy, ww * fx, c)


class ConcatCell(nn.Module):
    """mmcv ConcatCell: optional DCNv2+BN+ReLU input convs at each
    input's NATIVE resolution, then resize both to the larger size,
    concat, BN -> ReLU -> grouped 1x1 out conv. Conv-before-resize
    matches BaseMergeCell.forward (input1_conv/input2_conv run before
    _resize) — convolving the native map and nearest-upsampling is both
    the reference behavior and up to 16x fewer DCN FLOPs per coarse
    input than convolving the blown-up map."""

    channels: int
    with_input1_conv: bool = True
    with_input2_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        hw = (max(x1.shape[1], x2.shape[1]), max(x1.shape[2], x2.shape[2]))

        def in_conv(v, name):
            v = DeformableConv3x3(self.channels, modulated=True,
                                  use_bias=True, dtype=self.dtype,
                                  name=f"{name}_dcn")(v)
            return nn.relu(_bn(self.dtype, f"{name}_bn")(v))

        if self.with_input1_conv:
            x1 = in_conv(x1, "in1")
        if self.with_input2_conv:
            x2 = in_conv(x2, "in2")
        x1 = _resize_to(x1, hw)
        x2 = _resize_to(x2, hw)
        y = jnp.concatenate([x1, x2], axis=-1)
        y = nn.relu(_bn(self.dtype, "out_bn")(y))
        return nn.Conv(self.channels, (1, 1), use_bias=False,
                       feature_group_count=self.channels, dtype=self.dtype,
                       name="out_conv")(y)


class NASFCOSFPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        # inputs: (c2, c3, c4, c5); start_level 1 -> laterals on c3-c5
        feats = []
        for i in range(1, 4):
            v = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"adapt_{i - 1}")(inputs[i])
            feats.append(nn.relu(_bn(self.dtype, f"adapt_bn_{i - 1}")(v)))

        # searched DAG (module name 'cXY' merges feats[X] and feats[Y])
        arch = [("c22_1", 2, 2, True, True), ("c22_2", 2, 2, True, True),
                ("c32", 3, 2, True, False), ("c02", 0, 2, True, False),
                ("c42", 4, 2, True, True), ("c36", 3, 6, True, True),
                ("c61", 6, 1, True, True)]
        for name, i1, i2, w1, w2 in arch:
            feats.append(ConcatCell(self.out_channels, w1, w2,
                                    dtype=self.dtype, name=name)(
                feats[i1], feats[i2]))

        ret = []
        for idx, in_idx in zip([9, 8, 7], [1, 2, 3]):
            f1 = feats[idx]
            f2 = jax.image.resize(
                feats[5], f1.shape[:1] + f1.shape[1:3] + f1.shape[3:],
                method="bilinear").astype(f1.dtype)
            s = f1 + f2
            tgt = inputs[in_idx].shape
            ret.append(jax.image.resize(
                s, (s.shape[0], tgt[1], tgt[2], s.shape[3]),
                method="bilinear").astype(s.dtype))
        for i in range(self.num_outs - 3):
            v = ret[-1] if i == 0 else nn.relu(ret[-1])
            ret.append(nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)), dtype=self.dtype,
                               name=f"extra_{i}")(v))
        return tuple(ret)


class NASFCOSHead(nn.Module):
    """Searched tower: DCNv2(bias) -> conv3x3 -> DCNv2(bias) -> conv1x1,
    each + GN(32) + ReLU; FCOS heads/scales on top."""

    num_classes: int
    num_levels: int = 5
    feat_channels: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        from jax.nn.initializers import normal, zeros

        def tower(tag):
            return [
                ("dcn", DeformableConv3x3(self.feat_channels, modulated=True,
                                          use_bias=True, dtype=self.dtype,
                                          name=f"{tag}_op0")),
                ("conv", nn.Conv(self.feat_channels, (3, 3),
                                 padding=((1, 1), (1, 1)), use_bias=False,
                                 dtype=self.dtype, name=f"{tag}_op1")),
                ("dcn", DeformableConv3x3(self.feat_channels, modulated=True,
                                          use_bias=True, dtype=self.dtype,
                                          name=f"{tag}_op2")),
                ("conv", nn.Conv(self.feat_channels, (1, 1), use_bias=False,
                                 dtype=self.dtype, name=f"{tag}_op3")),
            ]

        self.cls_ops = tower("cls")
        self.reg_ops = tower("reg")
        self.cls_gns = [nn.GroupNorm(num_groups=min(32, self.feat_channels),
                                     epsilon=1e-5, dtype=jnp.float32,
                                     name=f"cls_gn{i}") for i in range(4)]
        self.reg_gns = [nn.GroupNorm(num_groups=min(32, self.feat_channels),
                                     epsilon=1e-5, dtype=jnp.float32,
                                     name=f"reg_gn{i}") for i in range(4)]
        prior = -math.log((1 - 0.01) / 0.01)
        self.conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, prior, d),
            dtype=self.dtype, name="conv_cls")
        self.conv_reg = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)),
                                kernel_init=normal(0.01), bias_init=zeros,
                                dtype=self.dtype, name="conv_reg")
        self.conv_centerness = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                                       kernel_init=normal(0.01),
                                       bias_init=zeros, dtype=self.dtype,
                                       name="conv_centerness")
        self.scales = self.param("scales", nn.initializers.ones,
                                 (self.num_levels,), jnp.float32)

    def _tower(self, ops, gns, x):
        for (kind, op), gn in zip(ops, gns):
            x = nn.relu(gn(op(x)).astype(self.dtype))
        return x

    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_maps, reg_maps, ctr_maps = [], [], []
        for i, f in enumerate(feats):
            ct = self._tower(self.cls_ops, self.cls_gns, f)
            rt = self._tower(self.reg_ops, self.reg_gns, f)
            cls_maps.append(self.conv_cls(ct))
            reg = self.conv_reg(rt).astype(jnp.float32) * self.scales[i]
            reg_maps.append(jnp.exp(reg))
            ctr_maps.append(self.conv_centerness(ct))
        cls = flatten_levels(cls_maps, self.num_classes).astype(jnp.float32)
        reg = flatten_levels(reg_maps, 4)
        ctr = flatten_levels(ctr_maps, 1)[..., 0].astype(jnp.float32)
        return cls, reg, ctr


class NASFCOS(nn.Module):
    cfg: Any  # NASFCOSConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = NASFCOSFPN(out_channels=self.cfg.fpn_channels,
                               num_outs=len(self.cfg.strides),
                               dtype=dtype, name="neck")
        self.head = NASFCOSHead(num_classes=self.cfg.num_classes,
                                num_levels=len(self.cfg.strides),
                                feat_channels=self.cfg.feat_channels,
                                dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def build_nasfcos(cfg) -> NASFCOS:
    return NASFCOS(cfg=cfg)


def init_nasfcos(cfg, rng: jax.Array):
    model = build_nasfcos(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
