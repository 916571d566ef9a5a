"""FCOS (anchor-free, single-stage) model (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/fcos_head.py (upstream family the fork keeps
  registered; config configs/fcos/fcos_r50_caffe_fpn_gn-head_1x_coco.py):
  4x (3x3 conv + GN(32) + ReLU) cls/reg towers, 3x3 heads for class
  logits / ltrb distances / centerness (on the CLS tower,
  centerness_on_reg=False), per-level learnable Scale then exp on the
  regression (norm_on_bbox=False), focal-prior bias init on the cls head.
* FPN: start_level=1, add_extra_convs='on_output',
  relu_before_extra_convs=True.

Deviation (documented): the reference FCOS config uses a caffe-style R50
(BGR, pad-free stem variant); this build shares the framework's
torchvision-style R50 — a pretrained-weights convention, not an
architecture change.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .detector import flatten_levels
from .fpn import FPN
from .resnet import ResNet


class GNConvTower(nn.Module):
    """stacked x (3x3 conv + GroupNorm(32) + ReLU)."""

    channels: int
    stacked: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from jax.nn.initializers import normal, zeros

        for i in range(self.stacked):
            x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=normal(0.01), bias_init=zeros,
                        dtype=self.dtype, name=f"conv_{i}")(x)
            # GN statistics in f32 for bf16 stability; 32 groups as the
            # reference (capped for shrunken test configs)
            x = nn.GroupNorm(num_groups=min(32, self.channels), epsilon=1e-5,
                             dtype=jnp.float32, name=f"gn_{i}")(x)
            x = nn.relu(x).astype(self.dtype)
        return x


class FCOSHead(nn.Module):
    num_classes: int
    num_levels: int = 5
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        from jax.nn.initializers import normal, zeros

        self.cls_tower = GNConvTower(self.feat_channels, self.stacked_convs,
                                     self.dtype, name="cls_tower")
        self.reg_tower = GNConvTower(self.feat_channels, self.stacked_convs,
                                     self.dtype, name="reg_tower")
        prior = -math.log((1 - 0.01) / 0.01)
        self.conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, prior, d),
            dtype=self.dtype, name="conv_cls")
        self.conv_reg = nn.Conv(
            4, (3, 3), padding=((1, 1), (1, 1)), kernel_init=normal(0.01),
            bias_init=zeros, dtype=self.dtype, name="conv_reg")
        self.conv_centerness = nn.Conv(
            1, (3, 3), padding=((1, 1), (1, 1)), kernel_init=normal(0.01),
            bias_init=zeros, dtype=self.dtype, name="conv_centerness")
        self.scales = self.param("scales", nn.initializers.ones,
                                 (self.num_levels,), jnp.float32)

    def __call__(self, feats: Sequence[jnp.ndarray]):
        """-> (cls [B, P_tot, C] logits, distances [B, P_tot, 4] pixels,
        centerness [B, P_tot] logits)."""
        cls_maps, reg_maps, ctr_maps = [], [], []
        for i, f in enumerate(feats):
            ct = self.cls_tower(f)
            rt = self.reg_tower(f)
            cls_maps.append(self.conv_cls(ct))
            # scale then exp (norm_on_bbox=False branch, fcos_head.py)
            reg = self.conv_reg(rt).astype(jnp.float32) * self.scales[i]
            reg_maps.append(jnp.exp(reg))
            ctr_maps.append(self.conv_centerness(ct))
        cls = flatten_levels(cls_maps, self.num_classes).astype(jnp.float32)
        reg = flatten_levels(reg_maps, 4)
        ctr = flatten_levels(ctr_maps, 1)[..., 0].astype(jnp.float32)
        return cls, reg, ctr


class FCOS(nn.Module):
    cfg: Any  # FCOSConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.strides), add_extra_convs="on_output",
                        relu_before_extra_convs=True, dtype=dtype, name="neck")
        self.head = FCOSHead(num_classes=self.cfg.num_classes,
                             num_levels=len(self.cfg.strides),
                             feat_channels=self.cfg.feat_channels,
                             stacked_convs=self.cfg.stacked_convs,
                             dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def build_fcos(cfg) -> FCOS:
    return FCOS(cfg=cfg)


def init_fcos(cfg, rng: jax.Array):
    model = build_fcos(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
