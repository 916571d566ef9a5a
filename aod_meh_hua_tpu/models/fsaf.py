"""FSAF (anchor-free feature-selective single-stage) model (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/fsaf_head.py (upstream family the fork keeps
  registered; configs/fsaf/fsaf_r50_fpn_1x_coco.py): a RetinaNet head
  shrunk to ONE anchor per cell — 4x (3x3 conv + ReLU) plain cls/reg
  towers (no norm, retina_head.py), 3x3 cls head with the focal-prior
  bias, 3x3 reg head with bias 0.25 ("to prevent predicted bbox with 0
  area", fsaf_head.py:43) followed by ReLU because the TBLR coder only
  accepts positive distances (fsaf_head.py:76).
* FPN: the RetinaNet neck (start_level=1, add_extra_convs='on_input').
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


class PlainConvTower(nn.Module):
    """stacked x (3x3 conv + ReLU) — the norm-free retina tower."""

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
            x = nn.relu(x)
        return x


class FSAFHead(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        from jax.nn.initializers import normal

        self.cls_tower = PlainConvTower(self.feat_channels, self.stacked_convs,
                                        self.dtype, name="cls_tower")
        self.reg_tower = PlainConvTower(self.feat_channels, self.stacked_convs,
                                        self.dtype, name="reg_tower")
        prior = -math.log((1 - 0.01) / 0.01)
        self.fsaf_cls = nn.Conv(
            self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, prior, d),
            dtype=self.dtype, name="fsaf_cls")
        self.fsaf_reg = nn.Conv(
            4, (3, 3), padding=((1, 1), (1, 1)), kernel_init=normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, 0.25, d),
            dtype=self.dtype, name="fsaf_reg")

    def __call__(self, feats: Sequence[jnp.ndarray]):
        """-> (cls [B, A_tot, C] logits, tblr [B, A_tot, 4] >= 0).
        One anchor per cell; the reg output is ReLU'd (TBLR coder
        accepts only positive distances, fsaf_head.py:76)."""
        cls_maps, reg_maps = [], []
        for f in feats:
            cls_maps.append(self.fsaf_cls(self.cls_tower(f)))
            reg_maps.append(nn.relu(self.fsaf_reg(self.reg_tower(f))))
        cls = flatten_levels(cls_maps, self.num_classes).astype(jnp.float32)
        tblr = flatten_levels(reg_maps, 4).astype(jnp.float32)
        return cls, tblr


class FSAF(nn.Module):
    cfg: Any  # FSAFConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.strides),
                        add_extra_convs="on_input", dtype=dtype, name="neck")
        self.head = FSAFHead(num_classes=self.cfg.num_classes,
                             feat_channels=self.cfg.feat_channels,
                             stacked_convs=self.cfg.stacked_convs,
                             dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def build_fsaf(cfg) -> FSAF:
    return FSAF(cfg=cfg)


def init_fsaf(cfg, rng: jax.Array):
    model = build_fsaf(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
