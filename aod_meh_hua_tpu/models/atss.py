"""ATSS (anchor-based with adaptive sample selection) model (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/atss_head.py (upstream family the fork keeps
  registered; configs/atss/atss_r50_fpn_1x_coco.py): GN(32) cls/reg
  towers, one anchor per cell (octave_base_scale=8, scales_per_octave=1,
  ratios [1.0]), centerness branch on the REG tower, per-level learnable
  Scale on the delta regression (no exp — ATSS regresses box deltas),
  focal-prior cls bias.
* FPN: start_level=1, add_extra_convs='on_output',
  relu_before_extra_convs=True (atss config).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .detector import flatten_levels
from .fcos import GNConvTower
from .fpn import FPN
from .resnet import ResNet


class ATSSHead(nn.Module):
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
        self.atss_cls = nn.Conv(
            self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, prior, d),
            dtype=self.dtype, name="atss_cls")
        self.atss_reg = nn.Conv(
            4, (3, 3), padding=((1, 1), (1, 1)), kernel_init=normal(0.01),
            bias_init=zeros, dtype=self.dtype, name="atss_reg")
        self.atss_centerness = nn.Conv(
            1, (3, 3), padding=((1, 1), (1, 1)), kernel_init=normal(0.01),
            bias_init=zeros, dtype=self.dtype, name="atss_centerness")
        self.scales = self.param("scales", nn.initializers.ones,
                                 (self.num_levels,), jnp.float32)

    def __call__(self, feats: Sequence[jnp.ndarray]):
        """-> (cls [B, A_tot, C] logits, deltas [B, A_tot, 4],
        centerness [B, A_tot] logits). One anchor per cell."""
        cls_maps, reg_maps, ctr_maps = [], [], []
        for i, f in enumerate(feats):
            ct = self.cls_tower(f)
            rt = self.reg_tower(f)
            cls_maps.append(self.atss_cls(ct))
            reg_maps.append(self.atss_reg(rt).astype(jnp.float32) * self.scales[i])
            ctr_maps.append(self.atss_centerness(rt))
        cls = flatten_levels(cls_maps, self.num_classes).astype(jnp.float32)
        reg = flatten_levels(reg_maps, 4)
        ctr = flatten_levels(ctr_maps, 1)[..., 0].astype(jnp.float32)
        return cls, reg, ctr


class ATSS(nn.Module):
    cfg: Any  # ATSSConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.strides), add_extra_convs="on_output",
                        relu_before_extra_convs=True, dtype=dtype, name="neck")
        self.head = ATSSHead(num_classes=self.cfg.num_classes,
                             num_levels=len(self.cfg.strides),
                             feat_channels=self.cfg.feat_channels,
                             stacked_convs=self.cfg.stacked_convs,
                             dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def build_atss(cfg) -> ATSS:
    return ATSS(cfg=cfg)


def init_atss(cfg, rng: jax.Array):
    model = build_atss(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
