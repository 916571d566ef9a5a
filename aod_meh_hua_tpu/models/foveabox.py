"""FoveaBox (FOVEA): anchor-free per-level fovea-region detection
(Flax).

Behavioral parity targets (reference, /root/reference):
* configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py — R50 + FPN
  (start_level 1, num_outs 5, extra convs on input), FoveaHead with 4
  stacked plain convs per branch (with_deform=False), strides 8-128,
  base_edge_list (16, 32, 64, 128, 256), scale_ranges, sigma 0.4,
  focal gamma 1.5 alpha 0.4, SmoothL1 beta 0.11.
* mmdet/models/dense_heads/fovea_head.py:78-128 — reg tower runs first
  (its output would drive the deform adaption), then the cls tower;
  3x3 heads, cls bias prior 0.01, conv std 0.01.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .detector import flatten_levels
from .fpn import FPN
from .resnet import ResNet


class ConvTower(nn.Module):
    """stacked x (3x3 conv + ReLU) — FoveaHead uses norm-free ConvModules."""

    channels: int
    stacked: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.stacked):
            x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=nn.initializers.normal(0.01),
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
        return x


class FoveaHead(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        """-> (cls logits [B, P, C], ltrb log-offsets [B, P, 4]) over the
        flattened level axis."""
        norm01 = nn.initializers.normal(0.01)
        prior = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        cls_tower = ConvTower(self.feat_channels, self.stacked_convs,
                              self.dtype, name="cls_tower")
        reg_tower = ConvTower(self.feat_channels, self.stacked_convs,
                              self.dtype, name="reg_tower")
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                           kernel_init=norm01, bias_init=prior,
                           dtype=self.dtype, name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)),
                           kernel_init=norm01, dtype=self.dtype,
                           name="conv_reg")
        cls_maps, reg_maps = [], []
        for f in feats:
            reg_maps.append(conv_reg(reg_tower(f)))
            cls_maps.append(conv_cls(cls_tower(f)))
        cls = flatten_levels(cls_maps, self.num_classes).astype(jnp.float32)
        reg = flatten_levels(reg_maps, 4).astype(jnp.float32)
        return cls, reg


class FoveaBox(nn.Module):
    cfg: Any  # FoveaBoxConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.backbone = ResNet(block_counts=cfg.block_counts,
                               stem_width=cfg.stem_width, dtype=dtype,
                               name="backbone")
        self.neck = FPN(out_channels=cfg.fpn_channels, start_level=1,
                        num_outs=len(cfg.strides), add_extra_convs="on_input",
                        dtype=dtype, name="neck")
        self.head = FoveaHead(num_classes=cfg.num_classes,
                              feat_channels=cfg.feat_channels,
                              stacked_convs=cfg.stacked_convs,
                              dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def build_foveabox(cfg) -> FoveaBox:
    return FoveaBox(cfg=cfg)


def init_foveabox(cfg, rng: jax.Array):
    model = build_foveabox(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
