"""GFL (Generalized Focal Loss) model (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/gfl_head.py (upstream family the fork keeps
  registered; configs/gfl/gfl_r50_fpn_1x_coco.py): GN(32) cls/reg towers
  (shared ATSS geometry: one anchor per cell at octave scale 8),
  classification-quality JOINT scores (C channels, sigmoid), box
  regression as a discrete DISTRIBUTION over {0..reg_max} per side with
  a per-level Scale on the logits; the box location is the softmax
  expectation (Integral, gfl_head.py:15-48).
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


def integral(dist_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """[..., 4*(reg_max+1)] distribution logits -> [..., 4] expected
    ltrb distances (stride units)."""
    shape = dist_logits.shape[:-1]
    p = jax.nn.softmax(dist_logits.reshape(shape + (4, reg_max + 1)), axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=p.dtype)
    return (p * proj).sum(axis=-1)


class GFLHead(nn.Module):
    num_classes: int
    num_levels: int = 5
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        from jax.nn.initializers import normal, zeros

        self.cls_tower = GNConvTower(self.feat_channels, self.stacked_convs,
                                     self.dtype, name="cls_tower")
        self.reg_tower = GNConvTower(self.feat_channels, self.stacked_convs,
                                     self.dtype, name="reg_tower")
        prior = -math.log((1 - 0.01) / 0.01)
        self.gfl_cls = nn.Conv(
            self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, prior, d),
            dtype=self.dtype, name="gfl_cls")
        self.gfl_reg = nn.Conv(
            4 * (self.reg_max + 1), (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01), bias_init=zeros,
            dtype=self.dtype, name="gfl_reg")
        self.scales = self.param("scales", nn.initializers.ones,
                                 (self.num_levels,), jnp.float32)

    def __call__(self, feats: Sequence[jnp.ndarray]):
        """-> (cls [B, A_tot, C] joint quality logits,
        dist [B, A_tot, 4*(reg_max+1)] distribution logits)."""
        cls_maps, reg_maps = [], []
        for i, f in enumerate(feats):
            ct = self.cls_tower(f)
            rt = self.reg_tower(f)
            cls_maps.append(self.gfl_cls(ct))
            reg_maps.append(self.gfl_reg(rt).astype(jnp.float32) * self.scales[i])
        cls = flatten_levels(cls_maps, self.num_classes).astype(jnp.float32)
        dist = flatten_levels(reg_maps, 4 * (self.reg_max + 1))
        return cls, dist


class GFL(nn.Module):
    cfg: Any  # GFLConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.strides), add_extra_convs="on_output",
                        relu_before_extra_convs=True, dtype=dtype, name="neck")
        self.head = GFLHead(num_classes=self.cfg.num_classes,
                            num_levels=len(self.cfg.strides),
                            feat_channels=self.cfg.feat_channels,
                            stacked_convs=self.cfg.stacked_convs,
                            reg_max=self.cfg.reg_max,
                            dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def build_gfl(cfg) -> GFL:
    return GFL(cfg=cfg)


def init_gfl(cfg, rng: jax.Array):
    model = build_gfl(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
