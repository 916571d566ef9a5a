"""FreeAnchor RetinaNet model (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/free_anchor_retina_head.py:12 — the model is
  a STANDARD RetinaHead (4x plain conv towers, A*C cls / A*4 reg 3x3
  heads with the focal-prior cls bias); all of FreeAnchor's novelty is
  in the loss (engine/free_anchor.py).
* configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py — retina
  anchors (octave 4, 3 scales/octave, 3 ratios), RetinaNet FPN
  (start_level=1, extras on input).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .detector import flatten_levels
from .fpn import FPN
from .fsaf import PlainConvTower
from .resnet import ResNet


class RetinaHeadPlain(nn.Module):
    """The upstream (non-MEH) RetinaHead: norm-free towers + A-anchor
    cls/reg 3x3 heads (retina_head.py defaults)."""

    num_classes: int
    num_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        from jax.nn.initializers import normal, zeros

        self.cls_tower = PlainConvTower(self.feat_channels, self.stacked_convs,
                                        self.dtype, name="cls_tower")
        self.reg_tower = PlainConvTower(self.feat_channels, self.stacked_convs,
                                        self.dtype, name="reg_tower")
        prior = -math.log((1 - 0.01) / 0.01)
        self.retina_cls = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3),
            padding=((1, 1), (1, 1)), kernel_init=normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, prior, d),
            dtype=self.dtype, name="retina_cls")
        self.retina_reg = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01), bias_init=zeros,
            dtype=self.dtype, name="retina_reg")

    def __call__(self, feats: Sequence[jnp.ndarray]):
        """-> (cls [B, A_tot, C] logits, deltas [B, A_tot, 4])."""
        cls_maps, reg_maps = [], []
        for f in feats:
            cls_maps.append(self.retina_cls(self.cls_tower(f)))
            reg_maps.append(self.retina_reg(self.reg_tower(f)))
        cls = flatten_levels(cls_maps, self.num_classes).astype(jnp.float32)
        deltas = flatten_levels(reg_maps, 4).astype(jnp.float32)
        return cls, deltas


class FreeAnchorNet(nn.Module):
    cfg: Any  # FreeAnchorConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        if getattr(self.cfg, "neck_type", "fpn") == "nasfpn":
            from .fpn import NASFPN

            self.neck = NASFPN(out_channels=self.cfg.fpn_channels,
                               stack_times=self.cfg.nasfpn_stack_times,
                               start_level=1,
                               num_outs=len(self.cfg.strides),
                               dtype=dtype, name="neck")
        else:
            self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                            num_outs=len(self.cfg.strides),
                            add_extra_convs="on_input", dtype=dtype, name="neck")
        self.head = RetinaHeadPlain(num_classes=self.cfg.num_classes,
                                    num_anchors=self.cfg.num_anchors,
                                    feat_channels=self.cfg.feat_channels,
                                    stacked_convs=self.cfg.stacked_convs,
                                    dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def build_free_anchor(cfg) -> FreeAnchorNet:
    return FreeAnchorNet(cfg=cfg)


def init_free_anchor(cfg, rng: jax.Array):
    model = build_free_anchor(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
