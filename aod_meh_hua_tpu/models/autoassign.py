"""AutoAssign (fully differentiable label assignment) model (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/autoassign_head.py (upstream family the fork
  keeps registered; configs/autoassign/autoassign_r50_fpn_8x2_1x_coco.py):
  an FCOS head whose centerness branch is re-read as OBJECTNESS (taken
  from the REG tower, forward_single autoassign_head.py:189-212), cls
  bias initialized at prior 0.02 and reg bias at 4.0
  (init_weights :161-171), regression = relu(scale * pred) * stride (no
  exp), and a learnable per-class CenterPrior (mean/sigma [C, 2],
  CenterPrior autoassign_head.py:17) consumed by the loss.
* FPN: start_level=1, add_extra_convs (on_input), relu_before_extra_convs.
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


class AutoAssignHead(nn.Module):
    num_classes: int
    num_levels: int = 5
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        from jax.nn.initializers import normal, ones, zeros

        self.cls_tower = GNConvTower(self.feat_channels, self.stacked_convs,
                                     self.dtype, name="cls_tower")
        self.reg_tower = GNConvTower(self.feat_channels, self.stacked_convs,
                                     self.dtype, name="reg_tower")
        prior = -math.log((1 - 0.02) / 0.02)  # bias_init_with_prob(0.02)
        self.conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, prior, d),
            dtype=self.dtype, name="conv_cls")
        self.conv_reg = nn.Conv(
            4, (3, 3), padding=((1, 1), (1, 1)), kernel_init=normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, 4.0, d),
            dtype=self.dtype, name="conv_reg")
        self.conv_objectness = nn.Conv(
            1, (3, 3), padding=((1, 1), (1, 1)), kernel_init=normal(0.01),
            bias_init=zeros, dtype=self.dtype, name="conv_objectness")
        self.scales = self.param("scales", ones, (self.num_levels,),
                                 jnp.float32)
        # learnable category-specific center prior (CenterPrior.__init__)
        self.prior_mean = self.param("prior_mean", zeros,
                                     (self.num_classes, 2), jnp.float32)
        self.prior_sigma = self.param("prior_sigma", ones,
                                      (self.num_classes, 2), jnp.float32)

    def __call__(self, feats: Sequence[jnp.ndarray], strides):
        """-> (cls [B, P, C] logits, distances [B, P, 4] pixels >= 0,
        objectness [B, P] logits, prior_mean [C, 2], prior_sigma [C, 2])."""
        cls_maps, reg_maps, obj_maps = [], [], []
        for i, f in enumerate(feats):
            ct = self.cls_tower(f)
            rt = self.reg_tower(f)
            cls_maps.append(self.conv_cls(ct))
            # relu(scale * pred) * stride (forward_single :209-211)
            reg = nn.relu(self.conv_reg(rt).astype(jnp.float32)
                          * self.scales[i])
            reg_maps.append(reg * float(strides[i]))
            obj_maps.append(self.conv_objectness(rt))
        cls = flatten_levels(cls_maps, self.num_classes).astype(jnp.float32)
        reg = flatten_levels(reg_maps, 4)
        obj = flatten_levels(obj_maps, 1)[..., 0].astype(jnp.float32)
        return cls, reg, obj, self.prior_mean, self.prior_sigma


class AutoAssign(nn.Module):
    cfg: Any  # AutoAssignConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.strides),
                        add_extra_convs="on_input",
                        relu_before_extra_convs=True, dtype=dtype, name="neck")
        self.head = AutoAssignHead(num_classes=self.cfg.num_classes,
                                   num_levels=len(self.cfg.strides),
                                   feat_channels=self.cfg.feat_channels,
                                   stacked_convs=self.cfg.stacked_convs,
                                   dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)), self.cfg.strides)


def build_autoassign(cfg) -> AutoAssign:
    return AutoAssign(cfg=cfg)


def init_autoassign(cfg, rng: jax.Array):
    model = build_autoassign(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
