"""Guided Anchoring RetinaNet (GA-RetinaNet) model (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/ga_retina_head.py:10-112 — 4x plain conv
  towers, then per level: conv_loc (1x1 -> 1 objectness channel, focal
  prior bias), conv_shape (1x1 -> 2 dw/dh channels per square anchor),
  two FeatureAdaption blocks (a 1x1 conv maps the DETACHED shape
  prediction to deform-conv offsets; DCN v1 then adapts the tower
  features), and masked 3x3 cls/reg heads on the adapted features.
* mmdet/models/dense_heads/guided_anchor_head.py:14-55 (FeatureAdaption)
* configs/guided_anchoring/ga_retinanet_r50_fpn_1x_coco.py — ONE square
  anchor per cell (square generator scales [4], ratios [1]); the 9
  approx anchors per cell exist only in the loss (engine).

TPU redesign: MaskedConv2d is computed densely (the eval-time loc mask
instead zeroes scores in the engine — same surviving detections);
deform_groups collapses to 1 (the offset conv emits one 18-channel
offset field, reusing reppoints' DeformConv3x3 bilinear-gather DCN).
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
from .reppoints import DeformConv3x3
from .resnet import ResNet


class FeatureAdaption(nn.Module):
    """guided_anchor_head.py:14-55: offsets = 1x1 conv(no bias) of the
    detached shape prediction; x = relu(DCN(x, offsets))."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, shape_pred):
        off = nn.Conv(18, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.normal(0.1),
                      dtype=jnp.float32, name="conv_offset")(
            jax.lax.stop_gradient(shape_pred))
        y = DeformConv3x3(self.channels, use_bias=False, dtype=self.dtype,
                          name="conv_adaption")(x, off)
        return nn.relu(y)


class GARetinaHead(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        from jax.nn.initializers import normal, zeros

        prior = -math.log((1 - 0.01) / 0.01)
        bias_prior = lambda k, s, d=jnp.float32: jnp.full(s, prior, d)
        self.cls_tower = PlainConvTower(self.feat_channels, self.stacked_convs,
                                        self.dtype, name="cls_tower")
        self.reg_tower = PlainConvTower(self.feat_channels, self.stacked_convs,
                                        self.dtype, name="reg_tower")
        self.conv_loc = nn.Conv(1, (1, 1), kernel_init=normal(0.01),
                                bias_init=bias_prior, dtype=self.dtype,
                                name="conv_loc")
        self.conv_shape = nn.Conv(2, (1, 1), kernel_init=normal(0.01),
                                  bias_init=zeros, dtype=self.dtype,
                                  name="conv_shape")
        self.adaption_cls = FeatureAdaption(self.feat_channels, self.dtype,
                                            name="feature_adaption_cls")
        self.adaption_reg = FeatureAdaption(self.feat_channels, self.dtype,
                                            name="feature_adaption_reg")
        self.retina_cls = nn.Conv(self.num_classes, (3, 3),
                                  padding=((1, 1), (1, 1)),
                                  kernel_init=normal(0.01),
                                  bias_init=bias_prior, dtype=self.dtype,
                                  name="retina_cls")
        self.retina_reg = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)),
                                  kernel_init=normal(0.01), bias_init=zeros,
                                  dtype=self.dtype, name="retina_reg")

    def __call__(self, feats: Sequence[jnp.ndarray]):
        """-> (cls [B, A, C], deltas [B, A, 4], shape [B, A, 2],
        loc [B, A]) over all levels, one square anchor per cell."""
        cls_maps, reg_maps, shape_maps, loc_maps = [], [], [], []
        for f in feats:
            cf = self.cls_tower(f)
            rf = self.reg_tower(f)
            loc = self.conv_loc(cf)
            shape = self.conv_shape(rf)
            cf = self.adaption_cls(cf, shape)
            rf = self.adaption_reg(rf, shape)
            cls_maps.append(self.retina_cls(cf))
            reg_maps.append(self.retina_reg(rf))
            shape_maps.append(shape)
            loc_maps.append(loc)
        cls = flatten_levels(cls_maps, self.num_classes).astype(jnp.float32)
        deltas = flatten_levels(reg_maps, 4).astype(jnp.float32)
        shape = flatten_levels(shape_maps, 2).astype(jnp.float32)
        loc = flatten_levels(loc_maps, 1)[..., 0].astype(jnp.float32)
        return cls, deltas, shape, loc


class GARetinaNet(nn.Module):
    cfg: Any  # GARetinaNetConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.strides),
                        add_extra_convs="on_input", dtype=dtype, name="neck")
        self.head = GARetinaHead(num_classes=self.cfg.num_classes,
                                 feat_channels=self.cfg.feat_channels,
                                 stacked_convs=self.cfg.stacked_convs,
                                 dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def build_ga_retinanet(cfg) -> GARetinaNet:
    return GARetinaNet(cfg=cfg)


def init_ga_retinanet(cfg, rng: jax.Array):
    model = build_ga_retinanet(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
