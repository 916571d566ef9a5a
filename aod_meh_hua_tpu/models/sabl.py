"""SABL RetinaNet model (Flax).

Behavioral parity target (reference, /root/reference):
* mmdet/models/dense_heads/sabl_retina_head.py:20-197 — ONE square
  anchor per cell; 4x conv towers; three 3x3 heads: retina_cls (C,
  0.01-prior bias), retina_bbox_cls (4*side_num bucket logits),
  retina_bbox_reg (4*side_num fine offsets).
* configs/sabl/sabl_retinanet_r50_fpn_1x_coco.py (buckets 14,
  scale_factor 3).
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


class SABLRetinaHead(nn.Module):
    num_classes: int
    side_num: int  # ceil(num_buckets / 2)
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
        self.retina_cls = nn.Conv(self.num_classes, (3, 3),
                                  padding=((1, 1), (1, 1)),
                                  kernel_init=normal(0.01),
                                  bias_init=bias_prior, dtype=self.dtype,
                                  name="retina_cls")
        self.retina_bbox_cls = nn.Conv(self.side_num * 4, (3, 3),
                                       padding=((1, 1), (1, 1)),
                                       kernel_init=normal(0.01),
                                       bias_init=zeros, dtype=self.dtype,
                                       name="retina_bbox_cls")
        self.retina_bbox_reg = nn.Conv(self.side_num * 4, (3, 3),
                                       padding=((1, 1), (1, 1)),
                                       kernel_init=normal(0.01),
                                       bias_init=zeros, dtype=self.dtype,
                                       name="retina_bbox_reg")

    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_m, bc_m, br_m = [], [], []
        for f in feats:
            cf = self.cls_tower(f)
            rf = self.reg_tower(f)
            cls_m.append(self.retina_cls(cf))
            bc_m.append(self.retina_bbox_cls(rf))
            br_m.append(self.retina_bbox_reg(rf))
        cls = flatten_levels(cls_m, self.num_classes).astype(jnp.float32)
        bc = flatten_levels(bc_m, self.side_num * 4).astype(jnp.float32)
        br = flatten_levels(br_m, self.side_num * 4).astype(jnp.float32)
        return cls, bc, br


class SABLRetinaNet(nn.Module):
    cfg: Any  # SABLRetinaNetConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.strides),
                        add_extra_convs="on_input", dtype=dtype, name="neck")
        self.head = SABLRetinaHead(num_classes=self.cfg.num_classes,
                                   side_num=self.cfg.side_num,
                                   feat_channels=self.cfg.feat_channels,
                                   stacked_convs=self.cfg.stacked_convs,
                                   dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def build_sabl_retinanet(cfg) -> SABLRetinaNet:
    return SABLRetinaNet(cfg=cfg)


def init_sabl_retinanet(cfg, rng: jax.Array):
    model = build_sabl_retinanet(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
