"""VFNet (VarifocalNet: IoU-aware dense detection) model (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/vfnet_head.py (upstream family the fork keeps
  registered; configs/vfnet/vfnet_r50_fpn_1x_coco.py): 3x GN(32) cls/reg
  towers; initial branch = conv+GN+ReLU then 3x3 conv to 4 channels,
  bbox = exp(scale * pred) * reg_denom (bbox_norm_type='reg_denom',
  reg_denoms = upper regress-range bounds with the last doubled,
  vfnet_head.py:65-68); STAR-SHAPED refinement — the 9 deformable taps
  sit on the initial box's sides/corners (star_dcn_offset :273-314,
  gradient_mul 0.1), a DeformConv feeds both the refine branch
  (multiplicative: refine = exp(scale_refine * out) * detach(initial),
  :264-267) and the IoU-aware cls branch (:269-271).
* FPN: start_level=1, add_extra_convs='on_output',
  relu_before_extra_convs=True (vfnet config).

TPU redesign: the mmcv DeformConv2d CUDA kernel is the RepPoints
bilinear-gather DeformConv3x3 (9 zero-padded taps, each tap an MXU
contraction) — no custom op, XLA fuses the star offsets into the
gather address math.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .detector import flatten_levels
from .fcos import GNConvTower
from .fpn import FPN
from .reppoints import _BASE_YX, DeformConv3x3
from .resnet import ResNet


def star_dcn_offset(bbox_pred, gradient_mul, stride):
    """[B, H, W, 4] (l, t, r, b) pixel distances -> [B, H, W, 18]
    offsets RELATIVE to the standard 3x3 taps (vfnet_head.py:273:
    the 9 taps land on the initial box's corners/edge-midpoints/center,
    with a partial gradient path controlled by gradient_mul)."""
    pg = ((1.0 - gradient_mul) * jax.lax.stop_gradient(bbox_pred)
          + gradient_mul * bbox_pred) / float(stride)
    l_, t_, r_, b_ = pg[..., 0], pg[..., 1], pg[..., 2], pg[..., 3]
    z = jnp.zeros_like(l_)
    # (y, x) per tap, y-major tap order matching _BASE_YX
    star = jnp.stack([
        -t_, -l_, -t_, z, -t_, r_,
        z, -l_, z, z, z, r_,
        b_, -l_, b_, z, b_, r_,
    ], axis=-1)
    base = jnp.asarray(_BASE_YX.reshape(-1), jnp.float32)
    return star - base


class VFNetHead(nn.Module):
    num_classes: int
    num_levels: int = 5
    feat_channels: int = 256
    stacked_convs: int = 3
    reg_denoms: Sequence[float] = (64, 128, 256, 512, 1024)
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    gradient_mul: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        from jax.nn.initializers import normal, ones, zeros

        self.cls_tower = GNConvTower(self.feat_channels, self.stacked_convs,
                                     self.dtype, name="cls_tower")
        self.reg_tower = GNConvTower(self.feat_channels, self.stacked_convs,
                                     self.dtype, name="reg_tower")
        # vfnet_reg_conv is a ConvModule (conv + GN + ReLU)
        self.reg_conv = GNConvTower(self.feat_channels, 1, self.dtype,
                                    name="reg_conv")
        self.vfnet_reg = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)),
                                 kernel_init=normal(0.01), bias_init=zeros,
                                 dtype=self.dtype, name="vfnet_reg")
        self.reg_refine_dconv = DeformConv3x3(self.feat_channels,
                                              dtype=self.dtype,
                                              name="reg_refine_dconv")
        self.vfnet_reg_refine = nn.Conv(
            4, (3, 3), padding=((1, 1), (1, 1)), kernel_init=normal(0.01),
            bias_init=zeros, dtype=self.dtype, name="vfnet_reg_refine")
        self.cls_dconv = DeformConv3x3(self.feat_channels, dtype=self.dtype,
                                       name="cls_dconv")
        prior = -math.log((1 - 0.01) / 0.01)
        self.vfnet_cls = nn.Conv(
            self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, prior, d),
            dtype=self.dtype, name="vfnet_cls")
        self.scales = self.param("scales", ones, (self.num_levels,),
                                 jnp.float32)
        self.scales_refine = self.param("scales_refine", ones,
                                        (self.num_levels,), jnp.float32)

    def __call__(self, feats: Sequence[jnp.ndarray]):
        """-> (cls [B, P, C] logits, bbox_ini [B, P, 4] pixel ltrb,
        bbox_refine [B, P, 4] pixel ltrb)."""
        cls_maps, ini_maps, ref_maps = [], [], []
        for i, f in enumerate(feats):
            cf = self.cls_tower(f)
            rf = self.reg_tower(f)
            ini = jnp.exp(
                self.vfnet_reg(self.reg_conv(rf)).astype(jnp.float32)
                * self.scales[i]) * float(self.reg_denoms[i])
            off = star_dcn_offset(ini, self.gradient_mul, self.strides[i])
            rf2 = nn.relu(self.reg_refine_dconv(rf, off))
            ref = jnp.exp(
                self.vfnet_reg_refine(rf2).astype(jnp.float32)
                * self.scales_refine[i]) * jax.lax.stop_gradient(ini)
            cf2 = nn.relu(self.cls_dconv(cf, off))
            cls_maps.append(self.vfnet_cls(cf2))
            ini_maps.append(ini)
            ref_maps.append(ref)
        cls = flatten_levels(cls_maps, self.num_classes).astype(jnp.float32)
        ini = flatten_levels(ini_maps, 4)
        ref = flatten_levels(ref_maps, 4)
        return cls, ini, ref


class VFNet(nn.Module):
    cfg: Any  # VFNetConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.strides),
                        add_extra_convs="on_output",
                        relu_before_extra_convs=True, dtype=dtype, name="neck")
        self.head = VFNetHead(num_classes=self.cfg.num_classes,
                              num_levels=len(self.cfg.strides),
                              feat_channels=self.cfg.feat_channels,
                              stacked_convs=self.cfg.stacked_convs,
                              reg_denoms=self.cfg.reg_denoms,
                              strides=self.cfg.strides,
                              gradient_mul=self.cfg.gradient_mul,
                              dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def build_vfnet(cfg) -> VFNet:
    return VFNet(cfg=cfg)


def init_vfnet(cfg, rng: jax.Array):
    model = build_vfnet(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
