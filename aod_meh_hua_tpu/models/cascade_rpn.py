"""Cascade RPN model (Flax) — two-stage anchor refinement with
feature-aligned adaptive convolutions.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/cascade_rpn_head.py:18 (AdaptiveConv:
  'dilation' mode = plain 3x3 dilation-3 conv; 'offset' mode =
  DeformConv2d driven by anchor-geometry offsets), :94
  (StageCascadeRPNHead: bridged feature, optional cls branch), :675
  (CascadeRPNHead: stage sequencing).
* configs/cascade_rpn/crpn_r50_caffe_fpn_1x_coco.py — stage 0: dilation
  conv, bridged_feature=True, no cls, IoU-loss regression on decoded
  boxes; stage 1: offset (deform) conv fed by the refined anchors,
  BCE objectness + IoU loss.

TPU redesign: the mmcv DeformConv2d CUDA kernel becomes 9 bilinear
zero-padded gathers contracted on the MXU (the models/deform.py
pattern); the offsets are NOT a learned branch here — they are pure
anchor geometry computed inside the jit step (engine/cascade_rpn.py
anchor_offsets), so the deform conv takes them as an explicit input.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .deform import _BASE_YX, bilinear_zero
from .detector import flatten_levels
from .fpn import FPN
from .resnet import ResNet


class DeformConv3x3Explicit(nn.Module):
    """3x3 deform conv whose (dy, dx)-interleaved 18-channel offsets
    arrive as an input (AdaptiveConv 'offset' mode: the offsets are
    anchor geometry, not a learned branch). Stride 1, zero padding."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, offsets: jnp.ndarray):
        b, h, w, cin = x.shape
        kernel = self.param("kernel", nn.initializers.normal(0.01),
                            (9, cin, self.features), jnp.float32)
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")

        def one_image(feat, o):
            out = jnp.zeros((h * w, self.features), self.dtype)
            for k in range(9):
                ys = (gy + _BASE_YX[k, 0] + o[..., 2 * k]).reshape(-1)
                xs = (gx + _BASE_YX[k, 1] + o[..., 2 * k + 1]).reshape(-1)
                sampled = bilinear_zero(feat, ys, xs)
                out = out + (sampled @ kernel[k].astype(sampled.dtype)
                             ).astype(self.dtype)
            return out.reshape(h, w, self.features)

        return jax.vmap(one_image)(x.astype(self.dtype), offsets)


class CascadeRPNNet(nn.Module):
    """Backbone + FPN + the two cascade RPN stages (weights shared
    across levels, as every RPN head is)."""

    cfg: Any  # CascadeRPNConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        self._dtype = dtype
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=0,
                        num_outs=len(self.cfg.rpn.anchor_strides),
                        add_extra_convs="maxpool", dtype=dtype, name="neck")
        normal = nn.initializers.normal(0.01)
        d = self.cfg.stage0_dilation
        # stage 0: dilated 3x3, no bias (AdaptiveConv bias=False), reg only
        self.s0_conv = nn.Conv(self.cfg.fpn_channels, (3, 3),
                               padding=((d, d), (d, d)), kernel_dilation=(d, d),
                               use_bias=False, kernel_init=normal,
                               dtype=dtype, name="s0_conv")
        self.s0_reg = nn.Conv(4, (1, 1), kernel_init=normal,
                              bias_init=nn.initializers.zeros,
                              dtype=dtype, name="s0_reg")
        # stage 1: anchor-offset deform conv, cls + reg (1 anchor/cell)
        self.s1_conv = DeformConv3x3Explicit(self.cfg.fpn_channels,
                                             dtype=dtype, name="s1_conv")
        self.s1_cls = nn.Conv(1, (1, 1), kernel_init=normal,
                              bias_init=nn.initializers.zeros,
                              dtype=dtype, name="s1_cls")
        self.s1_reg = nn.Conv(4, (1, 1), kernel_init=normal,
                              bias_init=nn.initializers.zeros,
                              dtype=dtype, name="s1_reg")

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def stage0(self, feats: Sequence[jnp.ndarray]):
        """-> (bridged feats, reg deltas [B, A, 4]). bridged_feature=True:
        the adapted (post-relu) map replaces the input for stage 1."""
        bridged, regs = [], []
        for f in feats:
            x = nn.relu(self.s0_conv(f))
            bridged.append(x)
            regs.append(self.s0_reg(x))
        return bridged, flatten_levels(regs, 4).astype(jnp.float32)

    def stage1(self, feats: Sequence[jnp.ndarray],
               offsets: Sequence[jnp.ndarray]):
        """-> (objectness [B, A], reg deltas [B, A, 4])."""
        cls_maps, reg_maps = [], []
        for f, o in zip(feats, offsets):
            x = nn.relu(self.s1_conv(f, o))
            cls_maps.append(self.s1_cls(x))
            reg_maps.append(self.s1_reg(x))
        cls = flatten_levels(cls_maps, 1)[..., 0].astype(jnp.float32)
        reg = flatten_levels(reg_maps, 4).astype(jnp.float32)
        return cls, reg

    def __call__(self, images: jnp.ndarray):
        feats = self.features(images)
        bridged, reg0 = self.stage0(feats)
        zero_off = [jnp.zeros(f.shape[:3] + (18,), jnp.float32)
                    for f in bridged]
        cls1, reg1 = self.stage1(bridged, zero_off)
        return reg0, cls1, reg1


def build_cascade_rpn(cfg) -> CascadeRPNNet:
    return CascadeRPNNet(cfg=cfg)


def init_cascade_rpn(cfg, rng: jax.Array):
    model = build_cascade_rpn(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
