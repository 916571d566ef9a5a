"""Grid R-CNN model (Flax): Faster R-CNN trunk with a cls-only RoI head
and the grid-point heatmap head.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/mask_heads/grid_head.py:12-190 — 8 stacked
  3x3 convs (first stride 2, 14->7) at 9*64 channels with GN(36);
  first- and second-order neighbor fusion (per grid point, a depthwise
  5x5 + 1x1 transition from each 4-neighbor's 64-channel slice); two
  grouped 4x4/2 deconvs (7->14->28) with GN(9) between, the second
  emitting one logit map per grid point with a 0.01-prior bias; during
  training BOTH the fused and unfused heatmaps are predicted.
* mmdet/models/roi_heads/grid_roi_head.py + configs/grid_rcnn/*.py —
  Shared2FC bbox head with with_reg=False (classification only; the
  box geometry comes from the grid head at eval).

TPU notes: the grouped deconvs unroll into 9 per-point ConvTranspose
slices (static python loop, XLA fuses); depthwise 5x5 lowers to
feature_group_count = channels.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .fpn import FPN
from .resnet import ResNet
from .two_stage import RPNHead


def grid_neighbors(grid_size: int):
    """4-neighborhoods in the reference's column-major point order
    (grid_head.py:103-117: i = column, j = row, index = i*size + j)."""
    out = []
    for i in range(grid_size):
        for j in range(grid_size):
            nbrs = []
            if i > 0:
                nbrs.append((i - 1) * grid_size + j)
            if j > 0:
                nbrs.append(i * grid_size + j - 1)
            if j < grid_size - 1:
                nbrs.append(i * grid_size + j + 1)
            if i < grid_size - 1:
                nbrs.append((i + 1) * grid_size + j)
            out.append(tuple(nbrs))
    return out


def calc_sub_regions(grid_points: int, grid_size: int, whole_map: int):
    """Per-point half-size representation regions (grid_head.py:191-220,
    the Grid R-CNN Plus reduction)."""
    half = whole_map // 4 * 2
    subs = []
    for i in range(grid_points):
        x_idx = i // grid_size
        y_idx = i % grid_size
        if x_idx == 0:
            sx = 0
        elif x_idx == grid_size - 1:
            sx = half
        else:
            sx = max(int((x_idx / (grid_size - 1) - 0.25) * whole_map), 0)
        if y_idx == 0:
            sy = 0
        elif y_idx == grid_size - 1:
            sy = half
        else:
            sy = max(int((y_idx / (grid_size - 1) - 0.25) * whole_map), 0)
        subs.append((sx, sy, sx + half, sy + half))
    return subs


class _Transition(nn.Module):
    """Depthwise 5x5 + 1x1 (grid_head.py:126-149)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (5, 5), padding=((2, 2), (2, 2)),
                    feature_group_count=self.channels, dtype=self.dtype,
                    name="dw")(x)
        return nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="pw")(y)


class GridHead(nn.Module):
    grid_points: int = 9
    num_convs: int = 8
    point_feat_channels: int = 64
    roi_feat_size: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [R, 14, 14, C] -> (fused [R, 28, 28, 9], unfused or fused)."""
        gp = self.grid_points
        c = self.point_feat_channels
        gs = int(math.isqrt(gp))
        conv_out = gp * c
        for i in range(self.num_convs):
            stride = 2 if i == 0 else 1
            x = nn.Conv(conv_out, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(nn.GroupNorm(num_groups=36, name=f"gn{i}")(x))

        nbrs = grid_neighbors(gs)
        slices = [x[..., i * c:(i + 1) * c] for i in range(gp)]
        x_fo = []
        for i, points in enumerate(nbrs):
            acc = slices[i]
            for j, p in enumerate(points):
                acc = acc + _Transition(c, self.dtype,
                                        name=f"fo_{i}_{j}")(slices[p])
            x_fo.append(acc)
        x_so = []
        for i, points in enumerate(nbrs):
            acc = slices[i]
            for j, p in enumerate(points):
                acc = acc + _Transition(c, self.dtype,
                                        name=f"so_{i}_{j}")(x_fo[p])
            x_so.append(acc)

        prior = -math.log(0.99 / 0.01)
        # instantiate ONCE so the fused and unfused passes share the
        # deconv weights (the reference calls the same modules twice)
        deconv1 = [nn.ConvTranspose(
            c, (4, 4), strides=(2, 2), padding="SAME",
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name=f"deconv1_{i}") for i in range(gp)]
        gn_d = nn.GroupNorm(num_groups=gp, name="gn_deconv")
        deconv2 = [nn.ConvTranspose(
            1, (4, 4), strides=(2, 2), padding="SAME",
            kernel_init=nn.initializers.normal(0.001),
            bias_init=nn.initializers.constant(prior),
            dtype=self.dtype, name=f"deconv2_{i}") for i in range(gp)]

        def head(feats):
            y = jnp.concatenate([deconv1[i](feats[i]) for i in range(gp)],
                                axis=-1)
            y = nn.relu(gn_d(y))
            h = [deconv2[i](y[..., i * c:(i + 1) * c]) for i in range(gp)]
            return jnp.concatenate(h, axis=-1).astype(jnp.float32)

        fused = head(x_so)
        if train:
            unfused = head(slices)
            return fused, unfused
        return fused, fused


class _ClsOnlyHead(nn.Module):
    """Shared2FCBBoxHead with with_reg=False (grid_rcnn config)."""

    num_classes: int
    fc_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        f = roi_feats.reshape(roi_feats.shape[0], -1).astype(self.dtype)
        for i in range(2):
            f = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                                 name=f"shared_fc{i}")(f))
        return nn.Dense(self.num_classes + 1,
                        kernel_init=nn.initializers.normal(0.01),
                        dtype=self.dtype,
                        name="fc_cls")(f).astype(jnp.float32)


class GridRCNN(nn.Module):
    """Backbone + FPN + RPN + cls-only Shared2FC head + GridHead."""

    cfg: Any  # GridRCNNConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=0,
                        num_outs=len(self.cfg.rpn.anchor_strides),
                        add_extra_convs="maxpool", dtype=dtype, name="neck")
        self.rpn_head = RPNHead(num_anchors=self.cfg.rpn.num_anchors,
                                feat_channels=self.cfg.fpn_channels,
                                dtype=dtype, name="rpn_head")
        self.grid_head = GridHead(
            grid_points=self.cfg.grid_points,
            num_convs=self.cfg.grid_convs,
            point_feat_channels=self.cfg.grid_point_channels,
            roi_feat_size=self.cfg.grid_roi_size,
            dtype=dtype, name="grid_head")
        self.cls_head = _ClsOnlyHead(num_classes=self.cfg.num_classes,
                                     fc_channels=self.cfg.rcnn.fc_channels,
                                     dtype=dtype, name="bbox_head")

    def features(self, images):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_cls(self, roi_feats):
        return self.cls_head(roi_feats)

    def grid(self, grid_feats, train: bool = False):
        return self.grid_head(grid_feats, train)

    def __call__(self, images):
        feats = self.features(images)
        rpn_cls, rpn_reg = self.rpn_head(feats)
        s = self.cfg.rcnn.roi_size
        dummy = jnp.zeros((1, s, s, self.cfg.fpn_channels), jnp.float32)
        cls = self.cls_head(dummy)
        g = self.cfg.grid_roi_size
        gd = jnp.zeros((1, g, g, self.cfg.fpn_channels), jnp.float32)
        heat, _ = self.grid_head(gd, False)
        return rpn_cls, rpn_reg, cls, heat


def build_grid_rcnn(cfg) -> GridRCNN:
    return GridRCNN(cfg=cfg)


def init_grid_rcnn(cfg, rng: jax.Array):
    model = build_grid_rcnn(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
