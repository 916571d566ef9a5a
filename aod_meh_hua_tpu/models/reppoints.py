"""RepPoints: point-set object representation (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/reppoints_head.py:124-167 (_init_layers: 3
  plain conv towers, 3x3 DeformConv2d cls/refine extractors over the 9
  predicted points, 1x1 outs; cls bias prior 0.01), :258-299
  (forward_single: center-init points, gradient_mul trick on the init
  offsets, refine = refine_out + detached init), :168-221 (points2bbox
  'moment': mean +/- std * exp(moment_transfer), moment_mul gradient
  split).
* configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py — R50 + FPN
  (start_level 1, extra convs on input), point_strides (8..128),
  point_base_scale 4, num_points 9, gradient_mul 0.1.

TPU redesign: DeformConv2d becomes 9 bilinear gathers (zero padding
outside, the mmcv im2col rule) + a 1x1 contraction per kernel tap —
dense, static-shaped, MXU-friendly; no custom kernel. The deformable
point set is the mechanism RepPoints adds over the other archetypes.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .detector import flatten_levels
from .fpn import FPN
from .resnet import ResNet

# 3x3 kernel tap offsets in (y, x), matching dcn_base_offset
# (reppoints_head.py:79-84): y-major, y_first interleave
_BASE_YX = np.stack(np.meshgrid(np.arange(-1, 2), np.arange(-1, 2),
                                indexing="ij"), axis=-1).reshape(9, 2)


def _bilinear_zero(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample feat [H, W, C] at float coords [N] with ZERO padding
    outside (mmcv deform-conv im2col rule: each of the 4 neighbors
    contributes only if it lies inside the map)."""
    h, w, c = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    flat = feat.reshape(h * w, c)

    def take(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        return jnp.where(ok[:, None], jnp.take(flat, idx.astype(jnp.int32),
                                               axis=0), 0.0)

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    return (take(y0i, x0i) * ((1 - ly) * (1 - lx))[:, None]
            + take(y0i, x0i + 1) * ((1 - ly) * lx)[:, None]
            + take(y0i + 1, x0i) * (ly * (1 - lx))[:, None]
            + take(y0i + 1, x0i + 1) * (ly * lx)[:, None])


class DeformConv3x3(nn.Module):
    """DeformConv2d(kernel 3, pad 1): sample the 9 taps at
    grid + offsets and contract each tap with its kernel slice."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offsets):
        """x [B, H, W, Cin]; offsets [B, H, W, 18] RELATIVE to the
        standard taps, (y, x) interleaved (the reference passes
        pts - dcn_base_offset, so tap location = pixel + point)."""
        b, h, w, cin = x.shape
        kernel = self.param("kernel", nn.initializers.he_uniform(),
                            (9, cin, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else jnp.zeros((self.features,), jnp.float32))
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")

        def one_image(feat, off):
            out = jnp.zeros((h * w, self.features), self.dtype)
            for k in range(9):
                ys = (gy + _BASE_YX[k, 0] + off[..., 2 * k]).reshape(-1)
                xs = (gx + _BASE_YX[k, 1] + off[..., 2 * k + 1]).reshape(-1)
                sampled = _bilinear_zero(feat, ys, xs)  # [H*W, Cin]
                out = out + (sampled @ kernel[k].astype(sampled.dtype)
                             ).astype(self.dtype)
            return out.reshape(h, w, self.features)

        y = jax.vmap(one_image)(x.astype(self.dtype),
                                offsets.astype(jnp.float32))
        return y + bias.astype(self.dtype)


class ConvTower(nn.Module):
    """stacked_convs x (3x3 conv + ReLU), no norm (the base moment
    config; the gn-neck+head variant adds GN)."""

    features: int
    num: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=nn.initializers.normal(0.01),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        return x


class RepPointsHead(nn.Module):
    num_classes: int
    num_levels: int = 5
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    moment_mul: float = 0.01
    dtype: Any = jnp.float32

    def setup(self):
        prior = -math.log((1 - 0.01) / 0.01)
        self.cls_tower = ConvTower(self.feat_channels, self.stacked_convs,
                                   self.dtype, name="cls_tower")
        self.reg_tower = ConvTower(self.feat_channels, self.stacked_convs,
                                   self.dtype, name="reg_tower")
        self.pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                                     padding=((1, 1), (1, 1)),
                                     kernel_init=nn.initializers.normal(0.01),
                                     dtype=self.dtype, name="pts_init_conv")
        self.pts_init_out = nn.Conv(2 * self.num_points, (1, 1),
                                    kernel_init=nn.initializers.normal(0.01),
                                    dtype=self.dtype, name="pts_init_out")
        self.cls_conv = DeformConv3x3(self.point_feat_channels,
                                      dtype=self.dtype, name="cls_conv")
        self.cls_out = nn.Conv(
            self.num_classes, (1, 1), kernel_init=nn.initializers.normal(0.01),
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, prior, d),
            dtype=self.dtype, name="cls_out")
        self.pts_refine_conv = DeformConv3x3(self.point_feat_channels,
                                             dtype=self.dtype,
                                             name="pts_refine_conv")
        self.pts_refine_out = nn.Conv(2 * self.num_points, (1, 1),
                                      kernel_init=nn.initializers.normal(0.01),
                                      dtype=self.dtype, name="pts_refine_out")
        # points2bbox 'moment' scales, shared across levels
        self.moment_transfer = self.param(
            "moment_transfer", nn.initializers.zeros, (2,), jnp.float32)

    def __call__(self, feats: Sequence[jnp.ndarray]):
        """-> (cls [B, P, C] logits, pts_init [B, P, 2n] (y, x) offsets
        in stride units, pts_refine [B, P, 2n], moments [2])."""
        base = jnp.asarray(_BASE_YX.reshape(-1), jnp.float32)
        cls_l, init_l, refine_l = [], [], []
        for f in feats:
            cf = self.cls_tower(f)
            pf = self.reg_tower(f)
            pts_init = self.pts_init_out(
                nn.relu(self.pts_init_conv(pf))).astype(jnp.float32)
            grad_mul = ((1 - self.gradient_mul) * jax.lax.stop_gradient(pts_init)
                        + self.gradient_mul * pts_init)
            dcn_off = grad_mul - base
            cls = self.cls_out(nn.relu(self.cls_conv(cf, dcn_off)))
            refine = self.pts_refine_out(
                nn.relu(self.pts_refine_conv(pf, dcn_off))).astype(jnp.float32)
            refine = refine + jax.lax.stop_gradient(pts_init)
            cls_l.append(cls)
            init_l.append(pts_init)
            refine_l.append(refine)
        n2 = 2 * self.num_points
        mt = (self.moment_transfer * self.moment_mul
              + jax.lax.stop_gradient(self.moment_transfer) * (1 - self.moment_mul))
        return (flatten_levels(cls_l, self.num_classes).astype(jnp.float32),
                flatten_levels(init_l, n2), flatten_levels(refine_l, n2), mt)


class RepPoints(nn.Module):
    cfg: Any  # RepPointsConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.strides),
                        add_extra_convs="on_input", dtype=dtype, name="neck")
        self.head = RepPointsHead(
            num_classes=self.cfg.num_classes, num_levels=len(self.cfg.strides),
            feat_channels=self.cfg.feat_channels,
            point_feat_channels=self.cfg.point_feat_channels,
            stacked_convs=self.cfg.stacked_convs,
            num_points=self.cfg.num_points,
            gradient_mul=self.cfg.gradient_mul, dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray):
        return self.head(self.neck(self.backbone(images)))


def init_reppoints(cfg, rng: jax.Array):
    model = RepPoints(cfg=cfg)
    h, w = cfg.canvas
    variables = model.init(rng, jnp.zeros((1, h, w, 3), jnp.float32))
    return model, variables
