"""YOLOF: single-level C5 + dilated encoder + implicit-objectness head
(Flax).

Behavioral parity targets (reference, /root/reference):
* configs/yolof/yolof_r50_c5_8x8_1x_coco.py — R50 C5 only
  (frozen_stages 1, frozen BN), DilatedEncoder 2048->512 (mid 128,
  4 residual blocks), YOLOFHead (2 cls convs / 4 reg convs, BN),
  single-level stride-32 anchors scales (1, 2, 4, 8, 16) ratio 1.
* mmdet/models/necks/dilated_encoder.py — 1x1 lateral + BN, 3x3 fpn
  conv + BN (both activation-free), then four 1x1-3x3(dilated)-1x1
  bottlenecks (dilations 2, 4, 6, 8) with BN+ReLU on every conv and a
  residual add.
* mmdet/models/dense_heads/yolof_head.py:95-135 — cls/reg conv subnets
  (conv+BN+ReLU), cls_score/bbox_pred/object_pred 3x3 convs; implicit
  objectness fused as cls + obj - log(1 + exp(cls) + exp(obj)); conv
  std 0.01 init, cls bias prior 0.01.

The encoder/head BatchNorms TRAIN (requires_grad=True in the config):
the train step runs with mutable batch_stats while the R50 backbone
keeps its frozen running-stats BN.

Deviation (documented): the reference YOLOF config uses a caffe-style
R50; this build shares the framework's torchvision-style R50 — a
pretrained-weights convention, not an architecture change (same note as
FCOS, models/fcos.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .resnet import ResNet


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = x.astype(self.dtype)
        return nn.relu(x) if self.relu else x


class DilatedBottleneck(nn.Module):
    mid: int
    dilation: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.mid, 1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.mid, 3, dilation=self.dilation, dtype=self.dtype,
                   name="conv2")(y, train)
        y = ConvBN(x.shape[-1], 1, dtype=self.dtype, name="conv3")(y, train)
        return x + y


class DilatedEncoder(nn.Module):
    out_channels: int = 512
    mid_channels: int = 128
    dilations: tuple = (2, 4, 6, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c5, train: bool = False):
        x = ConvBN(self.out_channels, 1, relu=False, dtype=self.dtype,
                   name="lateral")(c5, train)
        x = ConvBN(self.out_channels, 3, relu=False, dtype=self.dtype,
                   name="fpn")(x, train)
        for i, d in enumerate(self.dilations):
            x = DilatedBottleneck(self.mid_channels, d, dtype=self.dtype,
                                  name=f"block_{i}")(x, train)
        return x


class YOLOFHead(nn.Module):
    num_classes: int
    num_anchors: int = 5
    num_cls_convs: int = 2
    num_reg_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """-> (normalized cls logits [B, A_tot, C], bbox deltas
        [B, A_tot, 4]) flattened over the single stride-32 level."""
        c = x.shape[-1]
        cls_feat = x
        for i in range(self.num_cls_convs):
            cls_feat = ConvBN(c, 3, dtype=self.dtype,
                              name=f"cls_conv_{i}")(cls_feat, train)
        reg_feat = x
        for i in range(self.num_reg_convs):
            reg_feat = ConvBN(c, 3, dtype=self.dtype,
                              name=f"reg_conv_{i}")(reg_feat, train)
        prior_bias = float(-np.log((1 - 0.01) / 0.01))
        norm01 = nn.initializers.normal(0.01)
        cls = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                      padding=((1, 1), (1, 1)), kernel_init=norm01,
                      bias_init=nn.initializers.constant(prior_bias),
                      dtype=self.dtype, name="cls_score")(cls_feat)
        reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=((1, 1), (1, 1)),
                      kernel_init=norm01, dtype=self.dtype,
                      name="bbox_pred")(reg_feat)
        obj = nn.Conv(self.num_anchors, (3, 3), padding=((1, 1), (1, 1)),
                      kernel_init=norm01, dtype=self.dtype,
                      name="object_pred")(reg_feat)

        b, h, w, _ = cls.shape
        a, nc = self.num_anchors, self.num_classes
        cls = cls.reshape(b, h * w * a, nc).astype(jnp.float32)
        obj = obj.reshape(b, h * w * a, 1).astype(jnp.float32)
        # implicit objectness (yolof_head.py:128-133), INF-clamped exps
        norm_cls = cls + obj - jnp.log(
            1.0 + jnp.clip(jnp.exp(cls), None, 1e8)
            + jnp.clip(jnp.exp(obj), None, 1e8))
        reg = reg.reshape(b, h * w * a, 4).astype(jnp.float32)
        return norm_cls, reg


class YOLOF(nn.Module):
    cfg: Any  # YOLOFConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.backbone = ResNet(block_counts=cfg.block_counts,
                               stem_width=cfg.stem_width, dtype=dtype,
                               name="backbone")
        self.encoder = DilatedEncoder(out_channels=cfg.encoder_channels,
                                      mid_channels=cfg.encoder_mid_channels,
                                      dilations=cfg.encoder_dilations,
                                      dtype=dtype, name="neck")
        self.head = YOLOFHead(num_classes=cfg.num_classes,
                              num_anchors=len(cfg.anchor_scales),
                              dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray, train: bool = False):
        c5 = self.backbone(images)[-1]
        return self.head(self.encoder(c5, train), train)


def build_yolof(cfg) -> YOLOF:
    return YOLOF(cfg=cfg)


def init_yolof(cfg, rng: jax.Array):
    model = build_yolof(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
