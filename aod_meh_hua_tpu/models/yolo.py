"""YOLOv3: Darknet-53 backbone, YOLOV3 neck/head (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/backbones/darknet.py — Darknet-53: 3x3/32 stem, five
  stages of (stride-2 3x3 doubling conv + n residual [1x1 half, 3x3
  restore] blocks) with n = (1, 2, 8, 8, 4), BN + LeakyReLU(0.1),
  out_indices (3, 4, 5) -> strides 8/16/32.
* mmdet/models/necks/yolo_neck.py — per scale a DetectionBlock (five
  alternating 1x1/3x3 ConvModules); coarser scales feed a 1x1-conv +
  2x nearest-upsample + concat into the next block.
* mmdet/models/dense_heads/yolo_head.py — per scale: 3x3 ConvModule +
  1x1 prediction conv with A * (5 + C) channels (xy, wh, objectness,
  class logits).

Unlike the rest of the zoo (frozen-BN ResNet), Darknet trains its BN:
the train step runs with mutable batch_stats (engine/yolo.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvModule(nn.Module):
    """conv + BN + LeakyReLU(0.1) (the reference's ConvModule default for
    the YOLO family)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    train_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not (train and self.train_bn),
                         momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
                         name="bn")(x)
        return nn.leaky_relu(x.astype(self.dtype), 0.1)


class DarknetResBlock(nn.Module):
    channels: int  # block output channels (= input)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvModule(self.channels // 2, 1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvModule(self.channels, 3, dtype=self.dtype, name="conv2")(y, train)
        return x + y


class Darknet53(nn.Module):
    """Returns (C3, C4, C5) at strides (8, 16, 32)."""

    block_counts: Sequence[int] = (1, 2, 8, 8, 4)
    stem_width: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = ConvModule(self.stem_width, 3, dtype=self.dtype, name="conv1")(x, train)
        outs = []
        c = self.stem_width
        for stage, n in enumerate(self.block_counts):
            c = c * 2
            x = ConvModule(c, 3, stride=2, dtype=self.dtype,
                           name=f"down_{stage}")(x, train)
            for b in range(n):
                x = DarknetResBlock(c, dtype=self.dtype,
                                    name=f"stage{stage}_{b}")(x, train)
            if stage >= 2:  # out_indices (3, 4, 5) in the reference's 1-based stages
                outs.append(x)
        return tuple(outs)  # strides 8, 16, 32


class DetectionBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.out_channels
        x = ConvModule(c, 1, dtype=self.dtype, name="conv1")(x, train)
        x = ConvModule(c * 2, 3, dtype=self.dtype, name="conv2")(x, train)
        x = ConvModule(c, 1, dtype=self.dtype, name="conv3")(x, train)
        x = ConvModule(c * 2, 3, dtype=self.dtype, name="conv4")(x, train)
        return ConvModule(c, 1, dtype=self.dtype, name="conv5")(x, train)


class YOLOV3Neck(nn.Module):
    """Inputs (C3, C4, C5); outputs coarse-to-fine (P5, P4, P3) feature
    maps with out_channels (512, 256, 128)."""

    out_channels: Sequence[int] = (512, 256, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        outs = []
        x = DetectionBlock(self.out_channels[0], dtype=self.dtype,
                           name="detect1")(c5, train)
        outs.append(x)
        for i, skip in enumerate((c4, c3)):
            y = ConvModule(self.out_channels[i + 1], 1, dtype=self.dtype,
                           name=f"conv{i + 1}")(x, train)
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)  # 2x nearest
            y = jnp.concatenate([y, skip.astype(y.dtype)], axis=-1)
            x = DetectionBlock(self.out_channels[i + 1], dtype=self.dtype,
                               name=f"detect{i + 2}")(y, train)
            outs.append(x)
        return tuple(outs)  # strides 32, 16, 8


class YOLOV3Head(nn.Module):
    num_classes: int
    head_channels: Sequence[int] = (1024, 512, 256)
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """Per-level [B, H, W, A*(5+C)] prediction maps, coarse-to-fine
        (strides 32, 16, 8), flattened to [B, A_tot, 5+C] f32."""
        from .detector import flatten_levels
        from jax.nn.initializers import normal, zeros

        attrib = 5 + self.num_classes
        maps = []
        for i, f in enumerate(feats):
            x = ConvModule(self.head_channels[i], 3, dtype=self.dtype,
                           name=f"conv_pred_{i}")(f, train)
            maps.append(nn.Conv(self.num_anchors * attrib, (1, 1),
                                kernel_init=normal(0.01), bias_init=zeros,
                                dtype=self.dtype, name=f"pred_{i}")(x))
        return flatten_levels(maps, attrib).astype(jnp.float32)


class YOLOV3(nn.Module):
    cfg: Any  # YOLOConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        self.backbone = Darknet53(block_counts=self.cfg.block_counts,
                                  stem_width=self.cfg.stem_width,
                                  dtype=dtype, name="backbone")
        self.neck = YOLOV3Neck(out_channels=self.cfg.neck_channels,
                               dtype=dtype, name="neck")
        self.head = YOLOV3Head(num_classes=self.cfg.num_classes,
                               head_channels=self.cfg.head_channels,
                               dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = self.neck(self.backbone(images, train), train)
        return self.head(feats, train)


def build_yolov3(cfg) -> YOLOV3:
    return YOLOV3(cfg=cfg)


def init_yolov3(cfg, rng: jax.Array):
    model = build_yolov3(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
