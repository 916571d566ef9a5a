"""CenterNet (Objects as Points): ResNet-18 + deconv neck + center
heatmap / wh / offset heads (Flax).

Behavioral parity targets (reference, /root/reference):
* configs/centernet/centernet_resnet18_140e_coco.py — ResNet-18
  (BasicBlock, TRAINED BatchNorm: norm_eval=False), CTResNetNeck
  in_channel 512, deconv filters (256, 128, 64) kernel 4 (use_dcn=False
  variant), head in/feat channel 64; test_cfg topk 100, local max 3.
* mmdet/models/necks/ct_resnet_neck.py:37-62 — per stage a 3x3
  ConvModule (conv+BN+ReLU) followed by a 4x4 stride-2 ConvTranspose +
  BN + ReLU; output stride 4.
* mmdet/models/dense_heads/centernet_head.py:50-75 — each branch is
  3x3 conv(feat) + ReLU + 1x1 conv(out); heatmap bias init to
  prob 0.1, wh/offset convs std 0.001.

The keypoint-heatmap archetype is the TPU-friendliest of the zoo: a
single stride-4 map, no anchors, no NMS (3x3 local-max pooling).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x.astype(self.dtype))


class BasicBlock(nn.Module):
    """torchvision BasicBlock (3x3 + 3x3, trained BN)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y.astype(self.dtype))
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=jnp.float32,
                                    name="downsample_bn")(identity)
        return nn.relu(y.astype(self.dtype) + identity.astype(self.dtype))


class ResNetBasic(nn.Module):
    """BasicBlock ResNet (18: (2,2,2,2)) returning C5 (stride 32),
    BatchNorm trained."""

    block_counts: Sequence[int] = (2, 2, 2, 2)
    stem_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_width, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x.astype(self.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        width = self.stem_width
        for stage, n in enumerate(self.block_counts):
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = BasicBlock(width, stride=stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
            width *= 2
        return x  # C5


class CTResNetNeck(nn.Module):
    """3x (3x3 ConvModule + 4x4 stride-2 ConvTranspose + BN + ReLU):
    stride 32 -> 4."""

    deconv_filters: Sequence[int] = (256, 128, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.deconv_filters):
            x = ConvBNReLU(f, 3, dtype=self.dtype, name=f"conv_{i}")(x, train)
            x = nn.ConvTranspose(f, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=self.dtype,
                                 name=f"deconv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"deconv_bn_{i}")(x)
            x = nn.relu(x.astype(self.dtype))
        return x


class CenterNetHead(nn.Module):
    num_classes: int
    feat_channel: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from jax.nn.initializers import normal, zeros

        def branch(out, name, bias_init, kernel_init):
            y = nn.Conv(self.feat_channel, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=kernel_init, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            y = nn.relu(y)
            return nn.Conv(out, (1, 1), bias_init=bias_init,
                           kernel_init=kernel_init, dtype=self.dtype,
                           name=f"{name}_out")(y)

        # heatmap bias -> prior prob 0.1 (bias_init_with_prob)
        prior_bias = float(-np.log((1 - 0.1) / 0.1))
        heat = branch(self.num_classes, "heatmap",
                      nn.initializers.constant(prior_bias), normal(0.001))
        wh = branch(2, "wh", zeros, normal(0.001))
        offset = branch(2, "offset", zeros, normal(0.001))
        return (heat.astype(jnp.float32), wh.astype(jnp.float32),
                offset.astype(jnp.float32))


class CenterNet(nn.Module):
    cfg: Any  # CenterNetConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        self.backbone = ResNetBasic(block_counts=self.cfg.block_counts,
                                    stem_width=self.cfg.stem_width,
                                    dtype=dtype, name="backbone")
        self.neck = CTResNetNeck(deconv_filters=self.cfg.deconv_filters,
                                 dtype=dtype, name="neck")
        self.head = CenterNetHead(num_classes=self.cfg.num_classes,
                                  feat_channel=self.cfg.feat_channel,
                                  dtype=dtype, name="head")

    def __call__(self, images: jnp.ndarray, train: bool = False):
        """-> (heatmap logits [B, H/4, W/4, C], wh [B, H/4, W/4, 2],
        offset [B, H/4, W/4, 2]), all f32 NHWC."""
        return self.head(self.neck(self.backbone(images, train), train), train)


def build_centernet(cfg) -> CenterNet:
    return CenterNet(cfg=cfg)


def init_centernet(cfg, rng: jax.Array):
    model = build_centernet(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
