"""GN + Weight Standardization Faster R-CNN (Flax).

Behavioral parity targets (reference, /root/reference):
* configs/gn+ws/faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py — ConvWS
  (weight standardization) + GroupNorm(32) replace plain conv + BN in
  the backbone AND the FPN, and the RoI head becomes
  Shared4Conv1FCBBoxHead (4x ConvWS+GN+relu convs then one fc1024).
* ConvWS2d lives in mmcv (cnn/bricks/conv_ws.py): the kernel is
  standardized over (in, kh, kw) per out-channel with eps 1e-5 before
  the convolution — no learned weight affine.
* mmdet/models/roi_heads/bbox_heads/convfc_bbox_head.py
  (Shared4Conv1FCBBoxHead = ConvFCBBoxHead(num_shared_convs=4,
  num_shared_fcs=1)).

The 'gn' config family (configs/gn/: GN without WS) is the ws=False
flag on the same modules.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .detector import flatten_levels
from .two_stage import RPNHead


class ConvWS(nn.Module):
    """Weight-standardized conv (ConvWS2d)."""

    features: int
    kernel: int = 3
    stride: int = 1
    ws: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (k, k, x.shape[-1], self.features), jnp.float32)
        if self.ws:
            mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
            std = kernel.std(axis=(0, 1, 2), keepdims=True) + 1e-5
            kernel = (kernel - mean) / std
        p = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)


def _gn(channels, dtype, name):
    return nn.GroupNorm(num_groups=min(32, channels), epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class WSBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    ws: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = ConvWS(self.planes, 1, ws=self.ws, dtype=self.dtype,
                   name="conv1")(x)
        y = nn.relu(_gn(self.planes, self.dtype, "gn1")(y).astype(self.dtype))
        y = ConvWS(self.planes, 3, stride=self.stride, ws=self.ws,
                   dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_gn(self.planes, self.dtype, "gn2")(y).astype(self.dtype))
        y = ConvWS(self.planes * 4, 1, ws=self.ws, dtype=self.dtype,
                   name="conv3")(y)
        y = _gn(self.planes * 4, self.dtype, "gn3")(y).astype(self.dtype)
        if self.downsample:
            identity = ConvWS(self.planes * 4, 1, stride=self.stride,
                              ws=self.ws, dtype=self.dtype,
                              name="downsample_conv")(x)
            identity = _gn(self.planes * 4, self.dtype,
                           "downsample_gn")(identity).astype(self.dtype)
        return nn.relu(y + identity)


class WSResNet(nn.Module):
    block_counts: Sequence[int] = (3, 4, 6, 3)
    stem_width: int = 64
    ws: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvWS(self.stem_width, 7, stride=2, ws=self.ws,
                   dtype=self.dtype, name="conv1")(x.astype(self.dtype))
        x = nn.relu(_gn(self.stem_width, self.dtype,
                        "gn1")(x).astype(self.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for stage, n in enumerate(self.block_counts):
            planes = self.stem_width * (2 ** stage)
            for b in range(n):
                x = WSBottleneck(planes=planes,
                                 stride=2 if (stage > 0 and b == 0) else 1,
                                 downsample=(b == 0), ws=self.ws,
                                 dtype=self.dtype,
                                 name=f"layer{stage + 1}_{b}")(x)
            outs.append(x)
        return tuple(outs)


class WSFPN(nn.Module):
    """FPN with ConvWS + GN on the lateral and output convs (no act,
    mmdet FPN ConvModule convention); extra level = stride-2 maxpool."""

    out_channels: int = 256
    num_outs: int = 5
    ws: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        c = self.out_channels
        lats = []
        for i, f in enumerate(inputs):
            y = ConvWS(c, 1, ws=self.ws, dtype=self.dtype,
                       name=f"lateral_{i}")(f)
            lats.append(_gn(c, self.dtype,
                            f"lateral_gn_{i}")(y).astype(self.dtype))
        for i in range(len(lats) - 2, -1, -1):
            up = lats[i + 1]
            b, h, w, ch = up.shape
            up = jnp.broadcast_to(up[:, :, None, :, None, :],
                                  (b, h, 2, w, 2, ch)).reshape(
                b, 2 * h, 2 * w, ch)
            lats[i] = lats[i] + up[:, :lats[i].shape[1], :lats[i].shape[2]]
        outs = []
        for i, f in enumerate(lats):
            y = ConvWS(c, 3, ws=self.ws, dtype=self.dtype,
                       name=f"fpn_{i}")(f)
            outs.append(_gn(c, self.dtype,
                            f"fpn_gn_{i}")(y).astype(self.dtype))
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


class Shared4Conv1FCBBoxHead(nn.Module):
    num_classes: int
    conv_channels: int = 256
    fc_channels: int = 1024
    ws: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        from jax.nn.initializers import normal, xavier_uniform, zeros

        x = roi_feats.astype(self.dtype)
        for i in range(4):
            x = ConvWS(self.conv_channels, 3, ws=self.ws, dtype=self.dtype,
                       name=f"shared_conv_{i}")(x)
            x = nn.relu(_gn(self.conv_channels, self.dtype,
                            f"shared_gn_{i}")(x).astype(self.dtype))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xavier_uniform(),
                             bias_init=zeros, dtype=self.dtype,
                             name="shared_fc_0")(x))
        cls = nn.Dense(self.num_classes + 1, kernel_init=normal(0.01),
                       bias_init=zeros, dtype=self.dtype, name="fc_cls")(x)
        reg = nn.Dense(self.num_classes * 4, kernel_init=normal(0.001),
                       bias_init=zeros, dtype=self.dtype, name="fc_reg")(x)
        return (cls.astype(jnp.float32),
                reg.astype(jnp.float32).reshape(-1, self.num_classes, 4))


class GNWSFasterRCNN(nn.Module):
    """Faster R-CNN surface (features/rpn/roi_forward) over the WS+GN
    stack; engine/two_stage.py drives it unchanged."""

    cfg: Any  # GNWSFasterRCNNConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        ws = self.cfg.weight_standardize
        self.backbone = WSResNet(block_counts=self.cfg.block_counts,
                                 stem_width=self.cfg.stem_width, ws=ws,
                                 dtype=dtype, name="backbone")
        self.neck = WSFPN(out_channels=self.cfg.fpn_channels,
                          num_outs=len(self.cfg.rpn.anchor_strides), ws=ws,
                          dtype=dtype, name="neck")
        self.rpn_head = RPNHead(num_anchors=self.cfg.rpn.num_anchors,
                                feat_channels=self.cfg.fpn_channels,
                                dtype=dtype, name="rpn_head")
        self.bbox_head = Shared4Conv1FCBBoxHead(
            num_classes=self.cfg.num_classes,
            conv_channels=self.cfg.fpn_channels,
            fc_channels=self.cfg.rcnn.fc_channels, ws=ws, dtype=dtype,
            name="bbox_head")

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_forward(self, roi_feats: jnp.ndarray):
        return self.bbox_head(roi_feats)

    def __call__(self, images: jnp.ndarray):
        feats = self.features(images)
        rpn_cls, rpn_reg = self.rpn_head(feats)
        s = self.cfg.rcnn.roi_size
        dummy = jnp.zeros((1, s, s, self.cfg.fpn_channels), jnp.float32)
        cls, reg = self.bbox_head(dummy)
        return rpn_cls, rpn_reg, cls, reg


def build_gn_ws(cfg) -> GNWSFasterRCNN:
    return GNWSFasterRCNN(cfg=cfg)


def init_gn_ws(cfg, rng: jax.Array):
    model = build_gn_ws(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
