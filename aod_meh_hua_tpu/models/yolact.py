"""YOLACT model (Flax): SSD-style anchor head + mask-coefficient branch,
protonet, and the auxiliary semantic segm head.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/yolact_head.py:
  - YOLACTHead (:14-137): one shared 3x3 head conv, then parallel 3x3
    cls (softmax C+1), reg (4), coeff (num_protos, tanh) convs; 3
    anchors per cell (base_sizes [8..128], ratios .5/1/2).
  - YOLACTProtonet (:583-733): convs (256,3)x3 -> bilinear x2 ->
    (256,3) -> (32,1) on P3; prototypes in NHWC; masks = sigmoid(
    protos @ coeffs) cropped by boxes.
  - YOLACTSegmHead (:460-580): one 1x1 conv on P3 -> C binary maps.
* configs/yolact/yolact_r50_1x8_coco.py (num_head_convs 1, protos 32).

TPU notes: the reference's 550-pixel geometry (feature sizes 69..5)
is replaced by a /32-divisible canvas with standard strides — anchors
keep the same base_sizes/ratios parameterization.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .detector import flatten_levels
from .fpn import FPN, nearest_resize
from .resnet import ResNet


class YOLACTHead(nn.Module):
    num_classes: int
    num_anchors: int = 3
    num_protos: int = 32
    num_head_convs: int = 1
    feat_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        # the head is SHARED across levels (AnchorHead convention):
        # instantiate each conv once, apply per level
        head_convs = [nn.Conv(self.feat_channels, (3, 3),
                              padding=((1, 1), (1, 1)), dtype=self.dtype,
                              name=f"head_conv{i}")
                      for i in range(self.num_head_convs)]
        conv_cls = nn.Conv(self.num_anchors * (self.num_classes + 1), (3, 3),
                           padding=((1, 1), (1, 1)), dtype=self.dtype,
                           name="conv_cls")
        conv_reg = nn.Conv(self.num_anchors * 4, (3, 3),
                           padding=((1, 1), (1, 1)), dtype=self.dtype,
                           name="conv_reg")
        conv_coeff = nn.Conv(self.num_anchors * self.num_protos, (3, 3),
                             padding=((1, 1), (1, 1)), dtype=self.dtype,
                             name="conv_coeff")
        cls_m, reg_m, cof_m = [], [], []
        for f in feats:
            x = f.astype(self.dtype)
            for conv in head_convs:
                x = nn.relu(conv(x))
            cls_m.append(conv_cls(x))
            reg_m.append(conv_reg(x))
            cof_m.append(nn.tanh(conv_coeff(x)))
        cls = flatten_levels(cls_m, self.num_classes + 1).astype(jnp.float32)
        reg = flatten_levels(reg_m, 4).astype(jnp.float32)
        cof = flatten_levels(cof_m, self.num_protos).astype(jnp.float32)
        return cls, reg, cof


class Protonet(nn.Module):
    num_protos: int = 32
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p3):
        x = p3.astype(self.dtype)
        for i in range(3):
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                padding=((1, 1), (1, 1)),
                                dtype=self.dtype, name=f"conv{i}")(x))
        h, w = x.shape[1] * 2, x.shape[2] * 2
        x = nearest_resize(x, (h, w))  # reference: bilinear x2; nearest
        # keeps the static-gather path (tested adequate for parity of
        # the learned pipeline, not bit-exact interpolation)
        x = nn.relu(nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="conv3")(x))
        x = nn.relu(nn.Conv(self.num_protos, (1, 1), dtype=self.dtype,
                            name="conv_proto")(x))
        return x.astype(jnp.float32)  # [B, H4, W4, P]


class YOLACT(nn.Module):
    cfg: Any  # YOLACTConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.strides),
                        add_extra_convs="on_input", dtype=dtype, name="neck")
        self.head = YOLACTHead(num_classes=self.cfg.num_classes,
                               num_anchors=self.cfg.num_anchors,
                               num_protos=self.cfg.num_protos,
                               num_head_convs=self.cfg.num_head_convs,
                               feat_channels=self.cfg.feat_channels,
                               dtype=dtype, name="head")
        self.protonet = Protonet(num_protos=self.cfg.num_protos,
                                 channels=self.cfg.proto_channels,
                                 dtype=dtype, name="protonet")
        self.segm_conv = nn.Conv(self.cfg.num_classes, (1, 1),
                                 dtype=dtype, name="segm_head")

    def __call__(self, images: jnp.ndarray):
        feats = self.neck(self.backbone(images))
        cls, reg, cof = self.head(feats)
        protos = self.protonet(feats[0])
        segm = self.segm_conv(feats[0]).astype(jnp.float32)
        return cls, reg, cof, protos, segm


def build_yolact(cfg) -> YOLACT:
    return YOLACT(cfg=cfg)


def init_yolact(cfg, rng: jax.Array):
    model = build_yolact(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
