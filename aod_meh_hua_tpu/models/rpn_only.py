"""RPN (proposal-only) and Fast R-CNN models (Flax) — the two detachable
halves of the two-stage pipeline the reference registers as standalone
detectors.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/detectors/rpn.py:13 + configs/rpn/rpn_r50_fpn_1x_coco.py —
  backbone + FPN + RPNHead trained alone on class-agnostic gt boxes,
  evaluated by proposal recall (evaluation metric='proposal_fast').
* mmdet/models/detectors/fast_rcnn.py:1 +
  configs/fast_rcnn/fast_rcnn_r50_fpn_1x_coco.py — backbone + FPN + RoI
  head consuming EXTERNALLY supplied proposals (the reference loads
  proposal .pkl files; here they arrive as arrays in the batch).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fpn import FPN
from .resnet import ResNet
from .two_stage import RPNHead, Shared2FCBBoxHead


class RPNOnly(nn.Module):
    cfg: Any  # RPNConfig

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

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def __call__(self, images: jnp.ndarray):
        return self.rpn_head(self.features(images))


class FastRCNN(nn.Module):
    cfg: Any  # FastRCNNConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=0,
                        num_outs=len(self.cfg.rpn.anchor_strides),
                        add_extra_convs="maxpool", dtype=dtype, name="neck")
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.cfg.num_classes,
            fc_channels=self.cfg.rcnn.fc_channels, dtype=dtype,
            name="bbox_head")

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def roi_forward(self, roi_feats: jnp.ndarray):
        return self.bbox_head(roi_feats)

    def __call__(self, images: jnp.ndarray):
        feats = self.features(images)
        s = self.cfg.rcnn.roi_size
        dummy = jnp.zeros((1, s, s, self.cfg.fpn_channels), jnp.float32)
        return feats, self.bbox_head(dummy)


def build_rpn_only(cfg) -> RPNOnly:
    return RPNOnly(cfg=cfg)


def init_rpn_only(cfg, rng: jax.Array):
    model = build_rpn_only(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables


def build_fast_rcnn(cfg) -> FastRCNN:
    return FastRCNN(cfg=cfg)


def init_fast_rcnn(cfg, rng: jax.Array):
    model = build_fast_rcnn(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
