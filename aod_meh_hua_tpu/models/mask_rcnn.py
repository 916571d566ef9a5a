"""Mask R-CNN model components (Flax): the Faster R-CNN trunk plus the
FCN mask head.

Behavioral parity targets (reference, /root/reference):
* configs/_base_/models/mask_rcnn_r50_fpn.py — Faster R-CNN R50-FPN with
  a mask branch: SingleRoIExtractor(RoIAlign 14, strides 4-32) +
  FCNMaskHead(num_convs=4, 256ch, deconv x2, 1x1 -> num_classes),
  mask_size 28.
* mmdet/models/roi_heads/mask_heads/fcn_mask_head.py:22-140 — 3x3 convs
  + ReLU, ConvTranspose2d(2, stride 2) + ReLU, 1x1 conv_logits; per-class
  sigmoid masks.
* mmdet/models/detectors/mask_rcnn.py:1 (TwoStageDetector assembly).

TPU-first: as with FasterRCNN, the module holds parameters and pure
forwards; sampling/targets/losses live in engine/mask_rcnn.py inside one
fused jit region (mask targets are generated ON DEVICE from box-aligned
GT rasters — see the engine docstring for the transport redesign).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .two_stage import RPNHead, Shared2FCBBoxHead
from .fpn import FPN
from .resnet import ResNet


class FCNMaskHead(nn.Module):
    """[N, 14, 14, C] RoI features -> [N, 28, 28, num_classes] logits."""

    num_classes: int
    num_convs: int = 4
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                                dtype=self.dtype, name=f"conv_{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="upsample")(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="conv_logits")(x)
        return logits.astype(jnp.float32)


class MaskRCNN(nn.Module):
    """Faster R-CNN trunk + FCN mask head; same method surface as
    FasterRCNN plus mask_forward."""

    cfg: Any  # MaskRCNNConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d,
            dcn=getattr(self.cfg, "backbone_dcn", None),
            gcb_ratio=getattr(self.cfg, "backbone_gcb_ratio", None),
            dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=0,
                        num_outs=len(self.cfg.rpn.anchor_strides),
                        add_extra_convs="maxpool", dtype=dtype, name="neck")
        self.rpn_head = RPNHead(num_anchors=self.cfg.rpn.num_anchors,
                                feat_channels=self.cfg.fpn_channels,
                                dtype=dtype, name="rpn_head")
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.cfg.num_classes,
                                           cls_channels=getattr(
                                               self.cfg, "cls_channels", 0),
                                           fc_channels=self.cfg.rcnn.fc_channels,
                                           dtype=dtype, name="bbox_head")
        self.mask_head = FCNMaskHead(num_classes=self.cfg.num_classes,
                                     num_convs=self.cfg.mask_convs,
                                     channels=self.cfg.mask_channels,
                                     dtype=dtype, name="mask_head")

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_forward(self, roi_feats: jnp.ndarray):
        return self.bbox_head(roi_feats)

    def mask_forward(self, mask_roi_feats: jnp.ndarray):
        return self.mask_head(mask_roi_feats)

    def __call__(self, images: jnp.ndarray):
        """Init/compile-check forward: builds every parameter."""
        feats = self.features(images)
        rpn_cls, rpn_reg = self.rpn_head(feats)
        s = self.cfg.rcnn.roi_size
        dummy = jnp.zeros((1, s, s, self.cfg.fpn_channels), jnp.float32)
        cls, reg = self.bbox_head(dummy)
        ms = self.cfg.mask_roi_size
        mdummy = jnp.zeros((1, ms, ms, self.cfg.fpn_channels), jnp.float32)
        masks = self.mask_head(mdummy)
        return rpn_cls, rpn_reg, cls, reg, masks


def build_mask_rcnn(cfg) -> MaskRCNN:
    return MaskRCNN(cfg=cfg)


def init_mask_rcnn(cfg, rng: jax.Array):
    model = build_mask_rcnn(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
