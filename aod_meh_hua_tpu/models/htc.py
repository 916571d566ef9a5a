"""Hybrid Task Cascade (HTC) model (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/htc_roi_head.py:11-46 — cascade trunk with
  per-stage bbox AND mask heads, semantic branch fused into both
  (semantic_fusion=('bbox', 'mask')), interleaved execution and mask
  information flow.
* mmdet/models/roi_heads/mask_heads/htc_mask_head.py:8-38 — FCN mask
  head whose input can be fused with the previous stage's mask features
  through a 1x1 conv_res; returns (logits, features).
* mmdet/models/roi_heads/mask_heads/fused_semantic_head.py:10-130 —
  per-level 1x1 laterals summed at the fusion level (stride 8), 4x 3x3
  convs, then a 1x1 seg-logit branch and a 1x1 embedding branch.
* configs/htc/htc_r50_fpn_1x_coco.py (3 stages, semantic classes 183,
  loss weight 0.2).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fpn import FPN, nearest_resize
from .resnet import ResNet
from .two_stage import RPNHead, Shared2FCBBoxHead


class HTCMaskHead(nn.Module):
    """FCN mask head with the info-flow residual input. Call returns
    (logits [N, 2s, 2s, C], feats [N, s, s, ch])."""

    num_classes: int
    num_convs: int = 4
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, res_feat=None):
        x = x.astype(self.dtype)
        if res_feat is not None:
            # conv_res emits the INPUT width (reference: in_channels ==
            # conv_out_channels == 256; the tiny configs diverge)
            x = x + nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                            name="conv_res")(res_feat.astype(self.dtype))
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                padding=((1, 1), (1, 1)),
                                dtype=self.dtype, name=f"conv_{i}")(x))
        feats = x
        y = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="upsample")(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="conv_logits")(y)
        return logits.astype(jnp.float32), feats


class FusedSemanticHead(nn.Module):
    """-> (seg logits [B, H8, W8, seg_classes], embedding [B, H8, W8, ch])."""

    seg_classes: int
    fusion_level: int = 1
    num_convs: int = 4
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        target = feats[self.fusion_level].shape[1:3]
        fused = None
        for i, f in enumerate(feats):
            y = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name=f"lateral_{i}")(f)
            if y.shape[1:3] != target:
                y = nearest_resize(y, target)
            fused = y if fused is None else fused + y
        for i in range(self.num_convs):
            fused = nn.relu(nn.Conv(self.channels, (3, 3),
                                    padding=((1, 1), (1, 1)),
                                    dtype=self.dtype, name=f"conv_{i}")(fused))
        emb = nn.relu(nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                              name="conv_embedding")(fused))
        logits = nn.Conv(self.seg_classes, (1, 1), dtype=self.dtype,
                         name="conv_logits")(fused)
        return logits.astype(jnp.float32), emb


class HTC(nn.Module):
    cfg: Any  # HTCConfig

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
        self.bbox_heads = [
            Shared2FCBBoxHead(num_classes=self.cfg.num_classes,
                              fc_channels=self.cfg.rcnn.fc_channels,
                              reg_class_agnostic=True,
                              dtype=dtype, name=f"bbox_head_{i}")
            for i in range(self.cfg.num_stages)
        ]
        self.mask_heads = [
            HTCMaskHead(num_classes=self.cfg.num_classes,
                        num_convs=self.cfg.mask_convs,
                        channels=self.cfg.mask_channels,
                        dtype=dtype, name=f"mask_head_{i}")
            for i in range(self.cfg.num_stages)
        ]
        self.semantic_head = FusedSemanticHead(
            seg_classes=self.cfg.seg_classes,
            channels=self.cfg.fpn_channels, dtype=dtype,
            name="semantic_head")

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def semantic(self, feats):
        return self.semantic_head(feats)

    def roi_forward(self, roi_feats: jnp.ndarray, stage: int):
        return self.bbox_heads[stage](roi_feats)

    def mask_forward(self, mask_feats: jnp.ndarray, stage: int,
                     res_feat=None):
        return self.mask_heads[stage](mask_feats, res_feat)

    def __call__(self, images: jnp.ndarray):
        feats = self.features(images)
        rpn_cls, rpn_reg = self.rpn_head(feats)
        seg, _ = self.semantic_head(feats)
        s = self.cfg.rcnn.roi_size
        dummy = jnp.zeros((1, s, s, self.cfg.fpn_channels), jnp.float32)
        outs = [h(dummy) for h in self.bbox_heads]
        ms = self.cfg.mask_roi_size
        md = jnp.zeros((1, ms, ms, self.cfg.fpn_channels), jnp.float32)
        prev = None
        mouts = []
        for h in self.mask_heads:
            logit, prev = h(md, prev)
            mouts.append(logit)
        return rpn_cls, rpn_reg, seg, outs, mouts


def build_htc(cfg) -> HTC:
    return HTC(cfg=cfg)


def init_htc(cfg, rng: jax.Array):
    model = build_htc(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
