"""PointRend model components (Flax): the Faster R-CNN trunk plus the
CoarseMaskHead and the point MLP head.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/mask_heads/coarse_mask_head.py:25-99 — 0 convs,
  downsample conv (k=2, s=2) to 7x7, 2 FCs of 1024, one FC emitting
  num_classes * 7 * 7 logits.
* mmdet/models/roi_heads/mask_heads/mask_point_head.py:39-104 — a
  per-point MLP: input = fine-grained FPN feature (256) concat coarse
  per-class logits; 3 fc layers of 256 (coarse re-concatenated after
  each, coarse_pred_each_layer=True); 1x1 logits, std 0.001 init.
* mmdet/models/detectors/point_rend.py:1 +
  configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py.

TPU-first: point operations act on fixed-size [N, P, C] point tensors
(Dense over the channel dim == the reference's Conv1d over points);
sampling/subdivision live in engine/point_rend.py inside the jit.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .two_stage import RPNHead, Shared2FCBBoxHead
from .fpn import FPN
from .resnet import ResNet


class CoarseMaskHead(nn.Module):
    """[N, 14, 14, C] SimpleRoIAlign feats -> [N, 7, 7, num_classes]
    coarse mask logits (coarse_mask_head.py forward)."""

    num_classes: int
    channels: int = 256
    num_fcs: int = 2
    fc_channels: int = 1024
    downsample: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        d = self.downsample
        x = nn.Conv(self.channels, (d, d), strides=(d, d), padding="VALID",
                    dtype=self.dtype, name="downsample_conv")(x)
        out_h, out_w = x.shape[1], x.shape[2]
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                                 name=f"fc_{i}")(x))
        logits = nn.Dense(
            self.num_classes * out_h * out_w, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001), name="fc_logits")(x)
        return logits.reshape(x.shape[0], out_h, out_w,
                              self.num_classes).astype(jnp.float32)


class MaskPointHead(nn.Module):
    """Per-point MLP: (fine [N, P, Cf], coarse [N, P, C]) ->
    [N, P, num_classes] point logits (mask_point_head.py forward; Dense
    over the last dim is the reference's kernel-1 Conv1d over points)."""

    num_classes: int
    num_fcs: int = 3
    fc_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([fine, coarse], axis=-1).astype(self.dtype)
        coarse = coarse.astype(self.dtype)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                                 name=f"fc_{i}")(x))
            x = jnp.concatenate([x, coarse], axis=-1)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.001),
                          name="fc_logits")(x)
        return logits.astype(jnp.float32)


class PointRend(nn.Module):
    """Faster R-CNN trunk + coarse mask head + point head."""

    cfg: Any  # PointRendConfig

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
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.cfg.num_classes,
                                           fc_channels=self.cfg.rcnn.fc_channels,
                                           dtype=dtype, name="bbox_head")
        self.coarse_head = CoarseMaskHead(
            num_classes=self.cfg.num_classes, channels=self.cfg.coarse_channels,
            num_fcs=self.cfg.coarse_fcs, fc_channels=self.cfg.coarse_fc_channels,
            dtype=dtype, name="coarse_head")
        self.point_head = MaskPointHead(
            num_classes=self.cfg.num_classes, num_fcs=self.cfg.point_fcs,
            fc_channels=self.cfg.point_fc_channels, dtype=dtype,
            name="point_head")

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_forward(self, roi_feats: jnp.ndarray):
        return self.bbox_head(roi_feats)

    def mask_forward(self, mask_roi_feats: jnp.ndarray):
        return self.coarse_head(mask_roi_feats)

    def point_forward(self, fine: jnp.ndarray, coarse: jnp.ndarray):
        return self.point_head(fine, coarse)

    def __call__(self, images: jnp.ndarray):
        """Init/compile-check forward: builds every parameter."""
        feats = self.features(images)
        rpn_cls, rpn_reg = self.rpn_head(feats)
        s = self.cfg.rcnn.roi_size
        dummy = jnp.zeros((1, s, s, self.cfg.fpn_channels), jnp.float32)
        cls, reg = self.bbox_head(dummy)
        ms = self.cfg.mask_roi_size
        mdummy = jnp.zeros((1, ms, ms, self.cfg.fpn_channels), jnp.float32)
        coarse = self.coarse_head(mdummy)
        fine = jnp.zeros((1, 4, self.cfg.fpn_channels), jnp.float32)
        cpt = jnp.zeros((1, 4, self.cfg.num_classes), jnp.float32)
        pts = self.point_head(fine, cpt)
        return rpn_cls, rpn_reg, cls, reg, coarse, pts


def build_point_rend(cfg) -> PointRend:
    return PointRend(cfg=cfg)


def init_point_rend(cfg, rng: jax.Array):
    model = build_point_rend(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
