"""SCNet model (Flax) — sample-consistency cascade with feature relay
and global context.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/scnet_roi_head.py:11 (cascade bbox stages with
  semantic + global-context RoI fusion; ONE mask head run after the
  last stage with relayed bbox features), :70 (_fuse_glbctx: the pooled
  global-context vector of each image added to its RoI features).
* mmdet/models/roi_heads/bbox_heads/scnet_bbox_head.py:8 (Shared2FC
  head that also returns the shared fc feature for relaying).
* mmdet/models/roi_heads/mask_heads/scnet_mask_head.py:8 +
  scnet_semantic_head.py:8 (conv_to_res=True: conv stacks become
  SimplifiedBasicBlocks), global_context_head.py:10 (convs on P6 ->
  GAP -> multilabel fc, loss x3), feature_relay_head.py:8 (pos shared
  fc feats -> linear -> 7x7 map -> x2 bilinear upsample).
* configs/scnet/scnet_r50_fpn_1x_coco.py (3 stages, stage stds/thrs as
  cascade, mask 12 convs conv_to_res, glbctx weight 3.0, semantic
  weight 0.2).

Note: the relay upsample is align_corners=True bilinear in mmcv;
jax.image.resize uses half-pixel centers — a sub-pixel interpolation
difference with no structural effect (no pretrained weights to match).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fpn import FPN
from .htc import FusedSemanticHead
from .resnet import ResNet
from .two_stage import RPNHead


class SimplifiedBasicBlock(nn.Module):
    """mmdet SimplifiedBasicBlock (norm None): 3x3 conv + relu + 3x3
    conv, identity skip, relu."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        y = nn.relu(nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="conv1")(x))
        y = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(y)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name="downsample")(x)
        return nn.relu(x + y)


class SCNetBBoxHead(nn.Module):
    """Shared2FC bbox head returning (cls, reg, shared fc feature)."""

    num_classes: int
    fc_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        from jax.nn.initializers import normal, xavier_uniform, zeros

        x = roi_feats.reshape(roi_feats.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xavier_uniform(),
                             bias_init=zeros, dtype=self.dtype,
                             name="shared_fc_0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xavier_uniform(),
                             bias_init=zeros, dtype=self.dtype,
                             name="shared_fc_1")(x))
        cls = nn.Dense(self.num_classes + 1, kernel_init=normal(0.01),
                       bias_init=zeros, dtype=self.dtype, name="fc_cls")(x)
        reg = nn.Dense(4, kernel_init=normal(0.001), bias_init=zeros,
                       dtype=self.dtype, name="fc_reg")(x)
        return (cls.astype(jnp.float32),
                reg.astype(jnp.float32).reshape(-1, 1, 4),
                x.astype(jnp.float32))


class SCNetMaskHead(nn.Module):
    """12-conv FCN mask head with conv_to_res=True (6 residual blocks),
    deconv x2, 1x1 logits."""

    num_classes: int
    num_blocks: int = 6
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in range(self.num_blocks):
            x = SimplifiedBasicBlock(self.channels, dtype=self.dtype,
                                     name=f"res_{i}")(x)
        y = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_logits")(y).astype(jnp.float32)


class GlobalContextHead(nn.Module):
    """convs (residual blocks) on the coarsest level -> GAP -> fc
    multilabel logits; returns (mc_logits [B, C], pooled [B, ch])."""

    num_classes: int
    num_blocks: int = 2
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats[-1].astype(self.dtype)
        for i in range(self.num_blocks):
            x = SimplifiedBasicBlock(self.channels, dtype=self.dtype,
                                     name=f"res_{i}")(x)
        pooled = x.mean(axis=(1, 2))  # [B, ch]
        mc = nn.Dense(self.num_classes,
                      kernel_init=nn.initializers.normal(0.01),
                      dtype=jnp.float32, name="fc")(
            pooled.astype(jnp.float32))
        return mc, pooled.astype(jnp.float32)


class FeatureRelayHead(nn.Module):
    """Shared fc feats [N, fc] -> 7x7 x out_channels map, x2 bilinear
    upsample -> [N, 14, 14, out_channels]."""

    out_channels: int
    roi_feat_size: int = 7
    scale_factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        s = self.roi_feat_size
        y = nn.Dense(s * s * self.out_channels, dtype=self.dtype,
                     name="fc")(x.astype(self.dtype))
        y = y.reshape(n, s, s, self.out_channels)
        so = s * self.scale_factor
        return jax.image.resize(y, (n, so, so, self.out_channels),
                                method="bilinear").astype(jnp.float32)


class SCNet(nn.Module):
    cfg: Any  # SCNetConfig

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
            SCNetBBoxHead(num_classes=self.cfg.num_classes,
                          fc_channels=self.cfg.rcnn.fc_channels,
                          dtype=dtype, name=f"bbox_head_{i}")
            for i in range(self.cfg.num_stages)
        ]
        self.mask_head = SCNetMaskHead(
            num_classes=self.cfg.num_classes,
            num_blocks=self.cfg.mask_res_blocks,
            channels=self.cfg.mask_channels, dtype=dtype, name="mask_head")
        self.semantic_head = FusedSemanticHead(
            seg_classes=self.cfg.seg_classes,
            channels=self.cfg.fpn_channels, dtype=dtype,
            name="semantic_head")
        self.glbctx_head = GlobalContextHead(
            num_classes=self.cfg.num_classes,
            channels=self.cfg.fpn_channels, dtype=dtype,
            name="glbctx_head")
        self.relay_head = FeatureRelayHead(
            out_channels=self.cfg.fpn_channels,
            roi_feat_size=self.cfg.rcnn.roi_size,
            scale_factor=self.cfg.mask_roi_size // self.cfg.rcnn.roi_size,
            dtype=dtype, name="relay_head")

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def semantic(self, feats):
        return self.semantic_head(feats)

    def glbctx(self, feats):
        return self.glbctx_head(feats)

    def roi_forward(self, roi_feats: jnp.ndarray, stage: int):
        return self.bbox_heads[stage](roi_feats)

    def relay(self, shared_feats: jnp.ndarray):
        return self.relay_head(shared_feats)

    def mask_forward(self, mask_feats: jnp.ndarray):
        return self.mask_head(mask_feats)

    def __call__(self, images: jnp.ndarray):
        feats = self.features(images)
        rpn_cls, rpn_reg = self.rpn_head(feats)
        seg, _ = self.semantic_head(feats)
        mc, _ = self.glbctx_head(feats)
        s = self.cfg.rcnn.roi_size
        dummy = jnp.zeros((1, s, s, self.cfg.fpn_channels), jnp.float32)
        outs = [h(dummy) for h in self.bbox_heads]
        relayed = self.relay_head(outs[-1][2])
        ms = self.cfg.mask_roi_size
        md = jnp.zeros((1, ms, ms, self.cfg.fpn_channels), jnp.float32)
        mout = self.mask_head(md + relayed)
        return rpn_cls, rpn_reg, seg, mc, outs, mout


def build_scnet(cfg) -> SCNet:
    return SCNet(cfg=cfg)


def init_scnet(cfg, rng: jax.Array):
    model = build_scnet(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
