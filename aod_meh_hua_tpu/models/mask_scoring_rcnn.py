"""Mask Scoring R-CNN model (Flax): Mask R-CNN + the MaskIoU head.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/detectors/mask_scoring_rcnn.py:1 +
  configs/ms_rcnn/ms_rcnn_r50_fpn_1x_coco.py — Mask R-CNN with a
  MaskIoUHead scoring each predicted mask's IoU against its gt.
* mmdet/models/roi_heads/mask_heads/maskiou_head.py:12-85 — input is
  concat(mask RoI features, 2x2-maxpooled sigmoid mask prediction);
  4x (3x3 conv + ReLU) with the LAST conv stride 2, flatten,
  2x (FC 1024 + ReLU), FC -> per-class mask IoU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mask_rcnn import MaskRCNN


class MaskIoUHead(nn.Module):
    """(mask_feats [N, s, s, C], mask_pred logits [N, 2s, 2s]) ->
    [N, num_classes] predicted mask IoUs."""

    num_classes: int
    num_convs: int = 4
    num_fcs: int = 2
    channels: int = 256
    fc_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mask_feats: jnp.ndarray, mask_pred: jnp.ndarray):
        p = jax.nn.sigmoid(mask_pred.astype(jnp.float32))[..., None]
        # MaxPool2d(2, 2) on the 2s-resolution mask -> the s-resolution
        # feature grid (maskiou_head.py:75)
        pooled = nn.max_pool(p, (2, 2), strides=(2, 2))
        x = jnp.concatenate([mask_feats.astype(self.dtype),
                             pooled.astype(self.dtype)], axis=-1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                strides=(stride, stride),
                                padding=((1, 1), (1, 1)), dtype=self.dtype,
                                name=f"conv_{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                                 name=f"fc_{i}")(x))
        out = nn.Dense(self.num_classes,
                       kernel_init=nn.initializers.normal(0.01),
                       dtype=self.dtype, name="fc_mask_iou")(x)
        return out.astype(jnp.float32)


class MaskScoringRCNN(MaskRCNN):
    """Mask R-CNN trunk + mask head + MaskIoU head."""

    def setup(self):
        super().setup()
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        self.mask_iou_head = MaskIoUHead(
            num_classes=self.cfg.num_classes,
            num_convs=self.cfg.maskiou_convs,
            num_fcs=self.cfg.maskiou_fcs,
            channels=self.cfg.mask_channels,
            fc_channels=self.cfg.maskiou_fc_channels,
            dtype=dtype, name="mask_iou_head")

    def maskiou_forward(self, mask_feats, mask_pred):
        return self.mask_iou_head(mask_feats, mask_pred)

    def __call__(self, images: jnp.ndarray):
        outs = super().__call__(images)
        ms = self.cfg.mask_roi_size
        feats = jnp.zeros((1, ms, ms, self.cfg.fpn_channels), jnp.float32)
        pred = jnp.zeros((1, self.cfg.mask_size, self.cfg.mask_size),
                         jnp.float32)
        iou = self.mask_iou_head(feats, pred)
        return outs + (iou,)


def build_mask_scoring_rcnn(cfg) -> MaskScoringRCNN:
    return MaskScoringRCNN(cfg=cfg)


def init_mask_scoring_rcnn(cfg, rng: jax.Array):
    model = build_mask_scoring_rcnn(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
