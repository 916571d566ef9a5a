"""Sparse R-CNN: learnable proposals + iterative dynamic instance
interactive heads (Flax).

Behavioral parity targets (reference, /root/reference):
* configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x_coco.py — R50 + FPN
  (start_level 0, num_outs 4, strides 4-32), 100 learnable proposals,
  6 DIIHead stages (8 heads, FFN 2048, dynamic conv feat 64, dropout 0),
  focal cls (use_sigmoid), delta stds (0.5, 0.5, 1, 1), clip_border off.
* mmdet/models/dense_heads/embedding_rpn_head.py:37-75 — learnable
  [N, 4] normalized cxcywh proposal boxes initialized to the full image
  ((0.5, 0.5, 1, 1)) + learnable [N, C] proposal features.
* mmdet/models/roi_heads/bbox_heads/dii_head.py:60-194 — per stage:
  proposal self-attention (+LN), DynamicConv instance interaction
  (+res +LN), FFN (+res +LN), 1x(Linear-LN-ReLU) cls tower -> sigmoid
  logits (prior-prob 0.01 bias), 3x(Linear-LN-ReLU) reg tower -> 4
  deltas; xavier-uniform init on matrix weights.
* mmdet/models/utils/transformer.py:694-794 (DynamicConv) — per
  proposal, parameters generated from the object feature implement two
  1x1 convs (256->64->256, LN+ReLU after each bmm) over the 7x7 RoI
  grid, then flatten -> Linear -> LN -> ReLU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .fpn import FPN
from .resnet import ResNet

_xavier = nn.initializers.xavier_uniform()


class DynamicConv(nn.Module):
    in_channels: int = 256
    feat_channels: int = 64
    roi_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, param_feat, roi_feat):
        """param_feat [P, C]; roi_feat [P, S, S, C] -> [P, C]."""
        p, s = param_feat.shape[0], self.roi_size
        cin, cf = self.in_channels, self.feat_channels
        params = nn.Dense(cin * cf * 2, kernel_init=_xavier,
                          dtype=self.dtype, name="dynamic_layer")(param_feat)
        p_in = params[:, : cin * cf].reshape(p, cin, cf)
        p_out = params[:, cin * cf:].reshape(p, cf, cin)
        x = roi_feat.reshape(p, s * s, cin).astype(self.dtype)
        x = jnp.einsum("psc,pcf->psf", x, p_in)
        x = nn.relu(nn.LayerNorm(dtype=jnp.float32, name="norm_in")(x))
        x = jnp.einsum("psf,pfc->psc", x.astype(self.dtype), p_out)
        x = nn.relu(nn.LayerNorm(dtype=jnp.float32, name="norm_out")(x))
        x = nn.Dense(cin, kernel_init=_xavier, dtype=self.dtype,
                     name="fc_layer")(x.reshape(p, s * s * cin).astype(self.dtype))
        return nn.relu(nn.LayerNorm(dtype=jnp.float32, name="fc_norm")(x))


class DIIHead(nn.Module):
    num_classes: int
    embed: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dyn_feat: int = 64
    roi_size: int = 7
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat, proposal_feat):
        """roi_feat [B, N, S, S, C], proposal_feat [B, N, C] ->
        (cls [B, N, num_classes], delta [B, N, 4], obj_feat [B, N, C])."""
        b, n, s, _, c = roi_feat.shape
        attn = nn.MultiHeadDotProductAttention(
            self.num_heads, qkv_features=self.embed, out_features=self.embed,
            kernel_init=_xavier, dtype=self.dtype, name="attention")(
                proposal_feat, proposal_feat, proposal_feat)
        x = nn.LayerNorm(dtype=jnp.float32, name="attention_norm")(
            proposal_feat + attn)

        dyn = DynamicConv(self.embed, self.dyn_feat, self.roi_size,
                          self.dtype, name="instance_interactive_conv")(
                              x.reshape(b * n, c),
                              roi_feat.reshape(b * n, s, s, c))
        x = nn.LayerNorm(dtype=jnp.float32, name="interact_norm")(
            x + dyn.reshape(b, n, c))

        y = nn.Dense(self.ffn_dim, kernel_init=_xavier, dtype=self.dtype,
                     name="ffn_fc1")(x)
        y = nn.Dense(self.embed, kernel_init=_xavier, dtype=self.dtype,
                     name="ffn_fc2")(nn.relu(y))
        obj = nn.LayerNorm(dtype=jnp.float32, name="ffn_norm")(x + y)

        cls_feat = obj
        for i in range(self.num_cls_fcs):
            cls_feat = nn.Dense(self.embed, use_bias=False,
                                kernel_init=_xavier, dtype=self.dtype,
                                name=f"cls_fc_{i}")(cls_feat)
            cls_feat = nn.relu(nn.LayerNorm(dtype=jnp.float32,
                                            name=f"cls_ln_{i}")(cls_feat))
        reg_feat = obj
        for i in range(self.num_reg_fcs):
            reg_feat = nn.Dense(self.embed, use_bias=False,
                                kernel_init=_xavier, dtype=self.dtype,
                                name=f"reg_fc_{i}")(reg_feat)
            reg_feat = nn.relu(nn.LayerNorm(dtype=jnp.float32,
                                            name=f"reg_ln_{i}")(reg_feat))
        prior_bias = float(-np.log((1 - 0.01) / 0.01))
        cls = nn.Dense(self.num_classes, kernel_init=_xavier,
                       bias_init=nn.initializers.constant(prior_bias),
                       name="fc_cls")(cls_feat.astype(jnp.float32))
        delta = nn.Dense(4, kernel_init=_xavier,
                         name="fc_reg")(reg_feat.astype(jnp.float32))
        return cls, delta, obj.astype(jnp.float32)


class SparseRCNN(nn.Module):
    """Parameter container + pure forwards; stage orchestration (RoI
    align, decode, matching) lives in engine/sparse_rcnn.py."""

    cfg: Any  # SparseRCNNConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if cfg.remat else ResNet
        self.backbone = backbone_cls(block_counts=cfg.block_counts,
                                     stem_width=cfg.stem_width, dtype=dtype,
                                     name="backbone")
        self.neck = FPN(out_channels=cfg.fpn_channels, start_level=0,
                        num_outs=len(cfg.strides), add_extra_convs="on_input",
                        dtype=dtype, name="neck")
        self.init_boxes = self.param(
            "init_proposal_bboxes",
            lambda key, shape: jnp.tile(
                jnp.asarray([0.5, 0.5, 1.0, 1.0]), (cfg.num_proposals, 1)),
            (cfg.num_proposals, 4))
        self.init_features = self.param(
            "init_proposal_features", nn.initializers.normal(1.0),
            (cfg.num_proposals, cfg.fpn_channels))
        self.heads = [
            DIIHead(num_classes=cfg.num_classes, embed=cfg.fpn_channels,
                    num_heads=cfg.num_heads, ffn_dim=cfg.ffn_dim,
                    dyn_feat=cfg.dyn_feat, roi_size=cfg.roi_size,
                    dtype=dtype, name=f"head_{i}")
            for i in range(cfg.num_stages)
        ]

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))[: len(self.cfg.strides)]

    def stage(self, i: int, roi_feat, proposal_feat):
        return self.heads[i](roi_feat, proposal_feat)

    def __call__(self, images: jnp.ndarray):
        """Init/compile-check forward: builds every parameter."""
        feats = self.features(images)
        b = images.shape[0]
        cfg = self.cfg
        pf = jnp.broadcast_to(self.init_features[None],
                              (b,) + self.init_features.shape)
        s = cfg.roi_size
        roi = jnp.zeros((b, cfg.num_proposals, s, s, cfg.fpn_channels),
                        jnp.float32)
        outs = [self.heads[i](roi, pf)[:2] for i in range(cfg.num_stages)]
        return feats, self.init_boxes, outs


def build_sparse_rcnn(cfg) -> SparseRCNN:
    return SparseRCNN(cfg=cfg)


def init_sparse_rcnn(cfg, rng: jax.Array):
    model = build_sparse_rcnn(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
