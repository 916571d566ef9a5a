"""MEH-RetinaNet detector assembly (Flax) + flattening helpers.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/detectors/SSL_L_single_stage.py:11 — backbone -> neck ->
  head plumbing; the MEH branch consumes *detached* FPN features (:43),
  reproduced with stop_gradient.
* mmdet/models/detectors/SSL_L_retinanet.py:6 (registered assembly used
  by Config_RetinaNet.py:23).

One Flax module, one __call__: returns everything the train/eval/score
steps need so each pipeline is a single jit region.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import RetinaNetConfig
from .fpn import FPN
from .resnet import ResNet
from .retina_head import RetinaMEHHead


def flatten_levels(level_maps: Sequence[jnp.ndarray], channels: int) -> jnp.ndarray:
    """Per-level NHWC maps [B, H, W, A*channels] -> [B, sum(H*W*A), channels].

    Matches the reference's permute(0,2,3,1).reshape(-1, C) ordering and
    the anchor layout of ops/anchors.py (row-major cells, anchor-minor).
    """
    flat = []
    for m in level_maps:
        b = m.shape[0]
        flat.append(m.reshape(b, -1, channels))
    return jnp.concatenate(flat, axis=1)


class MEHRetinaNet(nn.Module):
    cfg: RetinaNetConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            mc_dropout=self.cfg.mc_dropout, stem_s2d=self.cfg.stem_s2d,
            int8=getattr(self.cfg, "backbone_int8", False),
            conv1x1_matmul=getattr(self.cfg, "conv1x1_matmul", False),
            fused_blocks=getattr(self.cfg, "fused_blocks", False),
            stage_fused=getattr(self.cfg, "fused_stages",
                                (True, True, False, False)),
            dtype=dtype, name="backbone",
        )
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=1,
                        num_outs=len(self.cfg.anchor.strides), dtype=dtype, name="neck")
        self.head = RetinaMEHHead(
            num_classes=self.cfg.num_classes,
            num_anchors=self.cfg.anchor.num_anchors,
            feat_channels=self.cfg.feat_channels,
            stacked_convs=self.cfg.stacked_convs,
            mc_dropout=self.cfg.mc_dropout,
            dtype=dtype, name="head",
        )

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def __call__(self, images: jnp.ndarray, with_meh: bool = True):
        """images [B, H, W, 3] -> flattened f32 outputs.

        Returns (cls_scores [B, A_tot, C], bbox_preds [B, A_tot, 4],
        lambdas [B, A_tot] or None, level_noR_sizes implicit via cfg).
        The lambda branch runs on stop_gradient(feats): main-loss grads
        never enter the MEH branch and MEH grads never enter the trunk —
        the reference's detach + two-optimizer split collapses into one
        backward pass with exact gradient partitioning.
        """
        feats = self.features(images)
        cls_maps, reg_maps = self.head(feats)
        c = self.cfg.num_classes
        cls_scores = flatten_levels(cls_maps, c).astype(jnp.float32)
        bbox_preds = flatten_levels(reg_maps, 4).astype(jnp.float32)
        lambdas = None
        if with_meh and self.cfg.use_meh:
            sg_feats = tuple(jax.lax.stop_gradient(f) for f in feats)
            lam_maps = self.head.forward_L(sg_feats)
            lambdas = flatten_levels(lam_maps, 1)[..., 0].astype(jnp.float32)
        return cls_scores, bbox_preds, lambdas


def build_retinanet(cfg: RetinaNetConfig) -> MEHRetinaNet:
    return MEHRetinaNet(cfg=cfg)


def init_retinanet(cfg: RetinaNetConfig, rng: jax.Array):
    """Initialize variables for the full canvas. Returns (model, variables).

    The init forward is jitted: eager flax init dispatches every conv
    op-by-op (minutes on CPU); the jitted version compiles once and is
    cached across the AL loop's per-cycle re-inits.
    """
    model = build_retinanet(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
