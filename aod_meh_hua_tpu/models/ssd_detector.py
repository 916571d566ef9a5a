"""MEH-SSD detector assembly (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/detectors/SSD_L_single_stage.py:11 (the Config_SSD.py:24
  assembly: SSDVGG -> SSDNeck -> MyLSSDHead), MySSD.py train plumbing —
  the lambda branch consumes detached features, as in the Retina family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.config import SSDConfig
from .detector import flatten_levels
from .ssd_head import SSDMEHHead
from .ssd_neck import SSDNeck
from .vgg import SSDVGG


class MEHSSD(nn.Module):
    cfg: SSDConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        self.backbone = SSDVGG(width_mult=self.cfg.width_mult, dtype=dtype, name="backbone")
        self.neck = SSDNeck(
            out_channels=self.cfg.neck_out_channels,
            level_strides=self.cfg.level_strides,
            level_paddings=self.cfg.level_paddings,
            l2_norm_scale=self.cfg.l2_norm_scale,
            width_mult=self.cfg.width_mult, dtype=dtype, name="neck",
        )
        gen = self.cfg.build_anchor_generator()
        self.head = SSDMEHHead(
            num_classes=self.cfg.num_classes,
            num_anchors=tuple(gen.num_base_anchors),
            dtype=dtype, name="head",
        )

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def __call__(self, images: jnp.ndarray, with_meh: bool = True):
        """images [B, S, S, 3] -> (cls [B, A_tot, C+1], reg [B, A_tot, 4],
        lambda [B, A_tot] or None) in f32."""
        feats = self.features(images)
        cls_maps, reg_maps = self.head(feats)
        cls_scores = flatten_levels(cls_maps, self.cfg.cls_out_channels).astype(jnp.float32)
        bbox_preds = flatten_levels(reg_maps, 4).astype(jnp.float32)
        lambdas = None
        if with_meh and self.cfg.use_meh:
            sg = tuple(jax.lax.stop_gradient(f) for f in feats)
            lam_maps = self.head.forward_L(sg)
            lambdas = flatten_levels(lam_maps, 1)[..., 0].astype(jnp.float32)
        return cls_scores, bbox_preds, lambdas


def build_ssd(cfg: SSDConfig) -> MEHSSD:
    return MEHSSD(cfg=cfg)


def init_ssd(cfg: SSDConfig, rng: jax.Array):
    model = build_ssd(cfg)
    s = cfg.input_size
    dummy = jnp.zeros((1, s, s, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
