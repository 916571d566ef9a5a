"""MEH Retina head: cls / reg / lambda branches (Flax).

Behavioral parity target (reference, /root/reference):
* mmdet/models/dense_heads/Lambda_L2.py:38-54 (_init_layers: 4 stacked
  3x3 convs per branch + retina_cls / retina_reg / retina_L heads; the
  lambda head has one channel per anchor), :96-103 (forward_single_L:
  L_convs -> retina_L -> ReLU)
* init: Normal(std=0.01) weights, zero biases; retina_cls bias re-init
  uniform(+-sqrt(1/(A*k))) by the AL driver (tools/train_RetinaNet.py:
  158-162 with train_cfg.bias='uniform').

Outputs are NHWC; reshaping [B, H, W, A*C] -> [B, H*W*A, C] matches the
reference's permute(0,2,3,1).reshape ordering and the anchor grid layout
of ops/anchors.py.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import normal, uniform, zeros


def _cls_bias_uniform(num_anchors: int, cls_out: int):
    """The driver's uniform(+-sqrt(1/(A*k))) retina_cls bias re-init,
    where k = number of bias entries = A * C."""
    bound = math.sqrt(1.0 / (num_anchors * num_anchors * cls_out))

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvBranch(nn.Module):
    """stacked_convs x (3x3 conv + ReLU), no norm (reference norm_cfg=None)."""

    channels: int
    stacked: int
    mc_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .resnet import channel_dropout

        for i in range(self.stacked):
            x = nn.Conv(
                self.channels, (3, 3), padding=((1, 1), (1, 1)),
                kernel_init=normal(0.01), bias_init=zeros,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = channel_dropout(nn.relu(x), self.mc_dropout, deterministic=False)
        return x


class RetinaMEHHead(nn.Module):
    num_classes: int
    num_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    cls_bias_init: str = "uniform"  # 'uniform' (driver) | 'prior' (bias_prob 0.01)
    mc_dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        c, s = self.feat_channels, self.stacked_convs
        d = self.mc_dropout
        self.cls_convs = ConvBranch(c, s, d, self.dtype, name="cls_convs")
        self.reg_convs = ConvBranch(c, s, d, self.dtype, name="reg_convs")
        self.l_convs = ConvBranch(c, s, d, self.dtype, name="L_convs")
        if self.cls_bias_init == "uniform":
            cls_bias = _cls_bias_uniform(self.num_anchors, self.num_classes)
        else:  # focal prior: b = -log((1 - p) / p), p = 0.01
            prior = -math.log((1 - 0.01) / 0.01)
            cls_bias = lambda key, shape, dtype=jnp.float32: jnp.full(shape, prior, dtype)
        self.retina_cls = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01), bias_init=cls_bias, dtype=self.dtype, name="retina_cls",
        )
        self.retina_reg = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01), bias_init=zeros, dtype=self.dtype, name="retina_reg",
        )
        self.retina_L = nn.Conv(
            self.num_anchors, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01), bias_init=zeros, dtype=self.dtype, name="retina_L",
        )

    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats -> per-level (cls_score [B,H,W,A*C], bbox_pred [B,H,W,A*4])."""
        cls_scores, bbox_preds = [], []
        for f in feats:
            cls_scores.append(self.retina_cls(self.cls_convs(f)))
            bbox_preds.append(self.retina_reg(self.reg_convs(f)))
        return tuple(cls_scores), tuple(bbox_preds)

    def forward_L(self, feats: Sequence[jnp.ndarray]):
        """MEH branch: per-level lambda [B, H, W, A], ReLU-activated."""
        return tuple(nn.relu(self.retina_L(self.l_convs(f))) for f in feats)
