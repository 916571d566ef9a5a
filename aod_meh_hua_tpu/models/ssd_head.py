"""MEH SSD head: per-level cls / reg / lambda convs (Flax).

Behavioral parity target (reference, /root/reference):
* mmdet/models/dense_heads/My_L_ssd_head.py:102-137 — per pyramid level
  one 3x3 conv per branch (stacked_convs=0 in the live config):
  cls -> A*(C+1) channels (explicit background), reg -> A*4,
  L -> A with ReLU (:176-180). Xavier-uniform init, zero bias (:71).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import xavier_uniform, zeros


class SSDMEHHead(nn.Module):
    num_classes: int
    num_anchors: Sequence[int]  # per level (heterogeneous: 4/6/6/6/4/4)
    dtype: Any = jnp.float32

    @property
    def cls_out(self) -> int:
        return self.num_classes + 1

    def setup(self):
        conv = lambda ch, name: nn.Conv(
            ch, (3, 3), padding=((1, 1), (1, 1)), kernel_init=xavier_uniform(),
            bias_init=zeros, dtype=self.dtype, name=name,
        )
        self.cls_convs = [conv(a * self.cls_out, f"cls_{i}")
                          for i, a in enumerate(self.num_anchors)]
        self.reg_convs = [conv(a * 4, f"reg_{i}") for i, a in enumerate(self.num_anchors)]
        self.L_convs = [conv(a, f"L_{i}") for i, a in enumerate(self.num_anchors)]

    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_scores = tuple(c(f) for c, f in zip(self.cls_convs, feats))
        bbox_preds = tuple(r(f) for r, f in zip(self.reg_convs, feats))
        return cls_scores, bbox_preds

    def forward_L(self, feats: Sequence[jnp.ndarray]):
        return tuple(nn.relu(l(f)) for l, f in zip(self.L_convs, feats))
