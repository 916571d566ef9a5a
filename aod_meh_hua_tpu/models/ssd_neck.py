"""SSD neck: L2Norm on conv4_3 + extra downsampling levels (Flax).

Behavioral parity target (reference, /root/reference):
* mmdet/models/necks/ssd_neck.py:10 with the live config
  (Config_SSD.py:33-39): in (512, 1024), out (512, 1024, 512, 256, 256,
  256), level_strides (2, 2, 1, 1), level_paddings (1, 1, 0, 0),
  l2_norm_scale=20. Each extra level = 1x1 conv (out//2) + ReLU + 3x3
  conv (stride/pad per level) + ReLU; L2Norm has a learnable per-channel
  scale initialized to 20 (ssd_neck.py:104-131).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class L2Norm(nn.Module):
    scale_init: float = 20.0
    eps: float = 1e-10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", lambda key, shape: jnp.full(shape, self.scale_init, jnp.float32),
            (x.shape[-1],),
        )
        norm = jnp.sqrt((x.astype(jnp.float32) ** 2).sum(axis=-1, keepdims=True)) + self.eps
        return (scale * (x.astype(jnp.float32) / norm)).astype(self.dtype)


class SSDNeck(nn.Module):
    out_channels: Sequence[int] = (512, 1024, 512, 256, 256, 256)
    num_inputs: int = 2
    level_strides: Sequence[int] = (2, 2, 1, 1)
    level_paddings: Sequence[int] = (1, 1, 0, 0)
    l2_norm_scale: float = 20.0
    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        outs = list(inputs)
        if self.l2_norm_scale:
            outs[0] = L2Norm(self.l2_norm_scale, dtype=self.dtype, name="l2_norm")(outs[0])
        extra_channels = self.out_channels[self.num_inputs:]
        feat = outs[-1]
        for i, (ch, stride, pad) in enumerate(
            zip(extra_channels, self.level_strides, self.level_paddings)
        ):
            ch = max(int(ch * self.width_mult), 1)
            mid = max(ch // 2, 1)
            feat = nn.Conv(mid, (1, 1), dtype=self.dtype, name=f"extra_{i}_reduce")(feat)
            feat = nn.relu(feat)
            feat = nn.Conv(ch, (3, 3), strides=(stride, stride),
                           padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                           name=f"extra_{i}_conv")(feat)
            feat = nn.relu(feat)
            outs.append(feat)
        return tuple(outs)
