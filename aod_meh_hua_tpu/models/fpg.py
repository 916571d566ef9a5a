"""Feature Pyramid Grids neck (Flax).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/necks/fpg.py:102 (FPG: plain 1x1 laterals + maxpool
  extra level, then `stack_times` bottom-up pathway stages; each
  non-skipped (stage, level) cell fuses same-stage-up (stride-2 conv of
  the finer level just computed), across-lateral (1x1 of the previous
  stage), across-down (nearest-up + 3x3 of the previous stage's coarser
  level) and across-skip (1x1 of the stage-0 level) by summation; final
  per-level output = 3x3 'last_conv' on the final stage), with every
  transition a ConvModule in order ('act', 'conv', 'norm').
* configs/fpg/faster_rcnn_r50_fpg_crop640_50e_coco.py (stack_times 9,
  paths all 'bu', skip_inds the staircase
  [(0,1,2,3), (0,1,2), (0,1), (0,), ()]).

BN here is the frozen-affine convention used across this framework's
norm_eval surfaces (the reference trains the neck BN; a running-stats
difference only — no structural change).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class _ActConvNorm(nn.Module):
    """ConvModule(order=('act', 'conv', 'norm')): relu -> (optional
    nearest x2) -> conv -> BN."""

    features: int
    kernel: int = 3
    stride: int = 1
    upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        if self.upsample:
            b, h, w, c = x.shape
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (b, h, 2, w, 2, c)).reshape(b, 2 * h,
                                                             2 * w, c)
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                            dtype=self.dtype, name="bn")(x)


class FPG(nn.Module):
    out_channels: int = 256
    inter_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    skip_inds: Tuple[Tuple[int, ...], ...] = (
        (0, 1, 2, 3), (0, 1, 2), (0, 1), (0,), ())
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        feats = [nn.Conv(self.inter_channels, (1, 1), dtype=self.dtype,
                         name=f"lateral_{i}")(f)
                 for i, f in enumerate(inputs)]
        for _ in range(self.num_outs - len(inputs)):
            feats.append(nn.max_pool(feats[-1], (1, 1), strides=(2, 2)))

        outs = [feats]
        for s in range(self.stack_times):
            cur = outs[-1]
            nxt = []
            for lvl in range(self.num_outs):
                if s in self.skip_inds[lvl]:
                    nxt.append(cur[lvl])
                    continue
                acc = _ActConvNorm(self.inter_channels, 1, dtype=self.dtype,
                                   name=f"s{s}_l{lvl}_lateral")(cur[lvl])
                if lvl > 0:  # same-stage up: stride-2 from the finer level
                    acc = acc + _ActConvNorm(
                        self.inter_channels, 3, stride=2, dtype=self.dtype,
                        name=f"s{s}_l{lvl}_same_up")(nxt[-1])
                if lvl < self.num_outs - 1:  # across down: coarser, upsampled
                    acc = acc + _ActConvNorm(
                        self.inter_channels, 3, upsample=True,
                        dtype=self.dtype,
                        name=f"s{s}_l{lvl}_across_down")(cur[lvl + 1])
                acc = acc + _ActConvNorm(
                    self.inter_channels, 1, dtype=self.dtype,
                    name=f"s{s}_l{lvl}_across_skip")(outs[0][lvl])
                nxt.append(acc)
            outs.append(nxt)

        return tuple(
            _ActConvNorm(self.out_channels, 3, dtype=self.dtype,
                         name=f"out_{i}")(outs[-1][i])
            for i in range(self.num_outs))
