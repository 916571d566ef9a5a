"""Feature Pyramid Network (Flax).

Behavioral parity target (reference, /root/reference):
* mmdet/models/necks/fpn.py:10 with the live config
  (configs/_base_/Config_RetinaNet.py:34-40): in_channels
  [256,512,1024,2048], out 256, start_level=1, add_extra_convs='on_input',
  num_outs=5, relu_before_extra_convs=False (default).

Top-down pathway uses size-targeted nearest-neighbor upsampling with
torch's F.interpolate(mode='nearest') index rule src = floor(dst * in/out)
— implemented as a static gather so non-power-of-two level sizes
(e.g. 19 -> 38) match the ported weights' activations exactly.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def nearest_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC nearest-neighbor resize with torch's floor index rule."""
    h, w = x.shape[1], x.shape[2]
    th, tw = size
    rows = np.floor(np.arange(th) * (h / th)).astype(np.int32)
    cols = np.floor(np.arange(tw) * (w / tw)).astype(np.int32)
    return x[:, rows][:, :, cols]


class FPN(nn.Module):
    """add_extra_convs modes (reference mmdet/models/necks/fpn.py:10):
    'on_input' (RetinaNet: P6/P7 = s2 convs from C5), 'on_output' (FCOS:
    from P5), 'maxpool' (Faster R-CNN add_extra_convs=False: stride-2
    1x1 max-pool on the last output)."""

    out_channels: int = 256
    start_level: int = 1
    num_outs: int = 5
    relu_before_extra_convs: bool = False
    add_extra_convs: str = "on_input"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        used = list(inputs[self.start_level:])
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral_{i}")(x)
            for i, x in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + nearest_resize(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"fpn_{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        for i in range(self.num_outs - len(outs)):
            if self.add_extra_convs == "maxpool":
                # F.max_pool2d(outs[-1], 1, stride=2): plain subsampling
                outs.append(outs[-1][:, ::2, ::2, :])
                continue
            if i == 0:
                src = inputs[-1] if self.add_extra_convs == "on_input" else outs[-1]
            else:
                src = nn.relu(outs[-1]) if self.relu_before_extra_convs else outs[-1]
            outs.append(
                nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"extra_{i}")(src)
            )
        return tuple(outs)
