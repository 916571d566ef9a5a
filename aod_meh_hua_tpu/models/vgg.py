"""SSD-VGG16 backbone (Flax), mmcv-VGG layout compatible.

Behavioral parity target (reference, /root/reference):
* mmdet/models/backbones/ssd_vgg.py:12 — VGG-16 features with ceil-mode
  2x2 pooling, with_last_pool=False, then the SSD extras: MaxPool(3, s1,
  p1) -> conv6 3x3 dilation 6 (1024) -> ReLU -> conv7 1x1 (1024) -> ReLU.
  Outputs at feature indices (22, 34): conv4_3 relu (512, 38x38 for 300
  input) and conv7 relu (1024, 19x19).

TPU notes: ceil-mode pooling = right/bottom -inf padding when the extent
is odd; dilated conv uses kernel_dilation with padding 6.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG-16 conv plan: (num_convs, base_channels) per block
VGG16_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


def ceil_max_pool(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """2x2/2 max pool with ceil_mode=True (pad right/bottom as needed)."""
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % stride if h % stride else 0
    pw = (-w) % stride if w % stride else 0
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((0, ph), (0, pw)))


class SSDVGG(nn.Module):
    """Returns (conv4_3 relu, conv7 relu). NHWC."""

    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        wm = self.width_mult
        conv4_3 = None
        for bi, (n_convs, ch) in enumerate(VGG16_BLOCKS):
            ch = max(int(ch * wm), 1)
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"conv{bi + 1}_{ci + 1}")(x)
                x = nn.relu(x)
            if bi == 3:
                conv4_3 = x  # 512ch relu output before pool4
            if bi < 4:  # with_last_pool=False: no pool after block 5
                x = ceil_max_pool(x)
        # SSD extras on the trunk
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        x = nn.Conv(max(int(1024 * wm), 1), (3, 3), padding=((6, 6), (6, 6)),
                    kernel_dilation=(6, 6), dtype=self.dtype, name="conv6")(x)
        x = nn.relu(x)
        x = nn.Conv(max(int(1024 * wm), 1), (1, 1), dtype=self.dtype, name="conv7")(x)
        x = nn.relu(x)
        return conv4_3, x


# mmcv VGG-16 `features` module indices for the conv layers, in order
_MMCV_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28, 31, 33)
_OUR_CONV_NAMES = (
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3", "conv6", "conv7",
)


def convert_mmcv_vgg16(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """mmcv SSDVGG state_dict ('features.N.weight') -> Flax params."""
    params: Dict[str, Any] = {}
    for idx, name in zip(_MMCV_VGG16_CONV_IDX, _OUR_CONV_NAMES):
        w = np.asarray(state_dict[f"features.{idx}.weight"])
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        params[name] = {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}
    return params
