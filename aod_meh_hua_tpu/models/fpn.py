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
import jax
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


def adaptive_max_pool(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC adaptive max pool with torch's window rule
    (start = floor(o*in/out), end = ceil((o+1)*in/out)); separable over
    H then W. Static shapes: per-output windows are precomputed index
    gathers padded to the widest window with -inf fill."""

    def pool_axis(x, axis, out):
        n = x.shape[axis]
        starts = np.floor(np.arange(out) * n / out).astype(np.int64)
        ends = np.ceil((np.arange(out) + 1) * n / out).astype(np.int64)
        wmax = int((ends - starts).max())
        idx = starts[:, None] + np.arange(wmax)[None, :]       # [out, wmax]
        ok = idx < ends[:, None]
        idx = np.minimum(idx, n - 1)
        g = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
        g = jnp.moveaxis(g, axis, 0)
        g = g.reshape((out, wmax) + g.shape[1:])
        g = jnp.where(
            jnp.asarray(ok).reshape((out, wmax) + (1,) * (g.ndim - 2)),
            g, -jnp.inf)
        return jnp.moveaxis(g.max(axis=1), 0, axis)

    x = pool_axis(x, 1, size[0])
    return pool_axis(x, 2, size[1])


class NonLocal2D(nn.Module):
    """Embedded-gaussian non-local block, mmcv NonLocal2d semantics with
    BFP's settings (reduction=1, use_scale=False): y = softmax(theta phi^T) g,
    out = x + conv_out(y). The pairwise [HW, HW] attention runs as two
    dense matmuls — MXU-friendly at BFP's single refine level."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        g = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="g")(x)
        theta = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="theta")(x)
        phi = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="phi")(x)
        theta = theta.reshape(b, h * w, self.channels)
        phi = phi.reshape(b, h * w, self.channels)
        g = g.reshape(b, h * w, self.channels)
        attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", theta, phi).astype(jnp.float32), axis=-1
        ).astype(theta.dtype)
        y = jnp.einsum("bij,bjc->bic", attn, g).reshape(b, h, w, self.channels)
        return x + nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                           name="conv_out")(y)


class BFP(nn.Module):
    """Balanced Feature Pyramid (Libra R-CNN). Gather all levels at the
    refine level's size (max-pool finer, nearest-upsample coarser),
    average, refine with a non-local block, scatter back residually
    (reference mmdet/models/necks/bfp.py:10-101, refine_type='non_local')."""

    refine_level: int = 2
    refine_type: str = "non_local"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        size = inputs[self.refine_level].shape[1:3]
        feats = []
        for i, x in enumerate(inputs):
            if i < self.refine_level:
                feats.append(adaptive_max_pool(x, size))
            else:
                feats.append(nearest_resize(x, size))
        bsf = sum(feats) / len(feats)
        if self.refine_type == "non_local":
            bsf = NonLocal2D(bsf.shape[-1], dtype=self.dtype, name="refine")(bsf)
        elif self.refine_type == "conv":
            bsf = nn.Conv(bsf.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                          dtype=self.dtype, name="refine")(bsf)
        outs = []
        for i, x in enumerate(inputs):
            if i < self.refine_level:
                outs.append(x + nearest_resize(bsf, x.shape[1:3]))
            else:
                outs.append(x + adaptive_max_pool(bsf, x.shape[1:3]))
        return tuple(outs)


class PAFPN(nn.Module):
    """Path Aggregation FPN (reference mmdet/models/necks/pafpn.py:10-160,
    configs/pafpn/faster_rcnn_r50_pafpn_1x_coco.py): the FPN top-down
    pass, then an extra bottom-up path — inter_outs[i+1] += stride-2
    conv(inter_outs[i]) — with 3x3 pafpn convs on levels 1.., and
    maxpool extras (add_extra_convs=False in the live config)."""

    out_channels: int = 256
    start_level: int = 0
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        used = list(inputs[self.start_level:])
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + nearest_resize(
                laterals[i], laterals[i - 1].shape[1:3])
        inter = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"fpn_{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        # bottom-up augmentation
        for i in range(len(inter) - 1):
            inter[i + 1] = inter[i + 1] + nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), dtype=self.dtype,
                name=f"downsample_{i}")(inter[i])
        outs = [inter[0]] + [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"pafpn_{i - 1}")(inter[i])
            for i in range(1, len(inter))
        ]
        for _ in range(self.num_outs - len(outs)):
            outs.append(outs[-1][:, ::2, ::2, :])  # F.max_pool2d(x, 1, 2)
        return tuple(outs)
