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


def _max_pool_to(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Integer-factor max-pool down to `size` (mmcv BaseMergeCell._resize
    downsample branch: kernel = stride = in/out, per dim — max(1, .)
    guards degenerate 1-cell levels in shrunken test configs)."""
    kh = max(1, x.shape[1] // size[0])
    kw = max(1, x.shape[2] // size[1])
    return nn.max_pool(x, (kh, kw), strides=(kh, kw))


class _MergeCell(nn.Module):
    """mmcv merge_cells.py Sum/GlobalPooling cells: resize both inputs
    to out_size (nearest up / integer max-pool down), binary-op, then
    ReLU -> 3x3 conv (order ('act','conv','norm'), bias, no norm)."""

    global_pool: bool = False
    with_out_conv: bool = True
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, out_size):
        if x1.shape[1:3] != tuple(out_size):
            x1 = (nearest_resize(x1, out_size)
                  if x1.shape[1] < out_size[0] else _max_pool_to(x1, out_size))
        if x2.shape[1:3] != tuple(out_size):
            x2 = (nearest_resize(x2, out_size)
                  if x2.shape[1] < out_size[0] else _max_pool_to(x2, out_size))
        if self.global_pool:
            att = jax.nn.sigmoid(x2.mean(axis=(1, 2), keepdims=True))
            y = x2 + att * x1
        else:
            y = x1 + x2
        if self.with_out_conv:
            y = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="out_conv")(nn.relu(y))
        return y


class NASFPN(nn.Module):
    """NAS-FPN (reference mmdet/models/necks/nas_fpn.py:10-160 +
    configs/nas_fpn/retinanet_r50_nasfpn_crop640_50e_coco.py:
    stack_times=7): 1x1 laterals for P3-P5, 1x1+maxpool extras for
    P6/P7, then `stack_times` repetitions of the searched 7-cell merge
    topology (gp_64_4, sum_44_4, sum_43_3, sum_34_4, gp_43_5+sum_55_5,
    gp_54_7+sum_77_7, gp_75_6)."""

    out_channels: int = 256
    stack_times: int = 7
    start_level: int = 1
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        feats = []
        for i, x in enumerate(inputs[self.start_level:]):
            feats.append(nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                                 name=f"lateral_{i}")(x))
        extra = self.num_outs - len(feats)
        for i in range(extra):
            y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f"extra_{i}")(feats[-1])
            feats.append(nn.max_pool(y, (2, 2), strides=(2, 2),
                                     padding="SAME"))
        p3, p4, p5, p6, p7 = feats
        sz = lambda p: p.shape[1:3]
        for s in range(self.stack_times):
            cell = lambda name, gp=False, oc=True: _MergeCell(
                global_pool=gp, with_out_conv=oc,
                out_channels=self.out_channels, dtype=self.dtype,
                name=f"stage{s}_{name}")
            p4_1 = cell("gp_64_4", gp=True)(p6, p4, sz(p4))
            p4_2 = cell("sum_44_4")(p4_1, p4, sz(p4))
            p3 = cell("sum_43_3")(p4_2, p3, sz(p3))
            p4 = cell("sum_34_4")(p3, p4_2, sz(p4))
            p5_tmp = cell("gp_43_5", gp=True, oc=False)(p4, p3, sz(p5))
            p5 = cell("sum_55_5")(p5, p5_tmp, sz(p5))
            p7_tmp = cell("gp_54_7", gp=True, oc=False)(p5, p4_2, sz(p7))
            p7 = cell("sum_77_7")(p7, p7_tmp, sz(p7))
            p6 = cell("gp_75_6", gp=True)(p7, p5, sz(p6))
        return [p3, p4, p5, p6, p7]


def carafe_upsample(x: jnp.ndarray, masks: jnp.ndarray, k_up: int,
                    scale: int) -> jnp.ndarray:
    """CARAFE reassembly (mmcv ops/carafe.py CUDA kernel re-derived):
    each upsampled pixel is a k_up x k_up weighted sum of the source
    neighborhood around its parent pixel.

    x [B, H, W, C]; masks [B, H*scale, W*scale, k_up*k_up] softmaxed.
    Returns [B, H*scale, W*scale, C]. Implemented as k_up^2 shifted
    views of x, each broadcast to the fine grid and weighted — XLA
    fuses the stack into the mask contraction, no gather tables."""
    b, h, w, c = x.shape
    r = k_up // 2
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    out = None
    for i in range(k_up):
        for j in range(k_up):
            src = xp[:, i:i + h, j:j + w]                    # [B,H,W,C]
            fine = jnp.repeat(jnp.repeat(src, scale, 1), scale, 2)
            wgt = masks[..., i * k_up + j][..., None]
            out = fine * wgt if out is None else out + fine * wgt
    return out


class CARAFE(nn.Module):
    """CARAFE upsampler (kernel prediction + reassembly; mmcv
    ops/carafe.py, configs/carafe/*.py: c_mid 64, k_encoder 3,
    k_up 5, scale 2)."""

    c_mid: int = 64
    k_encoder: int = 3
    k_up: int = 5
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        s, k = self.scale, self.k_up
        y = nn.Conv(self.c_mid, (1, 1), dtype=self.dtype,
                    name="channel_compressor")(x)
        m = nn.Conv(k * k * s * s, (self.k_encoder, self.k_encoder),
                    padding=((self.k_encoder // 2,) * 2,) * 2,
                    dtype=jnp.float32, name="content_encoder")(y)
        # pixel-shuffle [B,H,W,k^2*s^2] -> [B,H*s,W*s,k^2]
        m = m.reshape(b, h, w, s, s, k * k)
        m = m.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, k * k)
        m = jax.nn.softmax(m, axis=-1)
        return carafe_upsample(x.astype(jnp.float32), m, k, s
                               ).astype(self.dtype)


class FPNCARAFE(nn.Module):
    """FPN whose top-down upsampling is CARAFE (reference
    mmdet/models/necks/fpn_carafe.py + configs/carafe/
    faster_rcnn_r50_fpn_carafe_1x_coco.py: start_level 0, num_outs 5,
    the extra P6 from a stride-2 conv... the reference's upsample_cfg
    replaces each interpolate; extra levels come from maxpool on the
    last output as in the base faster-rcnn FPN)."""

    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        lats = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f"lateral_{i}")(x)
                for i, x in enumerate(inputs)]
        for i in range(len(lats) - 1, 0, -1):
            up = CARAFE(dtype=self.dtype, name=f"carafe_{i}")(lats[i])
            lats[i - 1] = lats[i - 1] + up[:, :lats[i - 1].shape[1],
                                           :lats[i - 1].shape[2]]
        outs = [nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"fpn_conv_{i}")(l)
                for i, l in enumerate(lats)]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs
