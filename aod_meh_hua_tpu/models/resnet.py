"""ResNet backbone (Flax), torchvision-layout compatible.

Behavioral parity target (reference, /root/reference):
* mmdet/models/backbones/resnet.py:305 — ResNet depth=50, pytorch style
  (stride on the 3x3 conv), out_indices (0,1,2,3), frozen_stages=1,
  norm_eval=True, torchvision-pretrained init
  (configs/_base_/Config_RetinaNet.py:24-33).

TPU notes:
* BatchNorm is always frozen at inference statistics (the reference runs
  norm_eval=True and never updates BN buffers during AL training), so BN
  here is use_running_average=True with stats in the 'batch_stats'
  collection — a pure affine transform XLA folds into the convs.
* Explicit symmetric padding matches torch exactly (XLA 'SAME' pads
  asymmetrically for stride 2, which would shift features vs the ported
  torchvision weights).
* frozen_stages is enforced by the optimizer mask (engine/train.py), not
  by the module.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def channel_dropout(x, rate: float, deterministic: bool):
    """Dropout2d equivalent: drop whole channels (the reference's
    MC-dropout injection after every ReLU, functions.py:492-505)."""
    if rate == 0.0:
        return x
    return nn.Dropout(rate, broadcast_dims=(1, 2), deterministic=deterministic)(x)


class Conv1x1Matmul(nn.Module):
    """1x1 conv computed as [B*H*W, Cin] @ [Cin, Cout] — the SAME
    'kernel' param tree as nn.Conv ((1, 1, Cin, Cout)), so checkpoints
    and the torchvision converter are layout-agnostic to the flag.

    MEASURED DEAD END (kept for the record + A/B reproducibility): an
    early degraded-relay probe suggested 4.6x on the C2 1x1 shapes, but
    the single-dispatch fori_loop probe on a healthy relay (2026-08-19,
    pallas_probe --matmul --loop) shows conv 13.3% vs plain matmul
    14.2% of bf16 peak — both pinned at the op's HBM-bandwidth roofline
    (~21%), and the full scoring program gets SLOWER with the flag on
    (292.6 vs 320.6 img/s/chip: the reshape breaks XLA's conv-to-conv
    layout chaining). The real lever for these bandwidth-bound blocks
    is whole-block fusion (ops/fused_block.py)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        sy, sx = self.strides
        if (sy, sx) != (1, 1):
            x = x[:, ::sy, ::sx, :]
        b, h, w, _ = x.shape
        y = jnp.dot(x.reshape(b * h * w, cin).astype(self.dtype),
                    kernel.reshape(cin, self.features).astype(self.dtype))
        return y.reshape(b, h, w, self.features)


def _make_conv(int8: bool, features, kernel_size, strides, padding, dtype, name,
               as_matmul: bool = False):
    """nn.Conv(use_bias=False) or its int8-PTQ drop-in (same param tree).

    int8 takes precedence over as_matmul: Int8Conv already lowers 1x1
    convs through the int8 MXU path, so the two flags never compose."""
    if int8 and as_matmul:
        raise ValueError(
            "backbone_int8 and conv1x1_matmul are mutually exclusive: "
            "Int8Conv has its own lowering; set only one.")
    if int8:
        from .quant import Int8Conv

        return Int8Conv(features, kernel_size, strides=strides,
                        padding=padding, dtype=dtype, name=name)
    if as_matmul and kernel_size == (1, 1) and padding == ((0, 0), (0, 0)):
        return Conv1x1Matmul(features, strides=strides, dtype=dtype, name=name)
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   use_bias=False, dtype=dtype, name=name)


class _ConvParams(nn.Module):
    """Declares an nn.Conv-compatible 'kernel' param without the conv —
    the fused-block path reads weights directly (ops/fused_block.py) but
    must keep the variable tree IDENTICAL to the unfused module so
    checkpoints and converters are layout-agnostic to the flag."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _BNParams(nn.Module):
    """nn.BatchNorm-compatible params/batch_stats, data only."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return {"scale": scale, "bias": bias}, {"mean": mean.value, "var": var.value}


class Bottleneck(nn.Module):
    planes: int  # bottleneck width; output is 4 * planes
    stride: int = 1
    downsample: bool = False
    mc_dropout: float = 0.0
    int8: bool = False
    # "dcn" (v1) / "mdcn" (modulated v2) replaces conv2 with a deformable
    # conv (reference resnet.py:174-195, configs/dcn/*.py)
    dcn: Any = None
    gcb_ratio: Any = None  # GCNet ContextBlock after conv3 (configs/gcnet/)
    # GeneralizedAttention plugin after conv2 (attention_type string;
    # reference configs/empirical_attention/*, position='after_conv2')
    attention: Any = None
    conv1x1_matmul: bool = False
    # single fused Pallas kernel for the whole block (scoring/eval only —
    # no custom VJP; exact math, see ops/fused_block.py). Requires
    # stride 1 and no plugins; silently falls back otherwise.
    fused: bool = False
    dtype: Any = jnp.float32

    def _fused_eligible(self):
        return (self.fused and self.stride == 1 and not self.dcn
                and not self.gcb_ratio and not self.attention
                and not self.int8 and self.mc_dropout == 0.0)

    @nn.compact
    def __call__(self, x):
        # Mosaic constraint (measured on v5e, 2026-08-19): the halo DMA
        # slices x in HBM, and slices along the lane (channel) dim must
        # be 128-aligned — so the 64-channel stem output (C2 block 0)
        # cannot take the fused path and falls back to the unfused ops.
        if self._fused_eligible() and x.shape[-1] % 128 == 0:
            from ..ops.fused_block import fold_bottleneck, fused_bottleneck

            cin = x.shape[-1]
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            p["conv1"] = {"kernel": _ConvParams((1, 1, cin, self.planes), name="conv1")()}
            p["bn1"], s["bn1"] = _BNParams(self.planes, name="bn1")()
            p["conv2"] = {"kernel": _ConvParams(
                (3, 3, self.planes, self.planes), name="conv2")()}
            p["bn2"], s["bn2"] = _BNParams(self.planes, name="bn2")()
            p["conv3"] = {"kernel": _ConvParams(
                (1, 1, self.planes, self.planes * 4), name="conv3")()}
            p["bn3"], s["bn3"] = _BNParams(self.planes * 4, name="bn3")()
            if self.downsample:
                p["downsample_conv"] = {"kernel": _ConvParams(
                    (1, 1, cin, self.planes * 4), name="downsample_conv")()}
                p["downsample_bn"], s["downsample_bn"] = _BNParams(
                    self.planes * 4, name="downsample_bn")()
            fb = fold_bottleneck(p, s)
            return fused_bottleneck(x.astype(self.dtype), fb)

        drop = lambda v: channel_dropout(v, self.mc_dropout, deterministic=False)
        identity = x
        y = _make_conv(self.int8, self.planes, (1, 1), (1, 1), ((0, 0), (0, 0)),
                       self.dtype, "conv1", as_matmul=self.conv1x1_matmul)(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = drop(nn.relu(y))
        if self.dcn:
            from .deform import DeformableConv3x3

            y = DeformableConv3x3(self.planes, stride=self.stride,
                                  modulated=(self.dcn == "mdcn"),
                                  dtype=self.dtype, name="conv2")(y)
        else:
            y = _make_conv(self.int8, self.planes, (3, 3),
                           (self.stride, self.stride), ((1, 1), (1, 1)),
                           self.dtype, "conv2")(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        y = drop(nn.relu(y))
        if self.attention:
            from .attention import GeneralizedAttention

            y = GeneralizedAttention(
                num_heads=8, attention_type=self.attention, kv_stride=2,
                dtype=self.dtype, name="gen_attention")(y)
        y = _make_conv(self.int8, self.planes * 4, (1, 1), (1, 1),
                       ((0, 0), (0, 0)), self.dtype, "conv3",
                       as_matmul=self.conv1x1_matmul)(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn3")(y)
        if self.gcb_ratio:
            from .deform import ContextBlock

            y = ContextBlock(self.gcb_ratio, dtype=self.dtype,
                             name="context_block")(y)
        if self.downsample:
            identity = _make_conv(self.int8, self.planes * 4, (1, 1),
                                  (self.stride, self.stride), ((0, 0), (0, 0)),
                                  self.dtype, "downsample_conv",
                                  as_matmul=self.conv1x1_matmul)(x)
            identity = nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="downsample_bn"
            )(identity)
        return drop(nn.relu(y + identity))


def _space_to_depth_stem(x, kernel, dtype):
    """7x7 stride-2 pad-3 stem conv as a 4x4 stride-1 conv on
    space-to-depth(2) input — mathematically identical, but the MXU sees
    12 input channels at quarter the spatial positions instead of 3 at
    full resolution (the classic TPU ResNet stem layout, cf. MLPerf
    ResNet submissions). kernel: the ordinary [7,7,3,C] HWIO parameter —
    the checkpoint/converter layout is unchanged; the reshuffle below is
    a few-KB gather XLA fuses into the conv.

    Derivation: y[i] = sum_k w[k] x[2i+k-3]; split k = 2t + r - 1 with
    tap t in 0..3 and parity r in {0,1}; x[2(i+t-2)+r] lives in the
    space-to-depth channel (r, c) of cell i+t-2, so the equivalent conv
    has taps t in 0..3 with left pad 2 / right pad 1.
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "s2d stem needs even input dims"
    cout = kernel.shape[-1]
    # [7,7,3,C] -> zero-pad front -> [8,8,3,C] -> [4,(ry),4,(rx),3,C]
    k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k4 = k8.reshape(4, 2, 4, 2, c, cout).transpose(0, 2, 1, 3, 4, 5)
    k4 = k4.reshape(4, 4, 4 * c, cout).astype(dtype)
    # x -> [B,H/2,W/2,(dy,dx,c)]
    x2 = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    x2 = x2.reshape(b, h // 2, w // 2, 4 * c)
    return jax.lax.conv_general_dilated(
        x2, k4, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )


class _StemConvS2D(nn.Module):
    """Drop-in replacement for the 7x7/2 stem nn.Conv with the SAME
    parameter tree (conv1/kernel, [7,7,3,C] HWIO) — checkpoints and the
    torchvision converter are layout-agnostic to the flag."""

    features: int
    compute_dtype: Any

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features), jnp.float32,
        )
        return _space_to_depth_stem(x, kernel, self.compute_dtype)


class ResNet(nn.Module):
    """Bottleneck ResNet returning (C2, C3, C4, C5). NHWC."""

    block_counts: Sequence[int] = (3, 4, 6, 3)
    stem_width: int = 64
    mc_dropout: float = 0.0
    stem_s2d: bool = False
    int8: bool = False  # dynamic-PTQ scoring mode (models/quant.py)
    # "dcn"/"mdcn" + per-stage mask: deformable conv2 in those stages
    # (reference stage_with_dcn=(False, True, True, True) = c3-c5)
    dcn: Any = None
    stage_with_dcn: Sequence[bool] = (False, True, True, True)
    # GCNet ContextBlock after conv3 in c3-c5 (ratio 1/4 or 1/16)
    gcb_ratio: Any = None
    stage_with_gcb: Sequence[bool] = (False, True, True, True)
    # GeneralizedAttention after conv2 (empirical_attention: c4-c5)
    attention: Any = None
    stage_with_attention: Sequence[bool] = (False, False, True, True)
    # 1x1 convs as reshaped matmuls (Conv1x1Matmul): measured dead end —
    # see Conv1x1Matmul's docstring; keep False
    conv1x1_matmul: bool = False
    # fused Pallas bottleneck for the HBM-bound narrow stages (census:
    # C2 runs at 5-39% of peak under XLA's conv-by-conv execution);
    # stride-1 blocks in the flagged stages only. Scoring/eval only.
    fused_blocks: bool = False
    stage_fused: Sequence[bool] = (True, True, False, False)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        if self.stem_s2d:
            x = _StemConvS2D(self.stem_width, self.dtype, name="conv1")(x)
        else:
            x = _make_conv(self.int8, self.stem_width, (7, 7), (2, 2),
                           ((3, 3), (3, 3)), self.dtype, "conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = channel_dropout(nn.relu(x), self.mc_dropout, deterministic=False)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for stage, n_blocks in enumerate(self.block_counts):
            planes = self.stem_width * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Bottleneck(
                    planes=planes, stride=stride, downsample=(b == 0),
                    mc_dropout=self.mc_dropout, int8=self.int8,
                    dcn=(self.dcn if self.stage_with_dcn[stage] else None),
                    gcb_ratio=(self.gcb_ratio
                               if self.stage_with_gcb[stage] else None),
                    attention=(self.attention
                               if self.stage_with_attention[stage] else None),
                    conv1x1_matmul=self.conv1x1_matmul,
                    fused=(self.fused_blocks and self.stage_fused[stage]),
                    dtype=self.dtype, name=f"layer{stage + 1}_{b}",
                )(x)
            outs.append(x)
        return tuple(outs)


def convert_torchvision_resnet(state_dict: Dict[str, "np.ndarray"], block_counts=(3, 4, 6, 3)):
    """torchvision resnet{50,101} state_dict -> (params, batch_stats) pytrees.

    Accepts a dict of numpy arrays (torch tensors already .numpy()'d).
    Conv kernels transpose OIHW -> HWIO. The classifier head is dropped.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(src):
        return {"kernel": np.transpose(np.asarray(state_dict[src + ".weight"]), (2, 3, 1, 0))}

    def bn(src):
        p = {"scale": np.asarray(state_dict[src + ".weight"]),
             "bias": np.asarray(state_dict[src + ".bias"])}
        s = {"mean": np.asarray(state_dict[src + ".running_mean"]),
             "var": np.asarray(state_dict[src + ".running_var"])}
        return p, s

    params["conv1"] = conv("conv1")
    params["bn1"], stats["bn1"] = bn("bn1")
    for stage, n_blocks in enumerate(block_counts):
        for b in range(n_blocks):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_{b}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for i in (1, 2, 3):
                blk_p[f"conv{i}"] = conv(f"{src}.conv{i}")
                blk_p[f"bn{i}"], blk_s[f"bn{i}"] = bn(f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in state_dict:
                blk_p["downsample_conv"] = conv(f"{src}.downsample.0")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bn(f"{src}.downsample.1")
            params[dst] = blk_p
            stats[dst] = blk_s
    return params, stats
