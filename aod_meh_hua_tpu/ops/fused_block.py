"""Pallas fused ResNet bottleneck block for bandwidth-bound stages.

Motivation (measured, tools/analysis/pallas_probe.py --census --loop on
a real v5e chip, 2026-08-19): the C2-stage bottleneck convs run at
5-39% of bf16 peak under XLA — not an MXU-padding problem but an HBM
problem. At 64 bottleneck channels the per-op arithmetic intensity
(e.g. 2*K*N/(2*(K+N)) = 51 flop/B for the 256->64 1x1) sits far below
the v5e compute/bandwidth ratio (~240 flop/B), so every conv is
bandwidth-bound and XLA's conv-by-conv execution pays an HBM round
trip per op: the measured C2 identity block (1.48 + 1.22 + 1.53 ms
@batch32) matches its ~80 MB/image traffic almost exactly, and the
probe's transposed-matmul experiment showed XLA already at ~93% of the
single-op bandwidth roofline — layout is a dead end; FUSION is the
lever.

This kernel runs the whole bottleneck —

    out = relu( bn3(conv3( relu(bn2(conv2( relu(bn1(conv1(x))) )))) )
                + residual(x) )

— in one pass: x streams HBM->VMEM once per row-tile (with a 1-row
halo for the 3x3, via explicitly double-buffered async DMA — Mosaic
does not yet support pl.Element low padding, so halo windows cannot
ride the automatic pipeline), every intermediate lives in VMEM, and
only the final activation returns to HBM. Traffic for an identity
block drops from ~5 tensor round-trips to read-x + write-out (~2.2x
less); for the C2.b0 downsample block (XLA runs conv path + downsample
+ add as separate HBM ops) ~5x less. BN is frozen in this framework
(the reference runs norm_eval=True), so bn folds into conv weights
exactly: w' = w * scale/sqrt(var+eps), b' = bias - mean*scale/sqrt().

Behavioral parity: pure re-expression of models/resnet.py Bottleneck
(itself mirroring reference mmdet/models/backbones/resnet.py:305
Bottleneck, pytorch style) — no semantic change; exactness is tested
against the unfused module in float32 and to bf16 rounding in bf16
(tests/test_fused_block.py).

Edge semantics: the scratch halo rows that fall outside the image are
never DMA'd (stale VMEM) — the kernel zeroes conv1's output on those
rows, which is exactly conv2's zero-padding, so stale data never
propagates. The 3x3's horizontal zero padding is a zero-column
concatenate in VMEM.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FoldedBlock(NamedTuple):
    """BN-folded bottleneck weights (see fold_bottleneck)."""

    w1: jnp.ndarray  # [Cin, P]
    b1: jnp.ndarray  # [1, P]
    w2: jnp.ndarray  # [9, P, P] (3x3 taps, HW-major)
    b2: jnp.ndarray  # [1, P]
    w3: jnp.ndarray  # [P, Cout]
    b3: jnp.ndarray  # [1, Cout]
    wd: Optional[jnp.ndarray]  # [Cin, Cout] downsample or None
    bd: Optional[jnp.ndarray]  # [1, Cout]


def fold_bn(kernel: jnp.ndarray, scale, bias, mean, var, eps: float = 1e-5):
    """Fold a frozen BatchNorm into the preceding conv (exact)."""
    s = scale / jnp.sqrt(var + eps)
    return kernel * s, (bias - mean * s)


def fold_bottleneck(p: dict, s: dict, eps: float = 1e-5) -> FoldedBlock:
    """models/resnet.py Bottleneck params/batch_stats -> FoldedBlock.

    p: {'conv1': {'kernel'}, 'bn1': {'scale','bias'}, ...,
        optional 'downsample_conv'/'downsample_bn'};
    s: {'bn1': {'mean','var'}, ...}.
    """
    k1, b1 = fold_bn(p["conv1"]["kernel"], p["bn1"]["scale"], p["bn1"]["bias"],
                     s["bn1"]["mean"], s["bn1"]["var"], eps)
    k2, b2 = fold_bn(p["conv2"]["kernel"], p["bn2"]["scale"], p["bn2"]["bias"],
                     s["bn2"]["mean"], s["bn2"]["var"], eps)
    k3, b3 = fold_bn(p["conv3"]["kernel"], p["bn3"]["scale"], p["bn3"]["bias"],
                     s["bn3"]["mean"], s["bn3"]["var"], eps)
    wd = bd = None
    if "downsample_conv" in p:
        kd, bd_ = fold_bn(
            p["downsample_conv"]["kernel"], p["downsample_bn"]["scale"],
            p["downsample_bn"]["bias"], s["downsample_bn"]["mean"],
            s["downsample_bn"]["var"], eps)
        wd = kd.reshape(kd.shape[-2], kd.shape[-1])
        bd = bd_.reshape(1, -1)
    cin, pl_ = k1.shape[-2], k1.shape[-1]
    cout = k3.shape[-1]
    return FoldedBlock(
        w1=k1.reshape(cin, pl_), b1=b1.reshape(1, -1),
        w2=k2.reshape(9, pl_, pl_), b2=b2.reshape(1, -1),
        w3=k3.reshape(pl_, cout), b3=b3.reshape(1, -1),
        wd=wd, bd=bd,
    )


def _halo_dma(x_hbm, xs, sems, bb, tt, slot, *, th: int, h: int, nt: int):
    """The (start-able, wait-able) halo-window copy for tile (bb, tt)
    into scratch slot `slot`. Three static-size variants: interior tiles
    copy th+2 rows; the first/last tile copy th+1 and leave the
    out-of-image scratch row stale (the kernel zeroes its conv1 output).
    nt == 1 copies exactly the th in-image rows."""
    def mk(src_row, dst_row, n_rows):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(src_row, n_rows)],
            xs.at[slot, pl.ds(dst_row, n_rows)],
            sems.at[slot])

    if nt == 1:
        return [(None, mk(0, 1, th))]
    first = mk(0, 1, th + 1)
    inner = mk(tt * th - 1, 0, th + 2)
    last = mk(h - th - 1, 0, th + 1)
    return [(tt == 0, first),
            ((tt > 0) & (tt < nt - 1), inner),
            (tt == nt - 1, last)]


def _run_variants(variants, action):
    for cond, dma in variants:
        if cond is None:
            action(dma)
        else:
            @pl.when(cond)
            def _(dma=dma):
                action(dma)


def _kernel(x_hbm, w1, b1, w2, b2, w3, b3, wd, bd, out_ref, xs, sems, *,
            tile_h: int, h: int, use_down: bool, acc_dtype=jnp.float32):
    th = tile_h
    bi = pl.program_id(0)
    t = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    li = bi * nt + t
    slot = jax.lax.rem(li, 2)

    # double-buffered input: first program starts its own copy; every
    # program prefetches the next tile's window, then waits on its own
    @pl.when(li == 0)
    def _():
        _run_variants(_halo_dma(x_hbm, xs, sems, bi, t, slot,
                                th=th, h=h, nt=nt),
                      lambda d: d.start())

    nxt_t = jax.lax.rem(t + 1, nt)
    nxt_b = bi + jnp.where(t + 1 == nt, 1, 0)

    @pl.when(li + 1 < nb * nt)
    def _():
        _run_variants(_halo_dma(x_hbm, xs, sems, nxt_b, nxt_t,
                                jax.lax.rem(li + 1, 2), th=th, h=h, nt=nt),
                      lambda d: d.start())

    _run_variants(_halo_dma(x_hbm, xs, sems, bi, t, slot,
                            th=th, h=h, nt=nt),
                  lambda d: d.wait())

    xh = xs[slot]                        # [th+2, W, Cin]
    hw, w_, cin = xh.shape
    p = w1.shape[-1]
    cout = w3.shape[-1]
    m = th * w_

    # conv1 (1x1) + bn1 + relu over the halo rows too (cheap; needed for
    # the 3x3's vertical taps)
    y1 = jnp.dot(xh.reshape(hw * w_, cin), w1[...],
                 preferred_element_type=acc_dtype)
    y1 = jnp.maximum(y1 + b1[...].astype(acc_dtype), 0.0)
    y1 = y1.reshape(hw, w_, p).astype(xh.dtype)
    # zero the out-of-image halo rows: conv2's zero padding AND the
    # kill-switch for the stale scratch rows the DMA never wrote
    rows = jax.lax.broadcasted_iota(jnp.int32, (hw, 1, 1), 0)
    valid = ((rows > 0) | (t > 0)) & ((rows < th + 1) | (t < nt - 1))
    y1 = jnp.where(valid, y1, 0)
    # pad W for the horizontal taps
    zcol = jnp.zeros((hw, 1, p), y1.dtype)
    y1p = jnp.concatenate([zcol, y1, zcol], axis=1)  # [th+2, W+2, P]

    # conv2 (3x3) + bn2 + relu: 9 shifted VMEM matmuls on the MXU
    acc = jnp.broadcast_to(b2[...].astype(acc_dtype), (m, p))
    for dy in range(3):
        for dx in range(3):
            tap = y1p[dy:dy + th, dx:dx + w_].reshape(m, p)
            acc = acc + jnp.dot(tap, w2[dy * 3 + dx],
                                preferred_element_type=acc_dtype)
    y2 = jnp.maximum(acc, 0.0).astype(xh.dtype)

    # conv3 (1x1) + bn3, residual, final relu
    y3 = jnp.dot(y2, w3[...], preferred_element_type=acc_dtype)
    y3 = y3 + b3[...].astype(acc_dtype)
    xc = xh[1:th + 1].reshape(m, cin)
    if use_down:
        res = jnp.dot(xc, wd[...], preferred_element_type=acc_dtype)
        res = res + bd[...].astype(acc_dtype)
    else:
        res = xc.astype(acc_dtype)
    out = jnp.maximum(y3 + res, 0.0)
    out_ref[0] = out.reshape(th, w_, cout).astype(out_ref.dtype)


def pick_tile_h(h: int, max_tile: int = 8) -> Optional[int]:
    """Largest divisor of h that is <= max_tile (VMEM budget: two
    (tile_h + 2)-row input slots + two tile_h-row output buffers)."""
    for th in range(min(h, max_tile), 0, -1):
        if h % th == 0:
            return th
    return None


def fused_bottleneck(
    x: jnp.ndarray,
    fb: FoldedBlock,
    tile_h: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run one stride-1 bottleneck block fused. x: [B, H, W, Cin]."""
    b, h, w_, cin = x.shape
    p = fb.w1.shape[-1]
    cout = fb.w3.shape[-1]
    if fb.wd is None:
        assert cin == cout, "identity residual needs Cin == Cout"
    th = tile_h or pick_tile_h(h)
    assert th is not None and h % th == 0, (h, th)
    nt = h // th
    dt = x.dtype

    has_down = fb.wd is not None
    wd = fb.wd if has_down else jnp.zeros((cin, cout), dt)
    bd = fb.bd if has_down else jnp.zeros((1, cout), jnp.float32)

    kern = functools.partial(_kernel, tile_h=th, h=h, use_down=has_down)

    flops = 2 * b * h * w_ * (cin * p + 9 * p * p + p * cout
                              + (cin * cout if has_down else 0))
    bytes_acc = 2 * b * h * w_ * (cin + cout)  # the point of the fusion

    full = lambda a: pl.BlockSpec(a.shape, lambda bb, tt: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    w_in = [fb.w1.astype(dt), fb.b1.astype(jnp.float32),
            fb.w2.astype(dt), fb.b2.astype(jnp.float32),
            fb.w3.astype(dt), fb.b3.astype(jnp.float32),
            wd.astype(dt), bd.astype(jnp.float32)]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w_, cout), dt),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            *[full(a) for a in w_in],
        ],
        out_specs=pl.BlockSpec((1, th, w_, cout), lambda bb, tt: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, w_, cin), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, *w_in)
