"""Measured probe of the two VERDICT-r2 "untried" backbone levers:
Pallas kernels and matmul layout orientation.

The scoring forward runs at 65% of v5e bf16 peak with the R50 backbone
at ~35% (docs/ARCHITECTURE.md). The hypothesized cause is the 64-wide
bottleneck convs padding to the 128-lane MXU. This tool measures, on
the real chip, instead of arguing:

  1. --census: every distinct conv shape in R50@608x1024, timed
     standalone (bf16, XLA), against its MXU-ideal time — so the slow
     stage is identified per-op rather than inferred from stage sums.
  2. --matmul: the C2-stage 1x1 conv (K=256 -> N=64) expressed four
     ways: XLA conv, XLA matmul [M,256]@[256,64], XLA TRANSPOSED
     matmul [64,256]@[256,M] (moves the 64 from the padded lane dim to
     the 8/16-granular sublane dim), and a Pallas kernel of the
     transposed form.

Usage: python tools/analysis/pallas_probe.py [--census] [--matmul]
       [--batch 32] [--iters 20]

No reference counterpart (the reference inherits cuDNN autotuning);
closest analog tools/analysis_tools/benchmark.py which times e2e only.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def _chain_timed(fn, args, iters, warmup=3):
    """Relay-safe timing: each iteration perturbs one small input with a
    runtime-zero derived from the previous output and the final scalar
    is fetched, so the async dispatch journal cannot under-report."""
    import jax.numpy as jnp

    def run(n):
        a = list(args)
        out = None
        for _ in range(n):
            out = fn(*a)
            dep = jnp.where(jnp.isnan(jnp.sum(out)), 1.0, 0.0).astype(a[-1].dtype)
            a[-1] = a[-1] + dep
        return float(np.asarray(jnp.sum(out).astype(jnp.float32)))

    run(warmup)
    t0 = time.perf_counter()
    s = run(iters)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(s)
    return dt


_CALL_OVERHEAD = {}  # keyed on iters: the null loop bakes the trip count in


def _loop_timed(fn, fargs, iters):
    """Timing for a SYNCHRONOUS-mode relay (this environment degrades to
    one round-trip per dispatch after any D2H fetch): build ONE jitted
    program that runs `fn` `iters` times serially inside a lax.fori_loop
    (data dependency threaded through a runtime-zero so XLA can neither
    hoist nor elide the op), execute it with a single dispatch, fetch a
    single scalar. Per-op time = (call time - measured null-call
    overhead) / iters. _chain_timed pays ~6 eager dispatches + relay
    latency PER ITERATION, which swamps ms-scale ops here; this pays one.
    """
    import jax
    import jax.numpy as jnp

    if iters not in _CALL_OVERHEAD:
        @jax.jit
        def null(x):
            return jax.lax.fori_loop(0, iters, lambda i, a: a + 1.0, x)

        float(np.asarray(null(jnp.float32(0))))
        t0 = time.perf_counter()
        for _ in range(3):
            float(np.asarray(null(jnp.float32(0))))
        _CALL_OVERHEAD[iters] = (time.perf_counter() - t0) / 3
        print(json.dumps({"null_call_overhead_ms":
                          round(_CALL_OVERHEAD[iters] * 1e3, 3),
                          "iters": iters}), flush=True)

    @jax.jit
    def many(*fa):
        def body(i, carry):
            a, acc = carry
            out = fn(*a)
            flat = out.reshape(-1)
            s = jnp.sum(jax.lax.slice(
                flat, (0,), (min(8, flat.shape[0]),)).astype(jnp.float32))
            eps = jnp.where(jnp.isnan(s), 1.0, 0.0)
            x = a[0]
            idx = (0,) * x.ndim
            upd = (jax.lax.dynamic_slice(x, idx, (1,) * x.ndim)
                   + eps.astype(x.dtype))
            a = (jax.lax.dynamic_update_slice(x, upd, idx),) + tuple(a[1:])
            return (a, acc + s)

        (_, acc) = jax.lax.fori_loop(
            0, iters, body, (tuple(fa), jnp.float32(0)))
        return acc

    s = float(np.asarray(many(*fargs)))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s = float(np.asarray(many(*fargs)))
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(s)
    return max(best - _CALL_OVERHEAD[iters], 1e-9) / iters


def resnet50_conv_shapes(h=608, w=1024):
    """(name, H, W, Cin, Cout, k, stride, count) for every distinct conv
    in torchvision-layout R50 (models/resnet.py)."""
    shapes = [("stem7x7", h, w, 3, 64, 7, 2, 1)]
    ph, pw = h // 4, w // 4  # after stride-2 stem + stride-2 maxpool
    stages = [  # (planes, blocks, in_ch, stride)
        (64, 3, 64, 1), (128, 4, 256, 2), (256, 6, 512, 2), (512, 3, 1024, 2),
    ]
    for si, (planes, blocks, cin, stride) in enumerate(stages):
        oh, ow = ph // stride, pw // stride
        nm = f"C{si + 2}"
        # first block (input at pre-stride spatial for conv1)
        shapes += [
            (f"{nm}.b0.conv1", ph, pw, cin, planes, 1, 1, 1),
            (f"{nm}.b0.conv2", ph, pw, planes, planes, 3, stride, 1),
            (f"{nm}.b0.conv3", oh, ow, planes, planes * 4, 1, 1, 1),
            (f"{nm}.b0.down", ph, pw, cin, planes * 4, 1, stride, 1),
        ]
        if blocks > 1:  # identical remaining blocks, timed once x count
            shapes += [
                (f"{nm}.bN.conv1", oh, ow, planes * 4, planes, 1, 1, blocks - 1),
                (f"{nm}.bN.conv2", oh, ow, planes, planes, 3, 1, blocks - 1),
                (f"{nm}.bN.conv3", oh, ow, planes, planes * 4, 1, 1, blocks - 1),
            ]
        ph, pw = oh, ow
    return shapes


def census(args):
    import jax
    import jax.numpy as jnp

    rows = []
    rng = np.random.RandomState(0)
    total_ms = total_ideal = 0.0
    for name, h, w, cin, cout, k, stride, count in resnet50_conv_shapes():
        b = args.batch
        x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32) * 0.1,
                        dtype=jnp.bfloat16)
        wk = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32) * 0.01,
                         dtype=jnp.bfloat16)
        pad = ((k // 2, k // 2),) * 2

        @jax.jit
        def conv(x, wk):
            return jax.lax.conv_general_dilated(
                x, wk, (stride, stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        timed = _loop_timed if args.loop else _chain_timed
        dt = timed(conv, (x, wk), args.iters)
        flops = 2 * b * (h // stride) * (w // stride) * k * k * cin * cout
        ideal_ms = flops / (V5E_BF16_PEAK_TFLOPS * 1e12) * 1e3
        rows.append({"op": name, "ms": round(dt * 1e3, 3),
                     "ideal_ms": round(ideal_ms, 3),
                     "pct_peak": round(100 * ideal_ms / (dt * 1e3), 1),
                     "count": count})
        total_ms += dt * 1e3 * count
        total_ideal += ideal_ms * count
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"op": "TOTAL(weighted)", "ms": round(total_ms, 2),
                      "ideal_ms": round(total_ideal, 2),
                      "pct_peak": round(100 * total_ideal / total_ms, 1)}))


def matmul_probe(args):
    """The C2 1x1 conv four ways. M = batch * 152 * 256 spatial sites."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = args.batch
    h, w, k, n = 152, 256, 256, 64
    m = b * h * w
    tm = 512
    m = (m // tm) * tm
    rng = np.random.RandomState(0)
    # transposes built HOST-side: np.asarray(device_array).T would pull
    # hundreds of MB back over the relay before the probe even starts
    x_np = (rng.randn(m, k).astype(np.float32) * 0.1)
    wt_np = (rng.randn(k, n).astype(np.float32) * 0.02)
    x = jnp.asarray(x_np, jnp.bfloat16)
    wt = jnp.asarray(wt_np, jnp.bfloat16)
    xt = jnp.asarray(np.ascontiguousarray(x_np.T), jnp.bfloat16)  # [K, M]
    wtt = jnp.asarray(np.ascontiguousarray(wt_np.T), jnp.bfloat16)  # [N, K]
    flops = 2 * m * k * n
    out = {}

    def report(tag, dt):
        ms = dt * 1e3
        out[tag] = {"ms": round(ms, 3),
                    "pct_peak": round(100 * flops / (V5E_BF16_PEAK_TFLOPS * 1e12 * dt), 1)}
        print(json.dumps({tag: out[tag]}), flush=True)

    @jax.jit
    def conv_form(xi, wi):  # NHWC 1x1 conv, the layout the backbone uses
        return jax.lax.conv_general_dilated(
            xi.reshape(b, h, w, k)[: (m // (h * w))], wi.reshape(1, 1, k, n),
            (1, 1), ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def plain(xi, wi):  # [M, K] @ [K, N] — N=64 on the 128-lane dim
        return jnp.dot(xi, wi, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def transposed(wi, xi):  # [N, K] @ [K, M] — 64 on the sublane dim
        return jnp.dot(wi, xi, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def pallas_kernel(wt_ref, xt_ref, o_ref):
        o_ref[:] = jnp.dot(wt_ref[:], xt_ref[:],
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)

    @jax.jit
    def pallas_t(wi, xi):
        return pl.pallas_call(
            pallas_kernel,
            interpret=bool(args.cpu),
            out_shape=jax.ShapeDtypeStruct((n, m), jnp.bfloat16),
            grid=(m // tm,),
            in_specs=[
                pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, tm), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=(k * m + n * k + n * m) * 2,
                transcendentals=0),
        )(wi, xi)

    # numerical check of the pallas kernel (block-index semantics);
    # fetch only a column slice — the full [N, M] is ~163 MB at batch 32,
    # minutes over a degraded relay
    cs = min(4096, m)
    want = np.asarray(jax.lax.slice(transposed(wtt, xt), (0, 0), (n, cs))
                      ).astype(np.float32)
    got = np.asarray(jax.lax.slice(pallas_t(wtt, xt), (0, 0), (n, cs))
                     ).astype(np.float32)
    err = float(np.max(np.abs(want - got)))
    print(json.dumps({"pallas_vs_xla_max_abs_err": err}), flush=True)
    assert err < 1e-1, "pallas transposed matmul disagrees with XLA"

    timed = _loop_timed if args.loop else _chain_timed
    report("conv_1x1_nhwc", timed(conv_form, (x, wt), args.iters))
    report("matmul_MK_KN", timed(plain, (x, wt), args.iters))
    report("matmul_NK_KM_transposed", timed(transposed, (wtt, xt), args.iters))
    report("pallas_NK_KM_transposed", timed(pallas_t, (wtt, xt), args.iters))
    print(json.dumps(out))


def block_probe(args):
    """Fused Pallas bottleneck (ops/fused_block.py) vs the unfused
    conv-BN-relu chain XLA runs, on the two C2-stage block shapes the
    census flags as bandwidth-bound (plus the C3 identity block).
    Numerics are asserted on-chip before timing."""
    import jax
    import jax.numpy as jnp

    from aod_meh_hua_tpu.models.resnet import Bottleneck
    from aod_meh_hua_tpu.ops.fused_block import fold_bottleneck, fused_bottleneck

    b = args.batch
    cases = [
        ("C2.bN", 152, 256, 256, 64, False),
        ("C2.b0", 152, 256, 64, 64, True),
        ("C3.bN", 76, 128, 512, 128, False),
    ]
    rng = np.random.RandomState(0)
    timed = _loop_timed if args.loop else _chain_timed
    out = {}
    for name, h, w, cin, planes, down in cases:
        model = Bottleneck(planes=planes, stride=1, downsample=down,
                           dtype=jnp.bfloat16)
        x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        fb = fold_bottleneck(variables["params"], variables["batch_stats"])

        unfused = jax.jit(lambda v, xi: model.apply(v, xi))
        fused = jax.jit(lambda xi: fused_bottleneck(xi, fb,
                                                    interpret=bool(args.cpu)))

        want = np.asarray(jax.lax.slice(
            unfused(variables, x), (0, 0, 0, 0), (1, 4, w, 16))).astype(np.float32)
        got = np.asarray(jax.lax.slice(
            fused(x), (0, 0, 0, 0), (1, 4, w, 16))).astype(np.float32)
        err = float(np.max(np.abs(want - got)))
        rel = err / max(1.0, float(np.abs(want).max()))
        print(json.dumps({f"{name}_fused_vs_unfused_rel_err": round(rel, 5)}),
              flush=True)
        assert rel < 0.06, f"{name} fused kernel disagrees on chip"

        # time with x as the (perturbed) arg; variables ride as a closure
        # since the loop-timer's perturbation scheme needs array args
        dt_u = timed(lambda xi: unfused(variables, xi), (x,), args.iters)
        dt_f = timed(fused, (x,), args.iters)
        out[name] = {"unfused_ms": round(dt_u * 1e3, 3),
                     "fused_ms": round(dt_f * 1e3, 3),
                     "speedup": round(dt_u / dt_f, 2)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--census", action="store_true")
    ap.add_argument("--matmul", action="store_true")
    ap.add_argument("--block", action="store_true",
                    help="fused Pallas bottleneck vs unfused XLA chain")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--loop", action="store_true",
                    help="in-jit fori_loop timing: one dispatch + one "
                         "fetch per shape (use when the relay is in "
                         "synchronous mode; see _loop_timed)")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU + pallas interpret semantics (plumbing check)")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    if not (args.census or args.matmul or args.block):
        args.census = args.matmul = True
    if args.matmul:
        matmul_probe(args)
    if args.block:
        block_probe(args)
    if args.census:
        census(args)


if __name__ == "__main__":
    main()
