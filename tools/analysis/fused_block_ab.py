"""Per-block fused-bottleneck vs XLA micro A/B (single-dispatch loop
timing on the real chip). Produced the per-block rows in docs/PERF.md:
C2 (256,64,256,152,256) fused 1.23x vs XLA; C3 1.07x (1.17x @tile 19).

  python tools/analysis/fused_block_ab.py      # run from the repo root
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import time, numpy as np, jax, jax.numpy as jnp
from aod_meh_hua_tpu.ops.fused_block import FoldedBlock, fused_bottleneck

def loop_time(fn, x, iters=30):
    @jax.jit
    def many(x):
        def body(i, c):
            y = fn(c)
            # runtime-zero feedback so iterations chain
            return c + jnp.where(jnp.isnan(y.reshape(-1)[0]), 1.0, 0.0).astype(c.dtype)
        return jax.lax.fori_loop(0, iters, body, x)
    jax.block_until_ready(many(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(many(x)); best = min(best, time.perf_counter()-t0)
    return best / iters

def mk(cin, p, cout, h, w, b, dt=jnp.bfloat16):
    r = np.random.RandomState(0)
    fb = FoldedBlock(
        w1=jnp.asarray(r.randn(cin, p)*0.05, dt), b1=jnp.asarray(r.randn(1, p), jnp.float32),
        w2=jnp.asarray(r.randn(9, p, p)*0.05, dt), b2=jnp.asarray(r.randn(1, p), jnp.float32),
        w3=jnp.asarray(r.randn(p, cout)*0.05, dt), b3=jnp.asarray(r.randn(1, cout), jnp.float32),
        wd=None, bd=None)
    x = jnp.asarray(r.randn(b, h, w, cin)*0.1, dt)
    return x, fb

def xla_block(x, fb):
    y = jnp.maximum(jnp.einsum('bhwc,cp->bhwp', x, fb.w1) + fb.b1[0], 0).astype(x.dtype)
    w2 = fb.w2.reshape(3, 3, fb.w2.shape[1], fb.w2.shape[2])
    y = jax.lax.conv_general_dilated(y, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = jnp.maximum(y + fb.b2[0], 0).astype(x.dtype)
    y = (jnp.einsum('bhwp,pc->bhwc', y, fb.w3) + fb.b3[0]).astype(x.dtype)
    return jnp.maximum(y + x, 0)

B = 32
for (cin, p, cout, h, w) in [(256, 64, 256, 152, 256), (512, 128, 512, 76, 128)]:
    x, fb = mk(cin, p, cout, h, w, B)
    tx = loop_time(lambda c: xla_block(c, fb), x)
    gb = 2 * B * h * w * (cin + cout) / 1e9
    print(f"shape=({cin},{p},{cout},{h},{w}) XLA {tx*1e3:.3f} ms  min-traffic-BW {(gb/tx):.0f} GB/s", flush=True)
    for th in (None, 4, 19):
        if th and h % th: continue
        try:
            tf = loop_time(lambda c: fused_bottleneck(c, fb, tile_h=th), x)
            print(f"  fused tile_h={th}: {tf*1e3:.3f} ms  ({tx/tf:.2f}x vs XLA, {(gb/tf):.0f} GB/s)", flush=True)
        except Exception as e:
            print(f"  fused tile_h={th}: FAIL {str(e).splitlines()[0][:120]}", flush=True)
