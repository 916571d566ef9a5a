"""E2e scoring A/B across fused_stages variants. Produced the
per-stage e2e table in docs/PERF.md (baseline 322.3 / C2+C3 313.2 /
C2 314.9 / C3 321.0 img/s, 2026-08-19): the custom-call boundary cost
cancels the per-block wins.

  python tools/analysis/fused_e2e_ab.py        # run from the repo root
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import sys, time
from dataclasses import replace
import numpy as np, jax, jax.numpy as jnp
from aod_meh_hua_tpu.engine import EvalBatch, make_score_step
from aod_meh_hua_tpu.models import build_retinanet, init_retinanet
from aod_meh_hua_tpu.utils.config import RetinaNetConfig

base = RetinaNetConfig(compute_dtype="bfloat16")
model, variables = init_retinanet(base, jax.random.PRNGKey(0))
h, w = base.canvas
b = 128
rng = np.random.RandomState(0)
batch = EvalBatch(
    jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 0.2),
    jnp.asarray(np.tile([[h, w]], (b, 1)).astype(np.int32)),
    jnp.asarray(np.ones((b, 4), np.float32)),
    jnp.ones(b, dtype=bool))

def timed(cfg, iters=8, warmup=3):
    step = make_score_step(build_retinanet(cfg), cfg)
    def chained(n):
        bt = batch; base_im = batch.images; u = mc = None
        for _ in range(n):
            u, mc = step(variables, bt)
            dep = jnp.where(jnp.isnan(u.sum()), 1.0, 0.0)
            bt = bt._replace(images=base_im + dep)
        return float(np.asarray(u.sum()) + np.asarray(mc.sum()))
    chained(warmup)
    t0 = time.perf_counter(); chained(iters)
    return b * iters / (time.perf_counter() - t0)

variants = [
    ("baseline", base),
    ("fused_c2c3", replace(base, fused_blocks=True)),
    ("fused_c2", replace(base, fused_blocks=True, fused_stages=(True, False, False, False))),
    ("fused_c3", replace(base, fused_blocks=True, fused_stages=(False, True, False, False))),
]
for name, cfg in variants:
    print(f"{name}: {timed(cfg):.1f} img/s", flush=True)
