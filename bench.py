"""Benchmark: pool-scoring throughput (images/sec) on one chip.

The north-star metric (BASELINE.md): pool scoring — the reference's
signature path — at >= 5x an A100 running the CUDA/PyTorch reference.
The reference's scorer is host-bound (python triple loops + 500-sample
torch Dirichlet per image with a device sync per dict entry,
reference mmdet/apis/test.py:90-135 + Lambda_L2.py:489-537); measured
throughputs reported for that class of loop are O(10) img/s on A100-class
hardware. We take REFERENCE_A100_IMG_S = 20.0 as a generous estimate, so
the 5x target is 100 img/s/chip; vs_baseline below is measured / (5x20).

Run: python bench.py [--batch N] [--iters N] [--dtype bfloat16]
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_A100_IMG_S = 20.0
TARGET_MULTIPLIER = 5.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    # persistent compile cache: repeated bench runs skip the ~100s compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from aod_meh_hua_tpu.engine import EvalBatch, make_score_step
    from aod_meh_hua_tpu.models import init_retinanet
    from aod_meh_hua_tpu.utils.config import RetinaNetConfig

    cfg = RetinaNetConfig(compute_dtype=args.dtype)
    model, variables = init_retinanet(cfg, jax.random.PRNGKey(0))
    step = make_score_step(model, cfg)

    h, w = cfg.canvas
    rng = np.random.RandomState(0)
    b = args.batch
    batch = EvalBatch(
        jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 0.2),
        jnp.asarray(np.tile([[600, 1000]], (b, 1)).astype(np.int32)),
        jnp.asarray(np.full((b, 4), 1.665, np.float32)),
        jnp.ones(b, dtype=bool),
    )

    for _ in range(args.warmup):
        unc, mc = step(variables, batch)
    jax.block_until_ready((unc, mc))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        unc, mc = step(variables, batch)
    jax.block_until_ready((unc, mc))
    dt = time.perf_counter() - t0

    img_s = b * args.iters / dt
    out = {
        "metric": "pool_scoring_throughput",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / (TARGET_MULTIPLIER * REFERENCE_A100_IMG_S), 3),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
