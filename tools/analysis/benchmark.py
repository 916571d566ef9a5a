"""Inference FPS benchmark (reference tools/analysis_tools/benchmark.py:51-123).

Measures end-to-end eval-step throughput (forward -> decode -> NMS) on
the current default device, skipping warmup iterations like the
reference. Run: python tools/analysis/benchmark.py [--family ssd] ...
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    from aod_meh_hua_tpu.utils.config import ALL_FAMILIES

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="retinanet",
                    choices=sorted(ALL_FAMILIES))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import EvalBatch
    from aod_meh_hua_tpu.utils.config import (RetinaNetConfig, SSDConfig,
                                              ZOO_FAMILIES)

    if args.family == "retinanet":
        cfg = RetinaNetConfig(compute_dtype=args.dtype)
    elif args.family == "ssd":
        cfg = SSDConfig(compute_dtype=args.dtype)
    else:
        cfg = ZOO_FAMILIES[args.family][0](compute_dtype=args.dtype)
    model, variables = init_detector(cfg)
    step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    rng = np.random.RandomState(0)
    b = args.batch
    batch = EvalBatch(
        jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 0.2),
        jnp.asarray(np.tile([[h, w]], (b, 1)).astype(np.int32)),
        jnp.ones((b, 4), jnp.float32),
        jnp.ones(b, dtype=bool),
    )
    for _ in range(args.warmup):
        dets = step(variables, batch)
    jax.block_until_ready(dets)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        dets = step(variables, batch)
    jax.block_until_ready(dets)
    dt = time.perf_counter() - t0
    fps = b * args.iters / dt
    print(f"family={args.family} batch={b} dtype={args.dtype}: "
          f"{fps:.1f} img/s ({1000 * dt / (b * args.iters):.2f} ms/img)")


if __name__ == "__main__":
    main()
