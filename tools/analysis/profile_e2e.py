#!/usr/bin/env python
"""Attribute the decode-inclusive (e2e) sweep's time to its phases.

bench.py's warm e2e figure has sat ~10x below the component-wise
ceiling (score step ~330 img/s, H2D ~1.6 GB/s, warm canvases in page
cache) with no measurement saying WHICH phase eats the gap. This tool
times each phase of the exact production path (EvalLoader + canvas
cache + score_pool's dispatch/fetch structure) in isolation on the
same pool bench.py sweeps:

  A  loader-only      iterate EvalLoader (warm cache), drop batches
  B  device-only      chained score steps on one resident batch
  C  dispatch-cycle   per-batch: H2D upload + step + scalar fetch,
                      same numpy batch each time (no loader)
  D  full sweep       score_pool over the loader (bench.py's figure)

If C >> B the relay's per-dispatch argument upload (not the loader) is
the wall; if A is the minimum, the 1-core host assembly is. Run on an
idle host — every phase here is wall-clock sensitive.

  python tools/analysis/profile_e2e.py [--n 512] [--batch 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from bench import make_jpeg_pool
    from aod_meh_hua_tpu.al.uncertainty import score_pool
    from aod_meh_hua_tpu.data import EvalLoader, PipelineConfig, open_canvas_cache
    from aod_meh_hua_tpu.engine import make_score_step
    from aod_meh_hua_tpu.models import init_retinanet
    from aod_meh_hua_tpu.utils.config import RetinaNetConfig

    cfg = RetinaNetConfig(compute_dtype=args.dtype)
    model, variables = init_retinanet(cfg, jax.random.PRNGKey(0))
    pool = make_jpeg_pool(args.n)
    pipe = PipelineConfig(canvas=cfg.canvas, device_normalize=True)
    steps = {o: make_score_step(model, cfg.for_orientation(o))
             for o in ("landscape", "portrait")}
    cache = open_canvas_cache("/tmp/bench_canvas_cache", pool, pipe)
    report = {"n": args.n, "batch": args.batch}

    def loader():
        return EvalLoader(pool, np.arange(args.n), pipe,
                          batch_size=args.batch, num_workers=args.workers,
                          cache=cache)

    # warm the cache + compile both orientations (cold sweep)
    t0 = time.perf_counter()
    score_pool(model, variables, cfg, loader(), args.n, steps=steps)
    report["cold_sweep_img_s"] = round(args.n / (time.perf_counter() - t0), 2)

    # A: loader-only (warm cache), batches assembled then dropped
    t0 = time.perf_counter()
    got = 0
    first_batch = None
    for _, b, idx in loader():
        got += len(idx)
        if first_batch is None:
            first_batch = b
    report["A_loader_only_img_s"] = round(got / (time.perf_counter() - t0), 2)

    # B: device-only chained steps on one RESIDENT batch (upload once)
    import jax.numpy as jnp

    dev_batch = jax.device_put(first_batch)
    step = steps["landscape"]
    u, mc = step(variables, dev_batch)  # warm this exact shape
    float(np.asarray(u.sum()))
    iters = 8
    t0 = time.perf_counter()
    bt, base = dev_batch, dev_batch.images
    for _ in range(iters):
        u, mc = step(variables, bt)
        dep = jnp.where(jnp.isnan(u.sum()), 1.0, 0.0)
        # keep the images dtype (uint8 transport): promoting to float32
        # here would silently recompile the step inside the timed loop
        bt = bt._replace(images=base + dep.astype(base.dtype))
    float(np.asarray(u.sum()))
    report["B_device_only_img_s"] = round(
        args.batch * iters / (time.perf_counter() - t0), 2)

    # C: full dispatch cycle from HOST numpy each iteration — upload +
    # step + per-batch fetch, exactly score_pool's structure minus loader
    host_batch = jax.tree.map(np.asarray, first_batch)
    t0 = time.perf_counter()
    for _ in range(iters):
        u, mc = step(variables, host_batch)
        np.asarray(u)
        np.asarray(mc)
    report["C_dispatch_cycle_img_s"] = round(
        args.batch * iters / (time.perf_counter() - t0), 2)

    # C2: upload-only (device_put of the images buffer, synced)
    t0 = time.perf_counter()
    for _ in range(4):
        jax.block_until_ready(jax.device_put(host_batch.images))
    dt = (time.perf_counter() - t0) / 4
    report["C2_upload_only_mb_s"] = round(host_batch.images.nbytes / dt / 1e6, 1)
    report["C2_upload_only_img_s"] = round(args.batch / dt, 2)

    # D: the production sweep (bench.py's warm figure)
    t0 = time.perf_counter()
    score_pool(model, variables, cfg, loader(), args.n, steps=steps)
    report["D_full_warm_sweep_img_s"] = round(
        args.n / (time.perf_counter() - t0), 2)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
