#!/usr/bin/env python
"""A/B TPU compiler options on the scoring step (chained timing).

Found the first positive scoring lever since round 1 (docs/PERF.md
"Compiler options"): capping scoped VMEM at 32 MiB gives +1.5%
(2026-08-19, v5e, b128 bf16). The adopted default lives in
engine/jit_options.py; this tool re-measures any option set:

  python tools/analysis/compiler_flags_ab.py baseline
  python tools/analysis/compiler_flags_ab.py vmem32m
  python tools/analysis/compiler_flags_ab.py '{"xla_tpu_foo": "1"}'

Timing matches bench.py timed_scoring: iterations chained through a
runtime-zero data dependency so the axon relay's async journal cannot
under-report, one scalar fetch at the end.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

PRESETS = {
    "baseline": None,
    "vmem16m": {"xla_tpu_scoped_vmem_limit_kib": "16384"},
    "vmem24m": {"xla_tpu_scoped_vmem_limit_kib": "24576"},
    "vmem28m": {"xla_tpu_scoped_vmem_limit_kib": "28672"},
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem36m": {"xla_tpu_scoped_vmem_limit_kib": "36864"},
    "vmem40m": {"xla_tpu_scoped_vmem_limit_kib": "40960"},
    "vmem48m": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "vmem128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", help="preset name or a JSON options dict")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--family", default="retinanet",
                    choices=["retinanet", "ssd"],
                    help="which live family's scoring step to time "
                         "(the SSD step never had its own vmem sweep)")
    ap.add_argument("--program", default="score", choices=["score", "train"],
                    help="A/B the scoring step or the fused train step "
                         "(per-program options: the 32 MiB scoring win "
                         "REGRESSED train by 0.8-4.8%%, docs/PERF.md)")
    ap.add_argument("--train-batch", type=int, default=8)
    args = ap.parse_args()

    opts = (PRESETS[args.which] if args.which in PRESETS
            else json.loads(args.which))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    # neutralize the adopted default so `baseline` really is default
    os.environ["AOD_SCOPED_VMEM_KIB"] = "0"
    if opts is not None:
        jax.jit = functools.partial(jax.jit, compiler_options=opts)

    from aod_meh_hua_tpu.engine import EvalBatch, make_score_step

    if args.family == "ssd":
        from aod_meh_hua_tpu.models import init_ssd
        from aod_meh_hua_tpu.utils.config import SSDConfig

        cfg = SSDConfig(compute_dtype=args.dtype)
        model, variables = init_ssd(cfg, jax.random.PRNGKey(0))
    else:
        from aod_meh_hua_tpu.models import init_retinanet
        from aod_meh_hua_tpu.utils.config import RetinaNetConfig

        cfg = RetinaNetConfig(compute_dtype=args.dtype)
        model, variables = init_retinanet(cfg, jax.random.PRNGKey(0))

    if args.program == "train":
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
        from bench import bench_train

        res = bench_train(model, variables, cfg, args.train_batch, args.iters)
        print(json.dumps({"which": args.which, "family": args.family,
                          "program": "train", "options": opts,
                          "img_s": res["value"], "batch": res["batch"]}))
        return

    step = make_score_step(model, cfg)
    h, w = cfg.canvas
    b = args.batch
    rng = np.random.RandomState(0)
    batch = EvalBatch(
        jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 0.2),
        jnp.asarray(np.tile([[h, w]], (b, 1)).astype(np.int32)),
        jnp.asarray(np.ones((b, 4), np.float32)),
        jnp.ones(b, dtype=bool),
    )

    def chained(n):
        bt = batch
        base = batch.images
        u = mc = None
        for _ in range(n):
            u, mc = step(variables, bt)
            dep = jnp.where(jnp.isnan(u.sum()), 1.0, 0.0)
            bt = bt._replace(images=base + dep)
        return float(np.asarray(u.sum()) + np.asarray(mc.sum()))

    chained(3)  # compile + warm
    t0 = time.perf_counter()
    chained(args.iters)
    dt = time.perf_counter() - t0
    print(json.dumps({"which": args.which, "family": args.family,
                      "options": opts,
                      "img_s": round(b * args.iters / dt, 2)}))


if __name__ == "__main__":
    main()
