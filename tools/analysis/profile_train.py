"""Stage-level timing of the TRAIN step: assign / forward / +loss /
+backward / +optimizer, plus the MEH-branch cost and an XLA-FLOPs MFU
figure — the scoring path's roofline treatment (profile_score.py)
applied to the program that dominates real cycle wall-time.

Reference hot loop: Epoch_Based_Runner_Lambda.py:20-38 (two backwards +
two SGD steps per iter); here one fused jitted step (engine/train.py).

  python tools/analysis/profile_train.py [--batch 8] [--dtype bfloat16]
  python tools/analysis/profile_train.py --family ssd
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def timed_dep(fn, args_fn, iters, warmup=2):
    """Chained timing via a runtime-zero dependency (see
    profile_score.timed): defeats the relay's async journal."""
    import jax
    import jax.numpy as jnp

    def scalarize(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

    def run(n):
        dep = jnp.zeros(())
        s = None
        for _ in range(n):
            out = fn(*args_fn(dep))
            s = scalarize(out)
            dep = jnp.where(jnp.isnan(s), 1.0, 0.0)
        return float(np.asarray(s))

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return (time.perf_counter() - t0) / iters


def timed_state_chain(step, state, batch, iters, warmup=2):
    """The train step chains naturally: state_{k+1} = step(state_k)."""
    import jax

    for _ in range(warmup):
        state, aux = step(state, batch)
    float(np.asarray(aux["loss"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step(state, batch)
    loss = float(np.asarray(aux["loss"]))
    assert np.isfinite(loss)
    return (time.perf_counter() - t0) / iters


def synth_batch(cfg, b, rng):
    import jax.numpy as jnp

    from aod_meh_hua_tpu.engine.batch import Batch

    h, w = cfg.canvas
    g = 8
    x1 = rng.uniform(0, w * 0.7, (b, g)).astype(np.float32)
    y1 = rng.uniform(0, h * 0.7, (b, g)).astype(np.float32)
    boxes = np.stack([x1, y1,
                      x1 + rng.uniform(16, w * 0.3, (b, g)).astype(np.float32),
                      y1 + rng.uniform(16, h * 0.3, (b, g)).astype(np.float32)],
                     axis=-1)
    n_anchors = cfg.level_bounds()[-1][1]
    return Batch(
        jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 0.2),
        jnp.asarray(boxes),
        jnp.asarray(rng.randint(0, cfg.num_classes, (b, g)).astype(np.int32)),
        jnp.ones((b, g), bool),
        jnp.ones((b, n_anchors), bool),
        jnp.asarray(np.tile([[h, w]], (b, 1)).astype(np.int32)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--family", default="retinanet",
                    choices=["retinanet", "ssd"])
    ap.add_argument("--mini", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak (v5e bf16 = 197, fp32 ~ 49)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("AOD_JAX_CACHE", "/tmp/jaxcache"))

    from aod_meh_hua_tpu.engine.train import (
        create_train_state, make_loss_fn, make_train_step)
    from aod_meh_hua_tpu.utils.config import (
        RetinaNetConfig, SSDConfig, TrainConfig, tiny_test_config)

    if args.family == "ssd":
        cfg = SSDConfig(compute_dtype=args.dtype)
        from aod_meh_hua_tpu.models import init_ssd as init
        tcfg = TrainConfig(batch_size=args.batch, lr=1e-3)
        frozen = 0
    else:
        cfg = tiny_test_config(compute_dtype=args.dtype) if args.mini \
            else RetinaNetConfig(compute_dtype=args.dtype)
        from aod_meh_hua_tpu.models import init_retinanet as init
        tcfg = TrainConfig(batch_size=args.batch, lr=1e-3)
        frozen = getattr(cfg, "frozen_stages", 0)

    model, variables = init(cfg, jax.random.PRNGKey(0))
    state, tx = create_train_state(model, variables, tcfg,
                                   frozen_stages=frozen)
    rng = np.random.RandomState(0)
    batch = synth_batch(cfg, args.batch, rng)

    loss_fn, anchors_host = make_loss_fn(model, cfg)
    anchors = jax.device_put(jnp.asarray(anchors_host))
    step = make_train_step(model, cfg, tx)

    from aod_meh_hua_tpu.engine.batch import prepare_images
    from aod_meh_hua_tpu.engine.train import _make_targets_fn

    # stage programs ------------------------------------------------
    targets_fn = jax.jit(
        lambda a, b_: _make_targets_fn(cfg)(
            a, b_.anchor_valid, b_.gt_boxes, b_.gt_labels, b_.gt_valid))
    fwd = jax.jit(lambda v, x: model.apply(
        v, prepare_images(x, batch.img_shapes, cfg)))
    loss_only = jax.jit(
        lambda p, bs, b_, a: loss_fn(p, bs, b_, a)[0])
    grad = jax.jit(jax.value_and_grad(
        lambda p, bs, b_, a: loss_fn(p, bs, b_, a)[0]))

    stages = {}
    stages["assign(targets)"] = timed_dep(
        targets_fn, lambda d: (anchors + d, batch), args.iters)
    stages["forward"] = timed_dep(
        fwd, lambda d: ({"params": state.params,
                         "batch_stats": state.batch_stats},
                        batch.images + d), args.iters)
    stages["forward+loss"] = timed_dep(
        loss_only, lambda d: (state.params, state.batch_stats,
                              batch._replace(images=batch.images + d),
                              anchors), args.iters)
    stages["forward+loss+backward"] = timed_dep(
        grad, lambda d: (state.params, state.batch_stats,
                         batch._replace(images=batch.images + d),
                         anchors), args.iters)
    stages["full step(+optimizer)"] = timed_state_chain(
        step, state, batch, args.iters)

    # MEH-branch cost: same family with the lambda branch off ---------
    meh_delta_ms = None
    if args.family == "retinanet" and getattr(cfg, "use_meh", True):
        from dataclasses import replace

        cfg_nm = replace(cfg, use_meh=False)
        model_nm, variables_nm = init(cfg_nm, jax.random.PRNGKey(0))
        loss_nm, _ = make_loss_fn(model_nm, cfg_nm)
        grad_nm = jax.jit(jax.value_and_grad(
            lambda p, bs, b_, a: loss_nm(p, bs, b_, a)[0]))
        p_nm, bs_nm = variables_nm["params"], variables_nm.get("batch_stats", {})
        t_nm = timed_dep(
            grad_nm, lambda d: (p_nm, bs_nm,
                                batch._replace(images=batch.images + d),
                                anchors), args.iters)
        meh_delta_ms = (stages["forward+loss+backward"] - t_nm) * 1e3

    # FLOPs / MFU of the full train step ------------------------------
    def raw_step(st, b_, a):
        grads_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grads_fn(st.params, st.batch_stats, b_, a)
        import optax as _ox

        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        params = _ox.apply_updates(st.params, updates)
        return st._replace(step=st.step + 1, params=params,
                           opt_state=opt_state), aux

    lowered = jax.jit(raw_step).lower(state, batch, anchors)
    cost = lowered.compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    out = {"family": args.family, "batch": args.batch, "dtype": args.dtype,
           "canvas": list(cfg.canvas) if args.family != "ssd"
           else [cfg.input_size, cfg.input_size]}
    prev = 0.0
    for k, v in stages.items():
        out[k] = {"ms": round(v * 1e3, 2),
                  "img_s": round(args.batch / v, 1),
                  "delta_ms": round((v - prev) * 1e3, 2)}
        prev = v
    if meh_delta_ms is not None:
        out["meh_branch_delta_ms"] = round(meh_delta_ms, 2)
    if flops:
        t_full = stages["full step(+optimizer)"]
        achieved = flops / t_full / 1e12
        out["step_flops_G"] = round(flops / 1e9, 1)
        out["achieved_tflops"] = round(achieved, 2)
        out["mfu_pct"] = round(100 * achieved / args.peak_tflops, 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
