"""Stage-level timing of the scoring path: backbone / +FPN / +head /
full score step, plus an XLA-FLOPs roofline estimate.

The reference's benchmark.py measures end-to-end FPS only
(/root/reference/tools/analysis_tools/benchmark.py:51-123); this tool
breaks the jitted scoring program into cumulative stages so the hot
module is identifiable without parsing a Perfetto trace.

  python tools/analysis/profile_score.py [--batch 64] [--dtype bfloat16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def timed(fn, variables, images, iters, warmup=2):
    """Chained timing: each iteration's input depends on the previous
    output and the final scalar is FETCHED, so the relay's async journal
    (which defeats block_until_ready-based loops on this environment)
    cannot under-report. fn(variables, images) -> pytree."""
    import jax
    import jax.numpy as jnp

    def scalarize(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

    def run(n):
        x = images
        s = None
        for _ in range(n):
            out = fn(variables, x)
            s = scalarize(out)
            dep = jnp.where(jnp.isnan(s), 1.0, 0.0)  # runtime zero
            x = images + dep
        return float(np.asarray(s))

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--mini", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--s2d", action="store_true", help="space-to-depth stem")
    ap.add_argument("--sub", action="store_true",
                    help="also break the post-forward stage into "
                         "maxconf / select / NMS / MI+HUA sub-stages "
                         "(extra compiles)")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak (v5e bf16 = 197, fp32 ~ 49)")
    ap.add_argument("--family", default="retinanet",
                    choices=["retinanet", "ssd"],
                    help="ssd: forward / score-step stages + FLOPs "
                         "utilization for the MEH-SSD300 scoring program")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("AOD_JAX_CACHE", "/tmp/jaxcache"))

    from aod_meh_hua_tpu.engine import EvalBatch, make_score_step

    if args.family == "ssd":
        from aod_meh_hua_tpu.models import init_ssd
        from aod_meh_hua_tpu.utils.config import SSDConfig

        cfg = SSDConfig(compute_dtype=args.dtype)
        if args.mini:
            cfg = SSDConfig(compute_dtype=args.dtype, width_mult=0.125,
                            max_gt=8)
        model, variables = init_ssd(cfg, jax.random.PRNGKey(0))
    else:
        from aod_meh_hua_tpu.models import init_retinanet
        from aod_meh_hua_tpu.utils.config import (RetinaNetConfig,
                                                  tiny_test_config)

        cfg = tiny_test_config(compute_dtype=args.dtype) if args.mini \
            else RetinaNetConfig(compute_dtype=args.dtype)
        if args.s2d:
            from dataclasses import replace as _rep

            cfg = _rep(cfg, stem_s2d=True)
        model, variables = init_retinanet(cfg, jax.random.PRNGKey(0))
    h, w = cfg.canvas
    b = args.batch
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 0.2)
    shp = (h, w) if (args.mini or args.family == "ssd") else (600, 1000)
    batch = EvalBatch(images, jnp.asarray(np.tile([list(shp)], (b, 1)).astype(np.int32)),
                      jnp.asarray(np.full((b, 4), 1.0, np.float32)),
                      jnp.ones(b, dtype=bool))

    fwd = jax.jit(lambda v, x: model.apply(v, x))
    score = make_score_step(model, cfg)

    stages = {}
    if args.family == "retinanet":
        backbone = jax.jit(lambda v, x: model.apply(
            v, x, method=lambda m, xx: m.backbone(xx)))
        feats = jax.jit(lambda v, x: model.apply(v, x, method=MEH_features))
        stages["backbone"] = timed(backbone, variables, images, args.iters)
        stages["backbone+fpn"] = timed(feats, variables, images, args.iters)
    stages["forward(all heads)"] = timed(fwd, variables, images, args.iters)
    if args.sub:
        import functools

        import jax.numpy as jnp

        from aod_meh_hua_tpu.engine.postprocess import make_candidate_selector
        from aod_meh_hua_tpu.ops.nms import batched_multiclass_nms
        from aod_meh_hua_tpu.ops.hua import object_membership

        select, anchors_host = make_candidate_selector(cfg)
        anchors_dev = jax.device_put(anchors_host)
        t = cfg.test
        shapes = batch.img_shapes

        def to_maxconf(v, x):
            cls_scores, *_ = model.apply(v, x)
            p = jax.nn.softmax(cls_scores, axis=-1)
            return p.reshape(p.shape[0], -1).max(axis=-1)

        def to_select(v, x):
            cls_scores, bbox_preds, lambdas = model.apply(v, x)
            cand = select(anchors_dev, cls_scores, bbox_preds, lambdas, shapes)
            return cand.scores, cand.boxes, cand.lambdas

        def to_nms(v, x):
            s, b_, l_ = to_select(v, x)
            dets = batched_multiclass_nms(
                b_, s[..., : cfg.num_fg_classes], t.score_thr, t.nms_iou_thr,
                t.max_per_img, t.pre_nms_cands)
            return dets.boxes, dets.scores

        def to_member(v, x):
            s, b_, l_ = to_select(v, x)
            dets = batched_multiclass_nms(
                b_, s[..., : cfg.num_fg_classes], t.score_thr, t.nms_iou_thr,
                t.max_per_img, t.pre_nms_cands)
            member = jax.vmap(functools.partial(
                object_membership, score_thr=cfg.hua.obj_score_thr,
                iou_thr=cfg.hua.memb_iou_thr))(b_, dets.boxes, dets.scores,
                                               dets.valid)
            return member.sum()

        stages["forward+maxconf"] = timed(jax.jit(to_maxconf), variables,
                                          images, args.iters)
        stages["forward+select"] = timed(jax.jit(to_select), variables,
                                         images, args.iters)
        stages["forward+select+nms"] = timed(jax.jit(to_nms), variables,
                                             images, args.iters)
        stages["forward+...+membership"] = timed(jax.jit(to_member), variables,
                                                 images, args.iters)
    stages["score step(full)"] = timed(
        lambda v, x: score(v, batch._replace(images=x)), variables, images,
        args.iters)

    # FLOPs roofline from XLA cost analysis of the full forward
    lowered = jax.jit(lambda v, x: model.apply(v, x)).lower(variables, images)
    cost = lowered.compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    out = {"batch": b, "dtype": args.dtype, "canvas": [h, w]}
    prev = 0.0
    for k, v in stages.items():
        out[k] = {"ms": round(v * 1e3, 2), "img_s": round(b / v, 1),
                  "delta_ms": round((v - prev) * 1e3, 2)}
        prev = v
    if flops:
        t_fwd = stages["forward(all heads)"]
        achieved = flops / t_fwd / 1e12
        out["forward_flops_G"] = round(flops / 1e9, 1)
        out["achieved_tflops"] = round(achieved, 2)
        out["pct_of_peak"] = round(100 * achieved / args.peak_tflops, 1)
    print(json.dumps(out, indent=2))


def MEH_features(m, x):
    return m.features(x)


if __name__ == "__main__":
    main()
