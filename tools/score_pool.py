"""Standalone pool scoring: score a VOC pool with any acquisition method.

Covers the reference's manual scorer invocations (calculate_uncertainty,
Ensemble_uncertainty, MCDropout_uncertainty — mmdet/apis/test.py:65,
CalEnsembleUnc.py:86, CalMCDropoutUnc.py:86) as one CLI: load
checkpoint(s), sweep the pool, write the uncertainty array.

  python tools/score_pool.py --voc07 ... --checkpoint c.ckpt --out unc.npy
  python tools/score_pool.py ... --method ensemble --checkpoint a.ckpt b.ckpt c.ckpt
  python tools/score_pool.py ... --method mcdropout --passes 25
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Score an unlabeled pool")
    p.add_argument("--voc07", required=True)
    p.add_argument("--voc12", default=None)
    p.add_argument("--split", default=None, help="image-id list (default trainval)")
    p.add_argument("--family", default="retinanet", choices=["retinanet", "ssd"])
    p.add_argument("--checkpoint", nargs="+", default=None,
                   help="model checkpoint(s); 3+ for ensemble")
    p.add_argument("--method", default="hua",
                   choices=["hua", "random", "ensemble", "mcdropout", "numobj"])
    p.add_argument("--uncertainty", default="Entropy_NMS",
                   help="hua pool: Entropy_NMS | Entropy_ALL | Entropy_NoNMS")
    p.add_argument("--agg", default=None)
    p.add_argument("--agg-order", default=None,
                   choices=["class_first", "scale_first"],
                   help="HUA aggregation-order ablation")
    p.add_argument("--cls-weight", action="store_true",
                   help="clsW: weight image scores by distinct-class count")
    p.add_argument("--passes", type=int, default=25, help="MC-dropout passes")
    p.add_argument("--batch-size", type=int, default=8,
                   help="GLOBAL sweep batch (split across --num-devices)")
    p.add_argument("--num-devices", type=int, default=None,
                   help="shard the pool sweep over the first N jax devices")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--int8", action="store_true",
                   help="dynamic-int8 PTQ backbone (retinanet hua only; "
                        "2x bf16 MXU peak on v5e, parity-gated)")
    p.add_argument("--out", default="uncertainty.npy")
    p.add_argument("--seed", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--canvas-cache-dir", default=None,
                   help="decoded-canvas cache root (off by default)")
    p.add_argument("--mini", action="store_true", help="tiny model (smoke mode)")
    return p.parse_args()


def main():
    import dataclasses
    import time

    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if os.environ.get("AOD_CPU_DEVICES"):
            # virtual CPU device count; works under jax.distributed too
            # (XLA_FLAGS --xla_force_host_platform_device_count does not)
            jax.config.update("jax_num_cpu_devices",
                              int(os.environ["AOD_CPU_DEVICES"]))
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("AOD_JAX_CACHE", "/tmp/jaxcache"))

    from aod_meh_hua_tpu.api import init_detector, _default_pipeline
    from aod_meh_hua_tpu.al.baselines import score_pool_ensemble, score_pool_mc_dropout
    from aod_meh_hua_tpu.al.uncertainty import score_num_objects, score_pool
    from aod_meh_hua_tpu.data import ConcatVOC, EvalLoader, PipelineConfig, VOCDataset
    from aod_meh_hua_tpu.models import build_retinanet, build_ssd
    from aod_meh_hua_tpu.utils.config import RetinaNetConfig, SSDConfig, tiny_test_config

    if args.mini:
        if args.family == "ssd":
            cfg = SSDConfig(width_mult=0.125, max_gt=8)
            pipe = None
        else:
            cfg = tiny_test_config()
            pipe = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)
    else:
        cfg = SSDConfig(compute_dtype=args.dtype) if args.family == "ssd" \
            else RetinaNetConfig(compute_dtype=args.dtype)
        pipe = None
    if args.agg:
        cfg = dataclasses.replace(cfg, hua=dataclasses.replace(cfg.hua, agg=args.agg))
    if args.agg_order:
        cfg = dataclasses.replace(
            cfg, hua=dataclasses.replace(cfg.hua, agg_order=args.agg_order))
    if args.cls_weight:
        cfg = dataclasses.replace(
            cfg, hua=dataclasses.replace(cfg.hua, cls_weight=True))
    cfg = dataclasses.replace(cfg, hua=dataclasses.replace(cfg.hua, pool=args.uncertainty))
    pipe = pipe or _default_pipeline(cfg)

    datasets = [VOCDataset(
        args.split or os.path.join(args.voc07, "ImageSets/Main/trainval.txt"), args.voc07)]
    if args.voc12:
        datasets.append(VOCDataset(
            os.path.join(args.voc12, "ImageSets/Main/trainval.txt"), args.voc12))
    pool = ConcatVOC(datasets)
    n = len(pool)
    rng = np.random.RandomState(args.seed)
    cache = None
    if args.canvas_cache_dir:
        from aod_meh_hua_tpu.data import open_canvas_cache

        cache = open_canvas_cache(args.canvas_cache_dir, pool, pipe, log=print)
    loader = EvalLoader(pool, np.arange(n), pipe, batch_size=args.batch_size,
                        cache=cache)

    ckpts = args.checkpoint or [None]
    model, variables = init_detector(cfg, checkpoint=ckpts[0], seed=args.seed)

    mesh = None
    if args.num_devices and args.num_devices > 1:
        from aod_meh_hua_tpu.parallel import make_mesh, replicate

        assert args.batch_size % args.num_devices == 0, \
            "--batch-size must divide by --num-devices"
        mesh = make_mesh(args.num_devices)
        variables = replicate(variables, mesh)

    t0 = time.time()
    if args.method == "random":
        unc = rng.permutation(n).astype(np.float64)
    elif args.method == "numobj":
        unc = score_num_objects(pool, np.arange(n))
    elif args.method == "ensemble":
        assert len(ckpts) >= 2, "ensemble needs 2+ checkpoints"
        from aod_meh_hua_tpu.engine.checkpoint import load_checkpoint

        var_list = [variables] + [load_checkpoint(c, variables) for c in ckpts[1:]]
        unc = score_pool_ensemble(model, var_list, cfg, loader, n)
    elif args.method == "mcdropout":
        mc_cfg = dataclasses.replace(cfg, mc_dropout=0.1)
        # dispatch on the config family (an SSDConfig mini is still SSD)
        mc_model = build_ssd(mc_cfg) if mc_cfg.family == "ssd" \
            else build_retinanet(mc_cfg)
        unc = score_pool_mc_dropout(mc_model, variables, mc_cfg, loader, n,
                                    jax.random.PRNGKey(args.seed), args.passes)
    else:  # hua
        score_model, score_cfg = model, cfg
        if args.int8:
            # same param tree (models/quant.py), so the loaded variables
            # feed the int8 program directly
            assert cfg.family != "ssd", "--int8 is a retinanet-backbone mode"
            score_cfg = dataclasses.replace(cfg, backbone_int8=True)
            score_model = build_retinanet(score_cfg)
        unc, _ = score_pool(score_model, variables, score_cfg, loader, n,
                            rng=rng, progress=True, mesh=mesh)
    dt = time.time() - t0

    np.save(args.out, unc)
    print(f"scored {n} images with {args.method} in {dt:.1f}s "
          f"({n / max(dt, 1e-9):.1f} img/s) -> {args.out}")
    print(f"stats: zeros={int((unc == 0).sum())} mean={unc.mean():.4f} "
          f"max={unc.max():.4f}")


if __name__ == "__main__":
    main()
