"""AL experiment driver for MEH-SSD300 on PASCAL VOC.

Mirrors the reference CLI (reference tools/train_SSD.py): same AL cycle
loop as the RetinaNet driver with the SSD schedule — batch 8,
epoch_ratio [5, 1], X_L_repeat 16, 500-iter linear warmup, 11 cycles of
1000-image acquisitions (Config_SSD.py:125-171).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train MEH-SSD300 with active learning")
    p.add_argument("--config", default=None,
                   help="reference-style config file (Config_SSD.py semantics)")
    p.add_argument("--work-dir", default="work_dirs/ssd_meh")
    p.add_argument("--voc07", default=None,
                   help="path to .../VOC2007 (default: the config's data_root)")
    p.add_argument("--voc12", default=None)
    p.add_argument("--uncertainty", default=None)
    p.add_argument("--Unc-type", dest="unc_type", default=None)
    p.add_argument("--agg", default=None)
    p.add_argument("--agg-order", default=None,
                   choices=["class_first", "scale_first"],
                   help="HUA aggregation-order ablation (ChangeOrder+"
                        "AggregateObjClassScaleUnc when scale_first)")
    p.add_argument("--cls-weight", action="store_true",
                   help="clsW: weight image scores by distinct-class count "
                        "(reference train_SSD.py:41)")
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--resume-cycle", type=int, default=-1)
    p.add_argument("--load-cycle", type=int, default=-1)
    p.add_argument("--resume-from", default=None,
                   help="mid-cycle resume from a train_state snapshot dir; "
                        "'auto' = <work-dir>/model_save")
    p.add_argument("--zero-rate", type=float, default=0.15)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--iou-thr", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=8,
                   help="GLOBAL train batch (split across --num-devices)")
    p.add_argument("--score-batch-size", type=int, default=None,
                   help="pool-scoring / eval batch size (default 64)")
    p.add_argument("--num-devices", type=int, default=None,
                   help="data-parallel over the first N jax devices")
    p.add_argument("--fsdp", type=int, default=1,
                   help="ZeRO-3 parameter-sharding degree: folds the device "
                        "mesh to (num_devices/fsdp, fsdp) = (data, fsdp) and "
                        "shards params + optimizer state over 'fsdp'")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--cycles", type=int, default=None)
    p.add_argument("--pretrained", default=None, help="mmcv vgg16_caffe .pth")
    p.add_argument("--mini", action="store_true",
                   help="smoke mode: thin VGG + 1-epoch schedule")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: init jax.distributed, train over the "
                        "global mesh, rank-shard the pool/eval sweeps "
                        "(the reference's --launcher DDP mode)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (manual launches; "
                        "auto-discovered on Cloud TPU)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--canvas-cache-dir", default="auto",
                   help="decoded-canvas cache root ('auto' = <work_dir>/"
                        "canvas_cache, 'none' = off)")
    return p.parse_args()


STR2UNC = {"SACA": "scaleAvg_classAvg", "SSCS": "scaleSum_classSum",
           "SACS": "scaleAvg_classSum", "SSCA": "scaleSum_classAvg"}


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if os.environ.get("AOD_CPU_DEVICES"):
            # virtual CPU device count; works under jax.distributed too
            # (XLA_FLAGS --xla_force_host_platform_device_count does not)
            jax.config.update("jax_num_cpu_devices",
                              int(os.environ["AOD_CPU_DEVICES"]))
    # persistent compile cache: per-cycle re-jits and reruns skip compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("AOD_JAX_CACHE", "/tmp/jaxcache"))
    from aod_meh_hua_tpu.al import ALDriver, ALPaths
    from aod_meh_hua_tpu.utils.config import ALConfig, SSDConfig, TrainConfig

    if args.config:
        from aod_meh_hua_tpu.utils.config import (
            load_reference_config, reference_data_roots,
        )

        model_cfg, train_cfg, al_cfg, ns = load_reference_config(args.config)
        assert model_cfg.family == "ssd", \
            f"{args.config} is not an SSD config (model.type dispatch)"
        if not args.voc07 and not args.voc12:
            args.voc07, args.voc12 = reference_data_roots(ns)
        model_cfg = dataclasses.replace(model_cfg, compute_dtype=args.dtype)
        train_cfg = dataclasses.replace(train_cfg, seed=args.seed,
                                        batch_size=args.batch_size)
        al_cfg = dataclasses.replace(al_cfg, zero_rate=args.zero_rate)
    else:
        model_cfg = SSDConfig(compute_dtype=args.dtype)
        # SSD schedule (Config_SSD.py:125-171)
        train_cfg = TrainConfig(
            batch_size=args.batch_size, seed=args.seed,
            outer_epoch=2, epoch_ratio=(5, 1), lr_step_epoch=1,
            warmup_iters=500, warmup_ratio=1e-3,
        )
        al_cfg = ALConfig(
            cycles=tuple(range(11)), x_l_0_size=1000, x_s_size=1000,
            x_l_repeat=16, x_u_repeat=16, zero_rate=args.zero_rate,
        )
    if not args.voc07:
        raise SystemExit("--voc07 is required (no data_root in the config)")

    if args.mini:
        model_cfg = dataclasses.replace(model_cfg, width_mult=0.125, max_gt=8)
        train_cfg = dataclasses.replace(train_cfg, outer_epoch=1, epoch_ratio=(1,),
                                        warmup_iters=0)
        al_cfg = dataclasses.replace(al_cfg, cycles=(0, 1), x_l_0_size=4,
                                     x_s_size=2, x_l_repeat=1, score_batch_size=8)

    hua = model_cfg.hua
    if args.uncertainty:
        hua = dataclasses.replace(hua, pool=args.uncertainty)
    if args.unc_type:
        hua = dataclasses.replace(hua, agg=STR2UNC[args.unc_type])
    if args.agg:
        hua = dataclasses.replace(hua, agg=args.agg)
    if args.agg_order:
        hua = dataclasses.replace(hua, agg_order=args.agg_order)
    if args.cls_weight:
        hua = dataclasses.replace(hua, cls_weight=True)
    hua = dataclasses.replace(hua, obj_score_thr=args.score_thr, memb_iou_thr=args.iou_thr)
    model_cfg = dataclasses.replace(model_cfg, hua=hua)
    if args.cycles:
        al_cfg = dataclasses.replace(al_cfg, cycles=tuple(range(args.cycles)))
    if args.score_batch_size:
        al_cfg = dataclasses.replace(al_cfg, score_batch_size=args.score_batch_size)

    np.random.seed(args.seed)
    paths = ALPaths(voc07=args.voc07, voc12=args.voc12, work_dir=args.work_dir)
    driver = ALDriver(model_cfg, train_cfg, al_cfg, paths,
                      validate=not args.no_validate, name="ssd_meh",
                      num_devices=args.num_devices,
                      cache_dir=None if args.canvas_cache_dir == "none" else args.canvas_cache_dir,
                      distributed=args.distributed, coordinator=args.coordinator,
                      num_processes=args.num_processes, process_id=args.process_id,
                      fsdp=args.fsdp)
    if args.pretrained:
        from aod_meh_hua_tpu.models.pretrained import load_torch_state_dict
        from aod_meh_hua_tpu.models.vgg import convert_mmcv_vgg16

        def loader(variables):
            import jax.numpy as jnp

            sd = load_torch_state_dict(args.pretrained)
            params = convert_mmcv_vgg16(sd)
            new_vars = dict(variables)
            new_params = dict(new_vars["params"])
            new_params["backbone"] = {
                k: {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in params.items()
            }
            new_vars["params"] = new_params
            return new_vars

        driver.pretrained_loader = loader
    resume_from = args.resume_from
    if resume_from == "auto":
        resume_from = paths.save_dir
    driver.run(resume_cycle=args.resume_cycle, load_cycle=args.load_cycle,
               resume_from=resume_from)


if __name__ == "__main__":
    main()
