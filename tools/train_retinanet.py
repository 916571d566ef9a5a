"""AL experiment driver for MEH-RetinaNet on PASCAL VOC.

Mirrors the reference CLI (reference tools/train_RetinaNet.py:49-74):
--config accepts the reference's plain-python config files
(e.g. configs/_base_/Config_RetinaNet.py semantics), plus --work-dir,
--Unc-type (SACA/SSCS/SACS/SSCA shorthand), --no-validate, cycle
resume/load flags, and the zeroRate/score_thr/iou_thr knobs the
reference exposes as module globals (:37-43).

TPU additions: --voc07/--voc12 data roots (the reference hardcodes
data_root in the config), --dtype bfloat16, --batch-size.
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train MEH-RetinaNet with active learning")
    p.add_argument("--config", default=None, help="reference-style config file")
    p.add_argument("--work-dir", default="work_dirs/retinanet_meh")
    p.add_argument("--voc07", default=None,
                   help="path to .../VOC2007 (default: the config's data_root)")
    p.add_argument("--voc12", default=None, help="path to .../VOC2012")
    p.add_argument("--uncertainty", default=None,
                   help="pool: Random | Entropy_ALL | Entropy_NMS | Entropy_NoNMS")
    p.add_argument("--Unc-type", dest="unc_type", default=None,
                   help="SACA | SSCS | SACS | SSCA (2-level agg shorthand)")
    p.add_argument("--agg", default=None, help="full HUA agg spec, e.g. objectSum_scaleMax_classSum")
    p.add_argument("--agg-order", default=None,
                   choices=["class_first", "scale_first"],
                   help="HUA aggregation-order ablation: scale_first = the "
                        "reference's ChangeOrder+AggregateObjClassScaleUnc")
    p.add_argument("--cls-weight", action="store_true",
                   help="clsW: weight image scores by distinct-class count "
                        "(reference train_RetinaNet.py:38)")
    p.add_argument("--baseline", default=None, choices=["ensemble"],
                   help="replace HUA scoring with a baseline: 'ensemble' "
                        "trains N seeds per cycle and scores with the "
                        "deep-ensemble sigmoid MI (CalEnsembleUnc.py:86-181)")
    p.add_argument("--ensemble-size", type=int, default=3,
                   help="members for --baseline ensemble (reference uses 3)")
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--resume-cycle", type=int, default=-1)
    p.add_argument("--load-cycle", type=int, default=-1)
    p.add_argument("--resume-from", default=None,
                   help="mid-cycle resume from a train_state snapshot dir "
                        "(the reference's cfg.resume_from); pass 'auto' to "
                        "use <work-dir>/model_save")
    p.add_argument("--ckpt-interval", type=int, default=None,
                   help="train-state snapshot every N inner epochs (0=off)")
    p.add_argument("--zero-rate", type=float, default=0.15)
    p.add_argument("--score-thr", type=float, default=0.3, help="HUA object score threshold")
    p.add_argument("--iou-thr", type=float, default=0.5, help="HUA membership IoU threshold")
    p.add_argument("--seed", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=None,
                   help="GLOBAL train batch (split across --num-devices)")
    p.add_argument("--score-batch-size", type=int, default=None,
                   help="pool-scoring / eval batch size (default 64)")
    p.add_argument("--fsdp", type=int, default=1,
                   help="ZeRO-3 parameter-sharding degree: folds the device "
                        "mesh to (num_devices/fsdp, fsdp) = (data, fsdp) and "
                        "shards params + optimizer state over 'fsdp'")
    p.add_argument("--num-devices", type=int, default=None,
                   help="data-parallel over the first N jax devices "
                        "(the reference's DDP mode, train.py:75-85)")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--int8-scoring", action="store_true",
                   help="pool-scoring backbone in dynamic-int8 PTQ "
                        "(2x bf16 MXU peak on v5e; parity-gated)")
    p.add_argument("--cycles", type=int, default=None, help="override number of AL cycles")
    p.add_argument("--pretrained", default=None,
                   help="torchvision resnet50 weights (.pth) for backbone init")
    p.add_argument("--mini", action="store_true",
                   help="smoke-test mode: shrunken model/canvas + 1-epoch "
                        "schedule (the reference's ismini flag, "
                        "tools/train_RetinaNet.py:32)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
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
                   help="decoded-canvas cache root shared across runs "
                        "('auto' = <work_dir>/canvas_cache, 'none' = off)")
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
    from aod_meh_hua_tpu.utils.config import (
        ALConfig, RetinaNetConfig, TrainConfig, load_reference_config,
        tiny_test_config,
    )

    if args.config:
        from aod_meh_hua_tpu.utils.config import reference_data_roots

        model_cfg, train_cfg, al_cfg, ns = load_reference_config(args.config)
        if not args.voc07 and not args.voc12:
            # all-or-nothing: an explicit --voc07 must not pick up the
            # config's (likely machine-specific) VOC2012 data_root
            args.voc07, args.voc12 = reference_data_roots(ns)
    else:
        model_cfg, train_cfg, al_cfg = RetinaNetConfig(), TrainConfig(), ALConfig()
    if not args.voc07:
        raise SystemExit("--voc07 is required (no data_root in the config)")
    pipeline = None
    if args.mini:
        from aod_meh_hua_tpu.data import PipelineConfig

        model_cfg = tiny_test_config()
        train_cfg = dataclasses.replace(train_cfg, outer_epoch=1, epoch_ratio=(1,))
        al_cfg = dataclasses.replace(al_cfg, cycles=(0, 1), x_l_0_size=4,
                                     x_s_size=2, x_l_repeat=1, score_batch_size=8)
        pipeline = PipelineConfig(img_scale=(250, 120), canvas=model_cfg.canvas,
                                  device_normalize=True)

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
    model_cfg = dataclasses.replace(model_cfg, hua=hua, compute_dtype=args.dtype)
    train_cfg = dataclasses.replace(
        train_cfg, seed=args.seed,
        **({"batch_size": args.batch_size} if args.batch_size else {}),
        **({"ckpt_interval": args.ckpt_interval} if args.ckpt_interval is not None else {}),
    )
    al_cfg = dataclasses.replace(
        al_cfg, zero_rate=args.zero_rate, int8_scoring=args.int8_scoring,
        **({"cycles": tuple(range(args.cycles))} if args.cycles else {}),
        **({"score_batch_size": args.score_batch_size} if args.score_batch_size else {}),
    )

    np.random.seed(args.seed)
    paths = ALPaths(voc07=args.voc07, voc12=args.voc12, work_dir=args.work_dir)
    driver = ALDriver(model_cfg, train_cfg, al_cfg, paths, pipeline=pipeline,
                      validate=not args.no_validate, num_devices=args.num_devices,
                      cache_dir=None if args.canvas_cache_dir == "none" else args.canvas_cache_dir,
                      distributed=args.distributed, coordinator=args.coordinator,
                      num_processes=args.num_processes, process_id=args.process_id,
                      fsdp=args.fsdp, baseline=args.baseline,
                      ensemble_size=args.ensemble_size)
    if args.pretrained:
        from aod_meh_hua_tpu.models.pretrained import attach_pretrained_backbone

        driver.pretrained_loader = lambda variables: attach_pretrained_backbone(
            variables, args.pretrained, model_cfg.block_counts
        )
    resume_from = args.resume_from
    if resume_from == "auto":
        resume_from = paths.save_dir
    driver.run(resume_cycle=args.resume_cycle, load_cycle=args.load_cycle,
               resume_from=resume_from)


if __name__ == "__main__":
    main()
