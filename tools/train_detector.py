#!/usr/bin/env python
"""Generic (non-AL) detector training CLI — the upstream-mmdet
`tools/train.py` equivalent for the zoo families beyond the two AL
drivers: faster_rcnn, fcos, atss (retinanet/ssd train through their AL
CLIs, tools/train_retinanet.py / train_ssd.py).

Behavioral parity target (reference, /root/reference):
* the fork's registered upstream families are trained by mmdet's
  EpochBasedRunner over a VOC/COCO config (mmcv runner machinery); here
  that collapses to one jitted family train step + a host epoch loop
  with per-epoch VOC mAP eval and step-decayed SGD.

Usage:
  python tools/train_detector.py --family faster_rcnn \
      --voc07 /data/VOCdevkit/VOC2007 [--voc12 ...] --work-dir work
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _zoo_families():
    from aod_meh_hua_tpu.utils.config import ZOO_FAMILIES

    return ZOO_FAMILIES


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default=None,
                    choices=sorted(_zoo_families()))
    ap.add_argument("--reference-config", default=None,
                    help="path to an upstream reference zoo config file "
                         "(mmcv _base_-inheriting python, e.g. "
                         "configs/atss/atss_r50_fpn_1x_coco.py): resolves "
                         "the family and honors num_classes/geometry/"
                         "test_cfg/optimizer/schedule; explicit flags "
                         "override; --mini keeps the tiny smoke geometry")
    ap.add_argument("--voc07", default=None, help="VOC2007 root")
    ap.add_argument("--voc12", default=None, help="optional VOC2012 root")
    ap.add_argument("--coco-train", default=None,
                    help="COCO-format instances JSON for training "
                         "(mutually exclusive with --voc07)")
    ap.add_argument("--coco-val", default=None,
                    help="COCO-format instances JSON for eval (COCO-style "
                         "101-point mAP @ IoU .50:.95)")
    ap.add_argument("--coco-img-prefix", default=None,
                    help="image root for --coco-train (default: its dir)")
    ap.add_argument("--coco-img-prefix-val", default=None,
                    help="image root for --coco-val (default: --coco-img-prefix)")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--lr-steps", type=int, nargs="*", default=[8, 11],
                    help="epochs at which lr drops x0.1 (1x schedule)")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=ap_lr_default(),
                    help="reference per-GPU lr for batch 2 (detr: 1e-4 AdamW)")
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--weight-decay", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=20)
    ap.add_argument("--eval-interval", type=int, default=1)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--mini", action="store_true", help="tiny model smoke mode")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-validate", action="store_true")
    ap.add_argument("--num-devices", type=int, default=None,
                    help="data-parallel over a 'data' mesh (params "
                         "replicated, GLOBAL batch sharded) — the "
                         "reference's DDP mode for its upstream families")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: init jax.distributed; the train mesh "
                         "spans every process's devices and eval is "
                         "rank-sharded with a cross-process gather")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--proposal-file", default=None,
                    help="fast_rcnn: .npz of per-image [P, 5] proposals "
                         "keyed by dataset index, ORIGINAL image coords "
                         "(the reference's data.train.proposal_file .pkls; "
                         "write one with tools/gen_proposals.py)")
    ap.add_argument("--proposal-file-val", default=None,
                    help="fast_rcnn: proposals for the VAL split "
                         "(data.test.proposal_file); defaults to "
                         "--proposal-file")
    ap.add_argument("--oversample-thr", type=float, default=None,
                    help="ClassBalancedDataset repeat-factor threshold "
                         "(reference dataset_wrappers.py; LVIS configs "
                         "use 1e-3)")
    ap.add_argument("--dataset-type", default="coco",
                    choices=["coco", "lvis"],
                    help="JSON flavor for --coco-train/--coco-val: plain "
                         "COCO or LVIS v1 (coco_url names, federated eval)")
    ap.add_argument("--instaboost", action="store_true",
                    help="InstaBoost copy-paste augmentation with the "
                         "reference configs' settings (data/instaboost.py; "
                         "needs a mask-bearing dataset, like the reference's "
                         "configs/instaboost/ COCO mask families)")
    ap.add_argument("--albu", action="store_true",
                    help="the albu_example transform chain "
                         "(data/albu.py ALBU_EXAMPLE_TRANSFORMS)")
    ap.add_argument("--teacher-ckpt", default=None,
                    help="ld: GFL teacher checkpoint (the reference's "
                         "teacher_ckpt, kd_one_stage.py); defaults to a "
                         "fresh teacher init (smoke mode)")
    return ap.parse_args()


def ap_lr_default():
    return 0.0025


def build(family, mini, dtype):
    full_cls, tiny_fn = _zoo_families()[family]
    return (tiny_fn(compute_dtype=dtype) if mini
            else full_cls(compute_dtype=dtype))


def make_steps(family, model, cfg, tx, teacher_ckpt=None):
    """Uniform step(state, batch, key) signature across families."""
    if family in ("faster_rcnn", "libra_rcnn", "pafpn", "carafe", "hrnet",
                  "resnest", "groie", "empirical_attention", "fpg", "gn_ws"):
        from aod_meh_hua_tpu.engine.two_stage import make_faster_rcnn_train_step

        return make_faster_rcnn_train_step(model, cfg, tx)
    if family == "dynamic_rcnn":
        from aod_meh_hua_tpu.engine.two_stage import \
            make_dynamic_rcnn_train_step

        return make_dynamic_rcnn_train_step(model, cfg, tx)
    if family == "double_head_rcnn":
        from aod_meh_hua_tpu.engine.two_stage import \
            make_double_head_train_step

        return make_double_head_train_step(model, cfg, tx)
    if family == "mask_rcnn":
        from aod_meh_hua_tpu.engine.mask_rcnn import make_mask_rcnn_train_step

        return make_mask_rcnn_train_step(model, cfg, tx)
    if family == "seesaw":
        from aod_meh_hua_tpu.engine.seesaw import make_seesaw_train_step

        return make_seesaw_train_step(model, cfg, tx)
    if family == "point_rend":
        from aod_meh_hua_tpu.engine.point_rend import \
            make_point_rend_train_step

        return make_point_rend_train_step(model, cfg, tx)
    if family == "mask_scoring_rcnn":
        from aod_meh_hua_tpu.engine.mask_scoring_rcnn import \
            make_ms_rcnn_train_step

        return make_ms_rcnn_train_step(model, cfg, tx)
    if family == "rpn":
        from aod_meh_hua_tpu.engine.rpn_only import make_rpn_train_step

        return make_rpn_train_step(model, cfg, tx)
    if family == "cascade_rpn":
        from aod_meh_hua_tpu.engine.cascade_rpn import make_crpn_train_step

        return make_crpn_train_step(model, cfg, tx)
    if family == "tridentnet":
        from aod_meh_hua_tpu.engine.trident import make_trident_train_step

        return make_trident_train_step(model, cfg, tx)
    if family == "fast_rcnn":
        from aod_meh_hua_tpu.engine.rpn_only import make_fast_rcnn_train_step

        return make_fast_rcnn_train_step(model, cfg, tx)
    if family in ("cascade_rcnn", "detectors"):
        from aod_meh_hua_tpu.engine.two_stage import make_cascade_train_step

        return make_cascade_train_step(model, cfg, tx)
    if family == "guided_anchor":
        from aod_meh_hua_tpu.engine.guided_anchor import make_ga_train_step

        return make_ga_train_step(model, cfg, tx)
    if family == "pisa_faster_rcnn":
        from aod_meh_hua_tpu.engine.pisa import make_pisa_rcnn_train_step

        return make_pisa_rcnn_train_step(model, cfg, tx)
    if family == "grid_rcnn":
        from aod_meh_hua_tpu.engine.grid_rcnn import make_grid_rcnn_train_step

        return make_grid_rcnn_train_step(model, cfg, tx)
    if family == "htc":
        from aod_meh_hua_tpu.engine.htc import make_htc_train_step

        return make_htc_train_step(model, cfg, tx)
    if family == "scnet":
        from aod_meh_hua_tpu.engine.scnet import make_scnet_train_step

        return make_scnet_train_step(model, cfg, tx)
    if family == "ld":
        from aod_meh_hua_tpu.api import init_detector, load_checkpoint
        from aod_meh_hua_tpu.engine.ld import make_ld_train_step

        tcfg = cfg.teacher_config()
        teacher_model, teacher_vars = init_detector(tcfg, seed=1)
        if teacher_ckpt:
            teacher_vars = load_checkpoint(teacher_ckpt, teacher_vars)
        return make_ld_train_step(model, cfg, tx, teacher_model, tcfg,
                                  teacher_vars)
    if family == "yolact":
        from aod_meh_hua_tpu.engine.yolact import make_yolact_train_step

        inner = make_yolact_train_step(model, cfg, tx)
        return lambda state, batch, key: inner(state, batch)
    if family == "detr":
        from aod_meh_hua_tpu.engine.detr import make_detr_train_step

        return make_detr_train_step(model, cfg, tx)
    if family == "deformable_detr":
        from aod_meh_hua_tpu.engine.deformable_detr import \
            make_deformable_detr_train_step

        return make_deformable_detr_train_step(model, cfg, tx)
    if family == "sparse_rcnn":
        from aod_meh_hua_tpu.engine.sparse_rcnn import make_sparse_rcnn_train_step

        return make_sparse_rcnn_train_step(model, cfg, tx)
    if family == "yolov3":
        from aod_meh_hua_tpu.engine.yolo import make_yolo_train_step

        inner = make_yolo_train_step(model, cfg, tx)
    elif family == "cornernet":
        from aod_meh_hua_tpu.engine.cornernet import make_cornernet_train_step

        inner = make_cornernet_train_step(model, cfg, tx)
    elif family == "centripetalnet":
        from aod_meh_hua_tpu.engine.centripetal import \
            make_centripetal_train_step

        inner = make_centripetal_train_step(model, cfg, tx)
    elif family == "reppoints":
        from aod_meh_hua_tpu.engine.reppoints import make_reppoints_train_step

        inner = make_reppoints_train_step(model, cfg, tx)
    elif family == "centernet":
        from aod_meh_hua_tpu.engine.centernet import make_centernet_train_step

        inner = make_centernet_train_step(model, cfg, tx)
    elif family == "yolof":
        from aod_meh_hua_tpu.engine.yolof import make_yolof_train_step

        inner = make_yolof_train_step(model, cfg, tx)
    elif family == "foveabox":
        from aod_meh_hua_tpu.engine.foveabox import make_fovea_train_step

        inner = make_fovea_train_step(model, cfg, tx)
    elif family == "paa":
        from aod_meh_hua_tpu.engine.paa import make_paa_train_step

        inner = make_paa_train_step(model, cfg, tx)
    elif family == "gfl":
        from aod_meh_hua_tpu.engine.gfl import make_gfl_train_step

        inner = make_gfl_train_step(model, cfg, tx)
    elif family in ("fcos", "nas_fcos"):
        from aod_meh_hua_tpu.engine.fcos import make_fcos_train_step

        inner = make_fcos_train_step(model, cfg, tx)
    elif family == "fsaf":
        from aod_meh_hua_tpu.engine.fsaf import make_fsaf_train_step

        inner = make_fsaf_train_step(model, cfg, tx)
    elif family == "free_anchor":
        from aod_meh_hua_tpu.engine.free_anchor import \
            make_free_anchor_train_step

        inner = make_free_anchor_train_step(model, cfg, tx)
    elif family == "ghm":
        from aod_meh_hua_tpu.engine.ghm import make_ghm_train_step

        inner = make_ghm_train_step(model, cfg, tx)
    elif family == "pisa_retinanet":
        from aod_meh_hua_tpu.engine.pisa import make_pisa_retina_train_step

        inner = make_pisa_retina_train_step(model, cfg, tx)
    elif family == "nasfpn":
        from aod_meh_hua_tpu.engine.retina_zoo import \
            make_vanilla_retina_train_step

        inner = make_vanilla_retina_train_step(model, cfg, tx)
    elif family == "sabl":
        from aod_meh_hua_tpu.engine.sabl import make_sabl_train_step

        inner = make_sabl_train_step(model, cfg, tx)
    elif family == "autoassign":
        from aod_meh_hua_tpu.engine.autoassign import make_autoassign_train_step

        inner = make_autoassign_train_step(model, cfg, tx)
    elif family == "vfnet":
        from aod_meh_hua_tpu.engine.vfnet import make_vfnet_train_step

        inner = make_vfnet_train_step(model, cfg, tx)
    else:
        from aod_meh_hua_tpu.engine.atss import make_atss_train_step

        inner = make_atss_train_step(model, cfg, tx)
    return lambda state, batch, key: inner(state, batch)


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
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("AOD_JAX_CACHE", "/tmp/jaxcache"))

    proc_id, proc_count = 0, 1
    if args.distributed:
        from aod_meh_hua_tpu.parallel import init_distributed

        info = init_distributed(args.coordinator, args.num_processes,
                                args.process_id)
        proc_id, proc_count = info["process_index"], info["process_count"]
        if args.num_devices is None:
            args.num_devices = info["global_devices"]
        print(f"distributed: process {proc_id}/{proc_count}, "
              f"{info['local_devices']} local devices", flush=True)
    is_main = proc_id == 0

    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.data import (
        ConcatVOC, EvalLoader, PipelineConfig, TrainLoader, VOCDataset,
    )
    from aod_meh_hua_tpu.engine import create_train_state, detections_to_per_class
    from aod_meh_hua_tpu.engine.checkpoint import save_checkpoint
    from aod_meh_hua_tpu.engine.train import set_learning_rate
    from aod_meh_hua_tpu.utils.config import TrainConfig
    from aod_meh_hua_tpu.utils.voc_eval import eval_map

    os.makedirs(args.work_dir, exist_ok=True)
    if args.reference_config:
        import dataclasses as _dc

        from aod_meh_hua_tpu.utils.mmconfig import map_reference_zoo_config

        z = map_reference_zoo_config(args.reference_config, mini=args.mini)
        if z.family in ("retinanet", "ssd"):
            raise SystemExit(
                f"{z.family}: use tools/train_retinanet.py / train_ssd.py "
                f"(the AL drivers) for the live families")
        if args.family and args.family != z.family:
            raise SystemExit(f"--family {args.family} contradicts "
                             f"{args.reference_config} (resolves to "
                             f"{z.family})")
        args.family = z.family
        cfg = _dc.replace(z.model, compute_dtype=args.dtype)
        # the file's schedule fills any flag left at its default
        defaults = {"epochs": 12, "lr_steps": [8, 11], "batch_size": 2,
                    "lr": ap_lr_default(), "momentum": 0.9,
                    "weight_decay": 1e-4}
        ref = {"epochs": z.train["epochs"],
               "lr_steps": list(z.train["lr_steps"]),
               "batch_size": z.train["batch_size"], "lr": z.train["lr"],
               "momentum": z.train["momentum"],
               "weight_decay": z.train["weight_decay"]}
        for k, dflt in defaults.items():
            if getattr(args, k) == dflt:
                setattr(args, k, ref[k])
        args._ref_train = z.train  # grad_clip etc. for the optimizer
        print(f"reference config -> family {z.family}, "
              f"lr {args.lr} x0.1@{args.lr_steps}, {args.epochs} epochs, "
              f"batch {args.batch_size}", flush=True)
        for n in z.notes:
            print(f"  note: {n}", flush=True)
    elif not args.family:
        raise SystemExit("one of --family or --reference-config is required")
    else:
        cfg = build(args.family, args.mini, args.dtype)
    if args.family == "detr":
        # configs/detr/detr_r50: AdamW 1e-4, wd 1e-4, backbone x0.1, clip 0.1
        lr = args.lr if args.lr != ap_lr_default() else 1e-4
        tcfg = TrainConfig(optimizer="adamw", lr=lr,
                           weight_decay=args.weight_decay,
                           backbone_lr_mult=0.1, grad_clip=0.1,
                           batch_size=args.batch_size, seed=args.seed)
    elif args.family == "deformable_detr":
        # configs/deformable_detr: AdamW 2e-4, wd 1e-4, clip 0.1,
        # lr_mult 0.1 on backbone + sampling_offsets + reference_points
        lr = args.lr if args.lr != ap_lr_default() else 2e-4
        tcfg = TrainConfig(optimizer="adamw_deform", lr=lr,
                           weight_decay=args.weight_decay,
                           backbone_lr_mult=0.1, grad_clip=0.1,
                           batch_size=args.batch_size, seed=args.seed)
    elif args.family == "sparse_rcnn":
        # configs/sparse_rcnn: AdamW 2.5e-5, wd 1e-4, grad clip 1
        lr = args.lr if args.lr != ap_lr_default() else 2.5e-5
        tcfg = TrainConfig(optimizer="adamw", lr=lr,
                           weight_decay=args.weight_decay, grad_clip=1.0,
                           batch_size=args.batch_size, seed=args.seed)
    else:
        clip = (getattr(args, "_ref_train", None) or {}).get("grad_clip")
        tcfg = TrainConfig(lr=args.lr, momentum=args.momentum,
                           weight_decay=args.weight_decay, grad_clip=clip,
                           batch_size=args.batch_size, seed=args.seed)
    model, variables = init_detector(cfg, seed=args.seed)
    state, tx = create_train_state(model, variables, tcfg,
                                   frozen_stages=cfg.frozen_stages)
    step = make_steps(args.family, model, cfg, tx,
                      teacher_ckpt=getattr(args, 'teacher_ckpt', None))

    mesh = None
    shard = lambda b: b
    if args.num_devices and args.num_devices > 1:
        from aod_meh_hua_tpu.parallel import make_mesh, replicate, shard_batch

        if args.batch_size % args.num_devices:
            raise SystemExit(f"--batch-size {args.batch_size} must divide by "
                             f"--num-devices {args.num_devices}")
        mesh = make_mesh(args.num_devices)
        state = replicate(state, mesh)
        shard = lambda b: shard_batch(b, mesh)

    from aod_meh_hua_tpu.data.voc import VOC_CLASSES

    eval_fn = None  # (results, anns) -> metrics row entries
    if args.coco_train:
        if args.voc07:
            raise SystemExit("--coco-train and --voc07 are mutually exclusive")
        from aod_meh_hua_tpu.data.coco import CocoDataset
        from aod_meh_hua_tpu.data.lvis import LVISDataset, eval_lvis_map
        from aod_meh_hua_tpu.utils.coco_eval import eval_coco_map

        ds_cls = LVISDataset if args.dataset_type == "lvis" else CocoDataset
        prefix = args.coco_img_prefix or os.path.dirname(args.coco_train)
        train_set = ds_cls(args.coco_train, prefix)
        # head width gates the label space: cap to the first num_classes
        # categories (json order) so tiny heads meet consistent labels
        if len(train_set.classes) > cfg.num_classes:
            classes = train_set.classes[: cfg.num_classes]
            train_set = ds_cls(args.coco_train, prefix, classes=classes)
        classes = train_set.classes
        if args.oversample_thr:
            # LVIS-style repeat-factor sampling (ClassBalancedDataset)
            from aod_meh_hua_tpu.data import ClassBalancedDataset

            train_set = ClassBalancedDataset(train_set, args.oversample_thr)
        val = None
        if not args.no_validate and args.coco_val:
            val = ds_cls(args.coco_val,
                         args.coco_img_prefix_val or prefix,
                         classes=classes, test_mode=True)

        def eval_fn(results, anns, det_masks=None):
            if args.dataset_type == "lvis":
                out = eval_lvis_map(results, anns, val.eval_image_masks(),
                                    nel_masks=val.nel_image_masks())
            else:
                out = eval_coco_map(results, anns)
            row = {"mAP": out["mAP"], "mAP_50": out["mAP_50"],
                   "mAP_75": out["mAP_75"]}
            if det_masks is not None and args.dataset_type != "lvis":
                # segm protocol (CocoDataset.evaluate metric='segm'):
                # same matching on pasted-mask IoU
                seg = eval_coco_map(results, anns, det_masks=det_masks)
                row.update({"segm_mAP": seg["mAP"],
                            "segm_mAP_50": seg["mAP_50"],
                            "segm_mAP_75": seg["mAP_75"]})
            return row
    else:
        if not args.voc07:
            raise SystemExit("one of --voc07 or --coco-train is required")
        # shrunken --mini heads have < 20 classes: restrict the dataset to the
        # matching class subset (unknown names are skipped by the parser)
        classes = VOC_CLASSES[: cfg.num_classes]
        datasets = [VOCDataset(os.path.join(args.voc07, "ImageSets/Main/trainval.txt"),
                               args.voc07, classes=classes)]
        if args.voc12:
            datasets.append(VOCDataset(
                os.path.join(args.voc12, "ImageSets/Main/trainval.txt"), args.voc12,
                classes=classes))
        train_set = ConcatVOC(datasets)
        val = None
        if not args.no_validate:
            test_txt = os.path.join(args.voc07, "ImageSets/Main/test.txt")
            if os.path.exists(test_txt):
                val = VOCDataset(test_txt, args.voc07, test_mode=True, classes=classes)

        def eval_fn(results, anns, det_masks=None):
            # VOC XML carries no instance masks: segm eval is undefined
            return {"mAP": eval_map(results, anns, iou_thr=0.5,
                                    mode="11points")["mAP"]}

    if args.family in ("rpn", "cascade_rpn"):
        from aod_meh_hua_tpu.engine.rpn_only import proposal_recall

        def eval_fn(results, anns):
            # class-agnostic AR@100 (rpn.py evaluation metric=
            # 'proposal_fast', datasets/coco.py fast_eval_recall);
            # reported under the mAP key so the epoch log row and the
            # best-metric plumbing stay uniform
            boxes = [r[0][:, :4] for r in results]
            valid = [np.ones(len(b), bool) for b in boxes]
            ar = proposal_recall(boxes, valid, [a["bboxes"] for a in anns])
            return {"mAP": ar, "AR@100": ar}

    mean = getattr(cfg, "img_mean", (123.675, 116.28, 103.53))
    std = getattr(cfg, "img_std", (58.395, 57.12, 57.375))
    pipe = PipelineConfig(canvas=cfg.canvas, mean=mean, std=std,
                          device_normalize=True)
    if cfg.canvas[0] == cfg.canvas[1]:
        # square-canvas families (yolov3): keep-ratio resize INTO the square
        pipe = PipelineConfig(img_scale=cfg.canvas, canvas=cfg.canvas,
                              mean=mean, std=std, device_normalize=True)
    elif args.mini:
        # tiny canvases are (64, 128): keep-ratio scale that always fits
        pipe = PipelineConfig(img_scale=(128, 60), canvas=cfg.canvas,
                              mean=mean, std=std, device_normalize=True)
    proposal_source = None
    if args.family == "fast_rcnn":
        # the reference trains Fast R-CNN from precomputed proposal files
        # (configs/fast_rcnn/*, datasets/custom.py proposal_file); here a
        # .npz keyed by dataset index (tools/gen_proposals.py writes one
        # from a trained RPN checkpoint)
        if not args.proposal_file:
            raise SystemExit("--family fast_rcnn requires --proposal-file "
                             "(generate with tools/gen_proposals.py)")
        prop_npz = np.load(args.proposal_file)
        prop_npz_val = (np.load(args.proposal_file_val)
                        if args.proposal_file_val else prop_npz)
        proposal_source = lambda i: prop_npz[str(i)][:, :4]
    augment_fn = None
    if args.instaboost or args.albu:
        fns = []
        if args.instaboost:
            from aod_meh_hua_tpu.data import instaboost_from_cfg
            fns.append(instaboost_from_cfg(dict(
                action_candidate=("normal", "horizontal", "skip"),
                action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                theta=(-1, 1), color_prob=0.5, hflag=False, aug_ratio=0.5)))
        if args.albu:
            from aod_meh_hua_tpu.data import albu_from_cfg
            from aod_meh_hua_tpu.data.albu import ALBU_EXAMPLE_TRANSFORMS
            fns.append(albu_from_cfg(dict(
                type="Albu", transforms=ALBU_EXAMPLE_TRANSFORMS,
                bbox_params=dict(min_visibility=0.0,
                                 filter_lost_elements=True))))

        def augment_fn(img, ann, rng, _fns=tuple(fns)):
            for f in _fns:
                img, ann = f(img, ann, rng)
            return img, ann

    loader = TrainLoader(train_set, np.arange(len(train_set)), cfg, pipe,
                         batch_size=args.batch_size, seed=args.seed,
                         with_masks=(args.family in ("mask_rcnn",
                                                     "mask_scoring_rcnn",
                                                     "yolact",
                                                     "point_rend")),
                         augment_fn=augment_fn,
                         proposal_source=proposal_source)
    eval_steps = {}
    key = jax.random.PRNGKey(args.seed)
    log_path = os.path.join(args.work_dir, "train_log.jsonl")
    metrics = []

    for epoch in range(args.epochs):
        lr = args.lr * (0.1 ** sum(epoch >= s for s in args.lr_steps))
        state = state._replace(opt_state=set_learning_rate(state.opt_state, lr))
        t0 = time.time()
        losses = []
        for orientation, batch in loader:
            key, k = jax.random.split(key)
            state, aux = step(state, shard(batch), k)
            losses.append(aux["loss"])
        mean_loss = float(np.mean([float(np.asarray(l)) for l in losses]))
        print(f"epoch {epoch}: {len(losses)} iters, mean loss {mean_loss:.4f}, "
              f"lr {lr:g}, {time.time() - t0:.1f}s", flush=True)
        row = {"epoch": epoch, "loss": mean_loss, "lr": lr}

        if val is not None and (epoch + 1) % args.eval_interval == 0:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            vidx = np.arange(len(val))
            if proc_count > 1:
                # rank-sharded eval + gather (multi_gpu_test analog)
                from aod_meh_hua_tpu.parallel import rank_indices

                vidx = rank_indices(len(val), proc_id, proc_count)
                variables = jax.tree.map(np.asarray, variables)
            results, order, res_masks = [], [], []
            vloader = EvalLoader(val, vidx, pipe,
                                 batch_size=max(args.batch_size, 4))
            for orientation, ebatch, idx in vloader:
                if orientation not in eval_steps:
                    if args.family == "fast_rcnn":
                        from aod_meh_hua_tpu.engine.rpn_only import \
                            make_fast_rcnn_eval_step

                        eval_steps[orientation] = make_fast_rcnn_eval_step(
                            model, cfg.for_orientation(orientation))
                    else:
                        eval_steps[orientation] = make_eval_step_for(
                            model, cfg.for_orientation(orientation))
                if args.family == "fast_rcnn":
                    from aod_meh_hua_tpu.data.loader import _pad_proposals

                    sf = np.asarray(ebatch.scale_factors)
                    plist = [prop_npz_val[str(i)][:, :4] * sf[k]
                             for k, i in enumerate(idx)]
                    while len(plist) < ebatch.images.shape[0]:  # tail pad
                        plist.append(np.zeros((0, 4), np.float32))
                    props, pvalid = _pad_proposals(plist, cfg.num_proposals)
                    dets = eval_steps[orientation](variables, ebatch,
                                                   props, pvalid)
                else:
                    dets = eval_steps[orientation](variables, ebatch)
                nc = 1 if args.family == "rpn" else cfg.num_classes
                if hasattr(dets, "masks"):
                    from aod_meh_hua_tpu.engine.eval import \
                        mask_detections_to_per_class

                    res_i, masks_i = mask_detections_to_per_class(
                        dets, nc, np.asarray(ebatch.valid))
                    results.extend(res_i)
                    res_masks.extend(masks_i)
                else:
                    results.extend(detections_to_per_class(
                        dets, nc, np.asarray(ebatch.valid)))
                order.extend(idx.tolist())
            if proc_count > 1:
                from aod_meh_hua_tpu.parallel import collect_objects

                parts = collect_objects(args.work_dir, f"eval{epoch}",
                                        (results, order, res_masks))
                results = [r for res, _, _ in parts for r in res]
                order = [i for _, o, _ in parts for i in o]
                res_masks = [m for _, _, ms in parts for m in ms]
            anns = [val.get_ann_info(i) for i in order]
            row.update(eval_fn(results, anns,
                               det_masks=res_masks if res_masks else None))
            print(f"epoch {epoch}: mAP {row['mAP']:.4f}", flush=True)
        metrics.append(row)
        if is_main:
            with open(log_path, "a") as f:
                f.write(json.dumps(row) + "\n")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if is_main:
        ckpt = os.path.join(args.work_dir, f"{args.family}_final.ckpt")
        save_checkpoint(ckpt, variables)
        with open(os.path.join(args.work_dir, f"{args.family}_meta.json"), "w") as f:
            json.dump({"family": args.family, "epochs": args.epochs,
                       "dtype": args.dtype}, f)
        with open(os.path.join(args.work_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)
        print(f"saved {ckpt}")


if __name__ == "__main__":
    main()
