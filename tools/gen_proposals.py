"""Dump RPN proposals for a dataset to a .npz — the proposal_file
producer for Fast R-CNN training.

Reference workflow (mmdet): train an RPN
(configs/rpn/rpn_r50_fpn_1x_coco.py), run inference to collect per-image
proposals, feed the resulting pickle to Fast R-CNN via
data.train.proposal_file (configs/fast_rcnn/*,
mmdet/datasets/custom.py:181 load_proposals). Here the artifact is an
.npz keyed by DATASET INDEX with [P, 5] (x1, y1, x2, y2, score) arrays
in ORIGINAL image coordinates, consumed by
`tools/train_detector.py --family fast_rcnn --proposal-file out.npz`.

  python tools/gen_proposals.py --voc07 VOC2007 --checkpoint rpn_final.ckpt \
      --split ImageSets/Main/trainval.txt --out proposals.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Dump RPN proposals to .npz")
    p.add_argument("--voc07", default=None)
    p.add_argument("--coco", default=None, help="COCO json annotation file")
    p.add_argument("--coco-img-prefix", default=None)
    p.add_argument("--split", default=None,
                   help="VOC image-id list (default trainval.txt)")
    p.add_argument("--checkpoint", required=True, help="trained RPN ckpt")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-per-img", type=int, default=None,
                   help="cap proposals kept per image (default: the "
                        "config's test_max_per_img)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--out", default="proposals.npz")
    p.add_argument("--mini", action="store_true", help="tiny model (smoke)")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("AOD_JAX_CACHE", "/tmp/jaxcache"))

    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.data import EvalLoader, PipelineConfig
    from aod_meh_hua_tpu.engine.checkpoint import load_checkpoint
    from aod_meh_hua_tpu.engine.rpn_only import make_rpn_eval_step
    from aod_meh_hua_tpu.utils.config import RPNOnlyConfig, tiny_rpn_config

    cfg = (tiny_rpn_config(compute_dtype=args.dtype) if args.mini
           else RPNOnlyConfig(compute_dtype=args.dtype))
    model, variables = init_detector(cfg, seed=0)
    variables = load_checkpoint(args.checkpoint, variables)

    if args.coco:
        from aod_meh_hua_tpu.data.coco import CocoDataset

        prefix = args.coco_img_prefix or os.path.dirname(args.coco)
        ds = CocoDataset(args.coco, prefix, test_mode=True)
    else:
        if not args.voc07:
            raise SystemExit("one of --voc07 or --coco is required")
        from aod_meh_hua_tpu.data.voc import VOCDataset

        split = args.split or os.path.join(args.voc07,
                                           "ImageSets/Main/trainval.txt")
        if not os.path.isabs(split) and not os.path.exists(split):
            split = os.path.join(args.voc07, split)
        ds = VOCDataset(split, args.voc07, test_mode=True)

    pipe = PipelineConfig(canvas=cfg.canvas, device_normalize=True)
    if args.mini:
        pipe = PipelineConfig(img_scale=(128, 60), canvas=cfg.canvas,
                              device_normalize=True)
    cap = args.max_per_img or cfg.rpn.test_max_per_img
    steps = {}
    out = {}
    loader = EvalLoader(ds, np.arange(len(ds)), pipe,
                        batch_size=args.batch_size)
    for orientation, ebatch, idx in loader:
        if orientation not in steps:
            steps[orientation] = make_rpn_eval_step(
                model, cfg.for_orientation(orientation))
        r = steps[orientation](variables, ebatch)
        boxes = np.asarray(r.boxes)   # ORIGINAL coords (eval step divides
        scores = np.asarray(r.scores)  # by the batch scale factors)
        valid = np.asarray(r.valid)
        for k, i in enumerate(idx):
            v = valid[k]
            out[str(int(i))] = np.concatenate(
                [boxes[k][v][:cap], scores[k][v][:cap, None]],
                axis=1).astype(np.float32)
    np.savez_compressed(args.out, **out)
    n = [len(v) for v in out.values()]
    print(f"wrote {args.out}: {len(out)} images, "
          f"proposals/img min {min(n)} mean {np.mean(n):.1f} max {max(n)}")


if __name__ == "__main__":
    main()
