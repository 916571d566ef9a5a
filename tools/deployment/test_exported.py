"""Evaluate an EXPORTED detector artifact against a dataset (reference
tools/deployment/test.py analog: that script runs the deployed
ONNX/TensorRT engine over the test set and prints the same metrics as a
live model; here the deployed form is the jax.export StableHLO blob
produced by tools/deployment/export_model.py).

The artifact is self-contained (weights baked in) and compiled for one
canvas orientation and one batch size; pass --artifact-portrait too for
datasets with portrait images (batches of an orientation with no
artifact are skipped, with a warning, so a single-artifact run is a
partial eval).

Example:
  python tools/deployment/export_model.py --family retinanet \
      --checkpoint latest.ckpt --batch 8 --out det_land.bin
  python tools/deployment/test_exported.py det_land.bin \
      --voc07 /data/VOCdevkit/VOC2007 --split test --batch 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact", help="exported .bin (landscape program)")
    ap.add_argument("--artifact-portrait", default=None)
    ap.add_argument("--family", default="retinanet")
    ap.add_argument("--voc07", required=True)
    ap.add_argument("--voc12", default=None)
    ap.add_argument("--split", default="test")
    ap.add_argument("--batch", type=int, default=1,
                    help="must match the exported program's batch size")
    ap.add_argument("--mini", action="store_true", help="tiny model geometry")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from jax import export as jexport

    from aod_meh_hua_tpu.data import EvalLoader, PipelineConfig
    from aod_meh_hua_tpu.data.voc import ConcatVOC, VOCDataset
    from aod_meh_hua_tpu.engine import EvalBatch, detections_to_per_class
    from aod_meh_hua_tpu.engine.mask_rcnn import MaskDetections
    from aod_meh_hua_tpu.ops.nms import NMSResult
    from aod_meh_hua_tpu.utils.config import (RetinaNetConfig, SSDConfig,
                                              ZOO_FAMILIES, tiny_test_config)
    from aod_meh_hua_tpu.utils.voc_eval import eval_map

    jexport.register_namedtuple_serialization(
        EvalBatch, serialized_name="aod_meh_hua_tpu.EvalBatch")
    jexport.register_namedtuple_serialization(
        NMSResult, serialized_name="aod_meh_hua_tpu.NMSResult")
    jexport.register_namedtuple_serialization(
        MaskDetections, serialized_name="aod_meh_hua_tpu.MaskDetections")

    if args.mini:
        cfg = tiny_test_config()
    elif args.family == "retinanet":
        cfg = RetinaNetConfig()
    elif args.family == "ssd":
        cfg = SSDConfig()
    else:
        cfg = ZOO_FAMILIES[args.family][0]()

    programs = {}
    with open(args.artifact, "rb") as f:
        programs["landscape"] = jexport.deserialize(f.read())
    if args.artifact_portrait:
        with open(args.artifact_portrait, "rb") as f:
            programs["portrait"] = jexport.deserialize(f.read())

    def _year(root):
        return VOCDataset(
            os.path.join(root, "ImageSets", "Main", f"{args.split}.txt"),
            root, test_mode=True)

    dataset = (ConcatVOC([_year(args.voc07), _year(args.voc12)])
               if args.voc12 else _year(args.voc07))
    pipe = PipelineConfig(canvas=cfg.canvas)
    if args.mini:
        pipe = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)
    loader = EvalLoader(dataset, np.arange(len(dataset)), pipe,
                        batch_size=args.batch)

    results, order, skipped = [], [], 0
    for orientation, batch, bidx in loader:
        prog = programs.get(orientation)
        if prog is None:
            skipped += len(bidx)
            continue
        dets = prog.call(batch)
        results.extend(detections_to_per_class(
            dets, cfg.num_classes, np.asarray(batch.valid)))
        order.extend(bidx.tolist())
    if skipped:
        print(f"WARNING: skipped {skipped} images with no "
              f"matching-orientation artifact")
    annotations = [dataset.get_ann_info(i) for i in order]
    out = eval_map(results, annotations, iou_thr=0.5, mode="11points")
    print(f"evaluated {len(order)}/{len(dataset)} images")
    print(f"mAP: {out['mAP']:.4f}")
    return out["mAP"]


if __name__ == "__main__":
    main()
