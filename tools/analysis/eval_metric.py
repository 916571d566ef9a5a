"""Offline mAP re-scoring of saved detections
(reference tools/analysis_tools/eval_metric.py).

Input: a .pkl of per-image per-class det arrays (the bbox2result format
that engine.eval.detections_to_per_class emits) + the VOC split it was
produced from.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results", help=".pkl with per-image per-class det arrays")
    ap.add_argument("--voc", required=True, help="path to .../VOC2007")
    ap.add_argument("--split", default=None, help="image-id list file")
    ap.add_argument("--iou-thr", type=float, default=0.5)
    ap.add_argument("--mode", default="11points", choices=["11points", "area"])
    args = ap.parse_args()

    from aod_meh_hua_tpu.data import VOCDataset
    from aod_meh_hua_tpu.utils.voc_eval import eval_map

    split = args.split or os.path.join(args.voc, "ImageSets/Main/test.txt")
    ds = VOCDataset(split, args.voc, test_mode=True)
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    assert len(results) == len(ds), f"{len(results)} results vs {len(ds)} images"
    annotations = [ds.get_ann_info(i) for i in range(len(ds))]
    out = eval_map(results, annotations, iou_thr=args.iou_thr, mode=args.mode)
    print(f"mAP@{args.iou_thr}: {out['mAP']:.4f}")
    from aod_meh_hua_tpu.data.voc import VOC_CLASSES

    for cls, r in zip(VOC_CLASSES, out["per_class"]):
        print(f"  {cls:>12s}: AP {r['ap']:.4f} (gts {r['num_gts']}, dets {r['num_dets']})")


if __name__ == "__main__":
    main()
