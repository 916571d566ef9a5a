"""Detection error decomposition (VOC-scoped coco_error_analysis port).

The reference tool (/root/reference/tools/analysis_tools/
coco_error_analysis.py) renders COCO-style progressive PR curves per
class: C75 -> C50 -> Loc -> Sim -> Oth -> BG -> FN. VOC has no
supercategories, so Sim/Oth collapse into one class-confusion bucket:

  C75  AP @ IoU 0.75
  C50  AP @ IoU 0.50
  Loc  AP @ IoU 0.10            (localization errors forgiven)
  Cls  + other-class matches ignored   (class confusion forgiven)
  BG   + background false positives ignored
  FN   1.0                      (remaining gap = missed detections)

Input: the same results .pkl every analysis tool consumes (per-image
per-class det arrays) + the VOC split it was produced on. Output: a
per-class table, a results json, and (with matplotlib) per-class
stacked-gain bar charts.

  python tools/analysis/error_analysis.py results.pkl out_dir --voc /data/VOC2007
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def _ap_for_class(dets, gts, ignore_masks, iou_thr, mode="area"):
    """VOC AP with per-image det-ignore masks (ignored dets are dropped
    before TP/FP marking — the progressive-forgiveness mechanism)."""
    from aod_meh_hua_tpu.utils.voc_eval import average_precision, tpfp_default

    tps, fps, scores = [], [], []
    num_gts = 0
    for det, gt, ign in zip(dets, gts, ignore_masks):
        det = det[~ign] if ign is not None else det
        tp, fp = tpfp_default(det, gt, None, iou_thr=iou_thr)
        tps.append(tp)
        fps.append(fp)
        scores.append(det[:, 4])
        num_gts += len(gt)
    scores = np.concatenate(scores)
    order = np.argsort(-scores)
    tp = np.concatenate(tps)[order]
    fp = np.concatenate(fps)[order]
    tp_cum, fp_cum = np.cumsum(tp), np.cumsum(fp)
    if num_gts == 0:
        return 0.0
    recalls = tp_cum / num_gts
    precisions = tp_cum / np.maximum(tp_cum + fp_cum, np.finfo(np.float32).eps)
    return float(average_precision(recalls, precisions, mode=mode))


def analyze_class(c, results, annotations, num_classes):
    from aod_meh_hua_tpu.utils.voc_eval import np_bbox_overlaps

    dets = [np.asarray(r[c]).reshape(-1, 5) for r in results]
    gts = [a["bboxes"][a["labels"] == c] for a in annotations]
    none = [None] * len(dets)

    # masks for progressive forgiveness (score order doesn't matter here)
    confusion, background = [], []
    for det, ann in zip(dets, annotations):
        other_gt = ann["bboxes"][ann["labels"] != c]
        own_gt = ann["bboxes"][ann["labels"] == c]
        if len(det) == 0:
            confusion.append(np.zeros(0, bool))
            background.append(np.zeros(0, bool))
            continue
        own_iou = np_bbox_overlaps(det[:, :4], own_gt).max(axis=1) \
            if len(own_gt) else np.zeros(len(det))
        other_iou = np_bbox_overlaps(det[:, :4], other_gt).max(axis=1) \
            if len(other_gt) else np.zeros(len(det))
        # class confusion: overlaps another class's GT but not this one's
        confusion.append((other_iou >= 0.1) & (own_iou < 0.1))
        # background FP: overlaps no GT of any class
        background.append((other_iou < 0.1) & (own_iou < 0.1))

    c75 = _ap_for_class(dets, gts, none, 0.75)
    c50 = _ap_for_class(dets, gts, none, 0.50)
    loc = _ap_for_class(dets, gts, none, 0.10)
    cls_f = _ap_for_class(dets, gts, confusion, 0.10)
    bg = _ap_for_class(dets, gts,
                       [cf | b for cf, b in zip(confusion, background)], 0.10)
    return {"C75": c75, "C50": c50, "Loc": loc, "Cls": cls_f, "BG": bg, "FN": 1.0}


def main():
    ap = argparse.ArgumentParser(description="progressive error decomposition")
    ap.add_argument("results", help=".pkl with per-image per-class det arrays")
    ap.add_argument("out_dir")
    ap.add_argument("--voc", required=True, help="path to .../VOC2007")
    ap.add_argument("--split", default=None)
    args = ap.parse_args()

    from aod_meh_hua_tpu.data import VOCDataset
    from aod_meh_hua_tpu.data.voc import VOC_CLASSES

    split = args.split or os.path.join(args.voc, "ImageSets/Main/test.txt")
    ds = VOCDataset(split, args.voc, test_mode=True)
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    assert len(results) == len(ds)
    annotations = [ds.get_ann_info(i) for i in range(len(ds))]
    num_classes = len(results[0])
    names = list(VOC_CLASSES[:num_classes]) if num_classes <= len(VOC_CLASSES) \
        else [str(i) for i in range(num_classes)]

    os.makedirs(args.out_dir, exist_ok=True)
    table = {}
    keys = ("C75", "C50", "Loc", "Cls", "BG", "FN")
    print(f"{'class':>14s}  " + "  ".join(f"{k:>5s}" for k in keys))
    for c in range(num_classes):
        row = analyze_class(c, results, annotations, num_classes)
        table[names[c]] = row
        print(f"{names[c]:>14s}  " + "  ".join(f"{row[k]:5.3f}" for k in keys))
    mean = {k: float(np.mean([v[k] for v in table.values()])) for k in keys}
    table["_mean"] = mean
    print(f"{'mean':>14s}  " + "  ".join(f"{mean[k]:5.3f}" for k in keys))

    with open(os.path.join(args.out_dir, "error_analysis.json"), "w") as f:
        json.dump(table, f, indent=2)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ks = list(keys)
        vals = [mean[k] for k in ks]
        fig, ax = plt.subplots(figsize=(6, 4))
        prev = 0.0
        for k, v in zip(ks, vals):
            ax.bar(k, v - prev, bottom=prev)
            prev = v
        ax.set_ylim(0, 1)
        ax.set_ylabel("AP gain when error type forgiven")
        ax.set_title("mean progressive error decomposition")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, "error_analysis_mean.png"), dpi=120)
    except ImportError:
        pass
    print(f"wrote {args.out_dir}/error_analysis.json")


if __name__ == "__main__":
    main()
