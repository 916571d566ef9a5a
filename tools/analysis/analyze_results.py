"""Per-image result analysis: rank images by single-image mAP and dump
the top-k best/worst with GT + detections drawn.

VOC-scoped port of the reference tool
(/root/reference/tools/analysis_tools/analyze_results.py): the
reference version is COCO-pipeline-bound (get_loading_pipeline +
imshow_gt_det_bboxes); this one reads the same results .pkl the other
analysis tools consume (bbox2result format) against a VOC split, scores
each image with mAP averaged over IoU 0.50:0.95 (bbox_map_eval,
reference :13-46), and writes `good/` and `bad/` galleries named
`<id>_<mAP>.jpg` (reference :63-87).

  python tools/analysis/analyze_results.py results.pkl out_dir \
      --voc /data/VOC2007 [--split ...] [--topk 20] [--show-score-thr 0.3]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def bbox_map_eval(det_result, annotation) -> float:
    """Single-image mAP over IoU 0.50:0.95 (reference analyze_results.py:13-46)."""
    from aod_meh_hua_tpu.utils.voc_eval import eval_map

    iou_thrs = np.linspace(0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1,
                           endpoint=True)
    mean_aps = []
    for thr in iou_thrs:
        out = eval_map([det_result], [annotation], iou_thr=float(thr), mode="area")
        mean_aps.append(out["mAP"])
    return float(sum(mean_aps) / len(mean_aps))


def _flatten_dets(per_class, score_thr):
    boxes, labels, scores = [], [], []
    for c, arr in enumerate(per_class):
        arr = np.asarray(arr).reshape(-1, 5)
        keep = arr[:, 4] >= score_thr
        boxes.append(arr[keep, :4])
        scores.append(arr[keep, 4])
        labels.append(np.full(int(keep.sum()), c, np.int32))
    return (np.concatenate(boxes) if boxes else np.zeros((0, 4)),
            np.concatenate(labels) if labels else np.zeros(0, np.int32),
            np.concatenate(scores) if scores else np.zeros(0))


def main():
    ap = argparse.ArgumentParser(description="rank images by per-image mAP")
    ap.add_argument("results", help=".pkl with per-image per-class det arrays")
    ap.add_argument("show_dir", help="output directory for good/ and bad/ galleries")
    ap.add_argument("--voc", required=True, help="path to .../VOC2007")
    ap.add_argument("--split", default=None, help="image-id list file (default test.txt)")
    ap.add_argument("--topk", type=int, default=20)
    ap.add_argument("--show-score-thr", type=float, default=0.0)
    args = ap.parse_args()

    import cv2

    from aod_meh_hua_tpu.data import VOCDataset
    from aod_meh_hua_tpu.utils.visualize import draw_detections, save_image

    split = args.split or os.path.join(args.voc, "ImageSets/Main/test.txt")
    ds = VOCDataset(split, args.voc, test_mode=True)
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    assert len(results) == len(ds), f"{len(results)} results vs {len(ds)} images"

    maps = np.array([bbox_map_eval(results[i], ds.get_ann_info(i))
                     for i in range(len(ds))])
    order = maps.argsort()
    topk = min(args.topk, len(ds))
    picks = {"good": order[-topk:][::-1], "bad": order[:topk]}

    for tag, idxs in picks.items():
        for i in idxs:
            i = int(i)
            img = cv2.imread(ds.img_path(i))
            ann = ds.get_ann_info(i)
            img = draw_detections(img, ann["bboxes"], ann["labels"])  # GT (palette)
            b, l, s = _flatten_dets(results[i], args.show_score_thr)
            img = draw_detections(img, b, l, scores=s)
            name = os.path.splitext(os.path.basename(ds.img_path(i)))[0]
            save_image(img, os.path.join(args.show_dir, tag,
                                         f"{name}_{maps[i]:.3f}.jpg"))
    print(f"per-image mAP(0.50:0.95): mean {maps.mean():.4f}, "
          f"min {maps.min():.4f}, max {maps.max():.4f}")
    print(f"wrote {topk} good + {topk} bad images to {args.show_dir}")


if __name__ == "__main__":
    main()
