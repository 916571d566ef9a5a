"""COCO-style mAP evaluation (host-side numpy, no pycocotools).

Behavioral parity target (reference, /root/reference):
* mmdet/datasets/coco.py:evaluate -> pycocotools COCOeval bbox protocol:
  AP averaged over IoU 0.50:0.05:0.95, 101-point precision
  interpolation over the recall grid, per-image greedy matching in
  score order where a detection prefers the best-IoU UNMATCHED real gt
  and may fall back to a crowd/ignored gt (then counting as neither TP
  nor FP), maxDets=100, area range 'all'.

Differences vs pycocotools kept deliberately: no small/medium/large
area buckets (single 'all' range) and no per-image det cap beyond the
caller's NMS max_per_img — both noted in the result dict.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .voc_eval import np_bbox_overlaps

IOU_THRS = np.arange(0.5, 1.0, 0.05)  # .50:.05:.95, 10 thresholds
RECALL_GRID = np.linspace(0.0, 1.0, 101)


def _match_image(dets: np.ndarray, gts: np.ndarray, gts_ig: np.ndarray,
                 iou_thr: float):
    """COCOeval.evaluateImg for one (image, class, IoU): returns
    (tp, ig) bool arrays over dets sorted by score desc."""
    order = np.argsort(-dets[:, -1], kind="mergesort")
    dets = dets[order]
    n_d, n_g, n_i = len(dets), len(gts), len(gts_ig)
    tp = np.zeros(n_d, bool)
    det_ig = np.zeros(n_d, bool)
    if n_d == 0:
        return tp, det_ig
    iou_g = np_bbox_overlaps(dets[:, :4], gts) if n_g else np.zeros((n_d, 0))
    # crowd gts match by IoF (intersection over det area): COCOeval
    # computes iou(d, g_crowd) with iscrowd -> intersection / area(d)
    iou_i = (np_bbox_overlaps(dets[:, :4], gts_ig, mode="iof")
             if n_i else np.zeros((n_d, 0)))
    g_taken = np.zeros(n_g, bool)
    for d in range(n_d):
        best, best_iou = -1, iou_thr
        for g in range(n_g):
            if g_taken[g]:
                continue
            if iou_g[d, g] >= best_iou:
                best, best_iou = g, iou_g[d, g]
        if best >= 0:
            g_taken[best] = True
            tp[d] = True
            continue
        # fall back to an ignored/crowd gt: det becomes ignored
        if n_i and iou_i[d].max() >= iou_thr:
            det_ig[d] = True
    return tp, det_ig


def eval_coco_map(
    det_results: List[List[np.ndarray]],
    annotations: List[Dict[str, np.ndarray]],
) -> Dict:
    """det_results: per image, per class [m, 5] (x1 y1 x2 y2 score).
    annotations: dicts with bboxes/labels and optional
    bboxes_ignore/labels_ignore (iscrowd boxes). Returns
    {mAP, mAP_50, mAP_75, per_class}."""
    assert len(det_results) == len(annotations)
    num_classes = len(det_results[0])
    ap = np.full((len(IOU_THRS), num_classes), np.nan)
    per_class = []
    for c in range(num_classes):
        cls_dets, cls_gts, cls_ig = [], [], []
        for dets, ann in zip(det_results, annotations):
            cls_dets.append(dets[c])
            m = ann["labels"] == c
            cls_gts.append(ann["bboxes"][m])
            if ann.get("labels_ignore") is not None and len(ann.get("labels_ignore", ())):
                mi = ann["labels_ignore"] == c
                cls_ig.append(ann["bboxes_ignore"][mi])
            else:
                cls_ig.append(np.zeros((0, 4), np.float32))
        num_gts = int(sum(len(g) for g in cls_gts))
        per_class.append({"num_gts": num_gts,
                          "num_dets": int(sum(len(d) for d in cls_dets))})
        if num_gts == 0:
            continue  # class absent from gt: excluded from the mean
        scores = np.concatenate([d[:, -1] for d in cls_dets]) if per_class[-1]["num_dets"] else np.zeros(0)
        order = np.argsort(-scores, kind="mergesort")
        for t, thr in enumerate(IOU_THRS):
            tps, igs = [], []
            for d, g, gi in zip(cls_dets, cls_gts, cls_ig):
                tp_i, ig_i = _match_image(d, g, gi, thr)
                # _match_image sorts internally; re-sort contributions
                # identically so global concat aligns with `order`
                srt = np.argsort(-d[:, -1], kind="mergesort")
                tp_u = np.zeros(len(d), bool)
                ig_u = np.zeros(len(d), bool)
                tp_u[srt] = tp_i
                ig_u[srt] = ig_i
                tps.append(tp_u)
                igs.append(ig_u)
            tp = np.concatenate(tps)[order] if len(order) else np.zeros(0, bool)
            ig = np.concatenate(igs)[order] if len(order) else np.zeros(0, bool)
            keep = ~ig  # ignored dets drop out of the PR curve entirely
            tp_c = np.cumsum(tp[keep]).astype(np.float64)
            fp_c = np.cumsum(~tp[keep]).astype(np.float64)
            if len(tp_c) == 0:
                ap[t, c] = 0.0
                continue
            recall = tp_c / num_gts
            precision = tp_c / np.maximum(tp_c + fp_c, np.finfo(np.float64).eps)
            # interpolate: precision envelope (max to the right)
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            # 101-point sample: first index with recall >= grid point
            idx = np.searchsorted(recall, RECALL_GRID, side="left")
            q = np.where(idx < len(precision),
                         precision[np.minimum(idx, len(precision) - 1)], 0.0)
            ap[t, c] = q.mean()

    valid = ~np.isnan(ap)
    m_all = float(ap[valid].mean()) if valid.any() else 0.0
    m50 = float(np.nanmean(ap[0])) if valid[0].any() else 0.0
    i75 = int(np.argmin(np.abs(IOU_THRS - 0.75)))
    m75 = float(np.nanmean(ap[i75])) if valid[i75].any() else 0.0
    for c in range(num_classes):
        per_class[c]["ap"] = float(np.nanmean(ap[:, c])) if valid[:, c].any() else 0.0
        per_class[c]["ap50"] = float(ap[0, c]) if valid[0, c] else 0.0
    return {"mAP": m_all, "mAP_50": m50, "mAP_75": m75,
            "per_class": per_class, "area_range": "all", "iou_thrs": list(IOU_THRS)}
