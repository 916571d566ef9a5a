"""COCO-style mAP evaluation (host-side numpy, no pycocotools).

Behavioral parity target (reference, /root/reference):
* mmdet/datasets/coco.py:evaluate -> pycocotools COCOeval bbox protocol:
  AP averaged over IoU 0.50:0.05:0.95, 101-point precision
  interpolation over the recall grid, per-image greedy matching in
  score order where a detection prefers the best-IoU UNMATCHED real gt
  and may fall back to a crowd/ignored gt (then counting as neither TP
  nor FP), maxDets=100, area range 'all'.
* metric='segm' (COCOeval iouType='segm', mmdet/datasets/coco.py
  evaluate with metric='segm' for mask models): identical protocol with
  IoUs computed on instance MASKS instead of boxes. pycocotools stores
  masks as RLE; here both sides are full-image bool bitmaps (same math,
  no codec). Crowd/ignore regions carry no polygons through the data
  layer, so their "mask" is the crowd BOX bitmap — exact whenever the
  crowd region is box-shaped, a documented approximation otherwise.

Differences vs pycocotools kept deliberately: no small/medium/large
area buckets (single 'all' range) and no per-image det cap beyond the
caller's NMS max_per_img — both noted in the result dict.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .voc_eval import np_bbox_overlaps

IOU_THRS = np.arange(0.5, 1.0, 0.05)  # .50:.05:.95, 10 thresholds
RECALL_GRID = np.linspace(0.0, 1.0, 101)


def np_mask_overlaps(m1: np.ndarray, m2: np.ndarray,
                     mode: str = "iou") -> np.ndarray:
    """Pairwise mask IoU/IoF for bool bitmaps [m, H, W] x [n, H, W]
    (pycocotools maskUtils.iou semantics on decoded masks; iof is the
    iscrowd=1 variant: intersection / area(first))."""
    m1f = m1.reshape(len(m1), -1).astype(np.float32)
    m2f = m2.reshape(len(m2), -1).astype(np.float32)
    inter = m1f @ m2f.T
    a1, a2 = m1f.sum(1), m2f.sum(1)
    denom = a1[:, None] + a2[None, :] - inter if mode == "iou" \
        else np.broadcast_to(a1[:, None], inter.shape)
    return inter / np.maximum(denom, np.finfo(np.float32).eps)


def polys_to_bitmap(polys: List, h: int, w: int) -> np.ndarray:
    """One instance's polygon list (xy-interleaved floats, COCO
    'segmentation' format) -> [h, w] bool bitmap. pycocotools
    frPyObjects rasterizes with its own scanline fill; cv2.fillPoly is
    the same up to sub-pixel boundary rounding."""
    import cv2

    out = np.zeros((h, w), np.uint8)
    pts = [np.round(np.asarray(p, np.float64).reshape(-1, 2)).astype(np.int32)
           for p in polys if len(p) >= 6]
    if pts:
        cv2.fillPoly(out, pts, 1)
    return out.astype(bool)


def _box_bitmaps(boxes: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.zeros((len(boxes), h, w), bool)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        out[i, max(int(y1), 0): max(int(np.ceil(y2)), 0),
            max(int(x1), 0): max(int(np.ceil(x2)), 0)] = True
    return out


def _image_ious(dets, gts, gts_ig, det_masks=None, gt_masks=None,
                gt_ig_masks=None):
    """IoU matrices for one (image, class), dets pre-sorted by score
    desc: returns (order, iou_g, iou_i). Crowd gts match by IoF
    (COCOeval iscrowd -> intersection / area(det))."""
    order = np.argsort(-dets[:, -1], kind="mergesort")
    n_d, n_g, n_i = len(dets), len(gts), len(gts_ig)
    if n_d == 0:
        return order, np.zeros((0, n_g)), np.zeros((0, n_i))
    if det_masks is None:
        d = dets[order, :4]
        iou_g = np_bbox_overlaps(d, gts) if n_g else np.zeros((n_d, 0))
        iou_i = (np_bbox_overlaps(d, gts_ig, mode="iof")
                 if n_i else np.zeros((n_d, 0)))
    else:
        dm = det_masks[order]
        iou_g = np_mask_overlaps(dm, gt_masks) if n_g else np.zeros((n_d, 0))
        iou_i = (np_mask_overlaps(dm, gt_ig_masks, mode="iof")
                 if n_i else np.zeros((n_d, 0)))
    return order, iou_g, iou_i


def _match_sorted(iou_g: np.ndarray, iou_i: np.ndarray, iou_thr: float):
    """COCOeval.evaluateImg greedy matching for one (image, class, IoU)
    given score-sorted IoU matrices: returns (tp, ig) over sorted dets."""
    n_d, n_g = iou_g.shape
    tp = np.zeros(n_d, bool)
    det_ig = np.zeros(n_d, bool)
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
        if iou_i.shape[1] and iou_i[d].max() >= iou_thr:
            det_ig[d] = True
    return tp, det_ig


def _match_image(dets: np.ndarray, gts: np.ndarray, gts_ig: np.ndarray,
                 iou_thr: float):
    """COCOeval.evaluateImg for one (image, class, IoU): returns
    (tp, ig) bool arrays over dets sorted by score desc."""
    order, iou_g, iou_i = _image_ious(dets, gts, gts_ig)
    del order  # dets returned in sorted order, as before
    return _match_sorted(iou_g, iou_i, iou_thr)


def _paste_det_masks(boxes: np.ndarray, probs: np.ndarray, h: int, w: int,
                     thr: float) -> np.ndarray:
    """[m, 4] boxes (image coords) + [m, s, s] sigmoid probs -> [m, h, w]
    bool bitmaps (fcn_mask_head.get_seg_masks paste, threshold 0.5)."""
    import cv2

    out = np.zeros((len(boxes), h, w), bool)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        x1i, y1i = max(int(np.floor(x1)), 0), max(int(np.floor(y1)), 0)
        x2i = min(max(int(np.ceil(x2)), x1i + 1), w)
        y2i = min(max(int(np.ceil(y2)), y1i + 1), h)
        if x2i <= x1i or y2i <= y1i:
            continue
        m = cv2.resize(np.asarray(probs[i], np.float32),
                       (x2i - x1i, y2i - y1i),
                       interpolation=cv2.INTER_LINEAR)
        out[i, y1i:y2i, x1i:x2i] = m >= thr
    return out


def eval_coco_map(
    det_results: List[List[np.ndarray]],
    annotations: List[Dict[str, np.ndarray]],
    det_masks: Optional[List[List[np.ndarray]]] = None,
    mask_thr: float = 0.5,
) -> Dict:
    """det_results: per image, per class [m, 5] (x1 y1 x2 y2 score).
    annotations: dicts with bboxes/labels and optional
    bboxes_ignore/labels_ignore (iscrowd boxes). Returns
    {mAP, mAP_50, mAP_75, per_class}.

    segm mode (COCOeval iouType='segm'): pass det_masks — per image,
    per class [m, s, s] sigmoid mask probs box-aligned to the matching
    det_results rows (the compact transport; pasting to image bitmaps
    happens here one image at a time). Annotations must then carry
    'masks' (per-gt COCO polygon lists, aligned with 'bboxes') plus
    'width'/'height'. Matching runs on pasted mask IoU; crowd regions
    match as their box bitmaps (no crowd polygons in the data layer)."""
    assert len(det_results) == len(annotations)
    num_classes = len(det_results[0])
    ap = np.full((len(IOU_THRS), num_classes), np.nan)
    # phase 1 — per (image, class): IoU matrices ONCE, then greedy
    # matching at every threshold; keep only scores + tp/ig bits
    acc = [[] for _ in range(num_classes)]  # (scores, tp[T, n], ig[T, n])
    num_gts = np.zeros(num_classes, np.int64)
    num_dets = np.zeros(num_classes, np.int64)
    for dets, ann, dmasks in zip(det_results, annotations,
                                 det_masks or [None] * len(annotations)):
        labels_ig = ann.get("labels_ignore")
        has_ig = labels_ig is not None and len(labels_ig)
        gt_bitmaps = ig_bitmaps = None
        if det_masks is not None:
            h, w = int(ann["height"]), int(ann["width"])
            if len(ann["labels"]):
                gt_bitmaps = np.stack(
                    [polys_to_bitmap(p, h, w) for p in ann["masks"]])
            if has_ig:
                ig_bitmaps = _box_bitmaps(ann["bboxes_ignore"], h, w)
        for c in range(num_classes):
            m = ann["labels"] == c
            gts = ann["bboxes"][m]
            num_gts[c] += len(gts)
            num_dets[c] += len(dets[c])
            if has_ig:
                mi = labels_ig == c
                gts_ig = ann["bboxes_ignore"][mi]
            else:
                gts_ig = np.zeros((0, 4), np.float32)
            if len(dets[c]) == 0:
                continue
            if det_masks is None:
                order, iou_g, iou_i = _image_ious(dets[c], gts, gts_ig)
            else:
                dm = _paste_det_masks(dets[c][:, :4], dmasks[c], h, w,
                                      mask_thr)
                order, iou_g, iou_i = _image_ious(
                    dets[c], gts, gts_ig, det_masks=dm,
                    gt_masks=gt_bitmaps[m] if gt_bitmaps is not None
                    else np.zeros((0, 1, 1), bool),
                    gt_ig_masks=ig_bitmaps[mi] if has_ig
                    else np.zeros((0, 1, 1), bool))
            tp_t, ig_t = [], []
            for thr in IOU_THRS:
                tp_s, ig_s = _match_sorted(iou_g, iou_i, thr)
                # unsort back to original det order so the global
                # concat + mergesort tie-breaking matches prior behavior
                tp_u = np.zeros(len(order), bool)
                ig_u = np.zeros(len(order), bool)
                tp_u[order] = tp_s
                ig_u[order] = ig_s
                tp_t.append(tp_u)
                ig_t.append(ig_u)
            acc[c].append((dets[c][:, -1], np.stack(tp_t), np.stack(ig_t)))
    # phase 2 — per class: global score sort, PR curve per threshold
    per_class = [{"num_gts": int(num_gts[c]), "num_dets": int(num_dets[c])}
                 for c in range(num_classes)]
    for c in range(num_classes):
        if num_gts[c] == 0:
            continue  # class absent from gt: excluded from the mean
        scores = (np.concatenate([a[0] for a in acc[c]])
                  if acc[c] else np.zeros(0))
        order = np.argsort(-scores, kind="mergesort")
        tp_all = (np.concatenate([a[1] for a in acc[c]], axis=1)
                  if acc[c] else np.zeros((len(IOU_THRS), 0), bool))
        ig_all = (np.concatenate([a[2] for a in acc[c]], axis=1)
                  if acc[c] else np.zeros((len(IOU_THRS), 0), bool))
        for t in range(len(IOU_THRS)):
            tp = tp_all[t][order]
            ig = ig_all[t][order]
            keep = ~ig  # ignored dets drop out of the PR curve entirely
            tp_c = np.cumsum(tp[keep]).astype(np.float64)
            fp_c = np.cumsum(~tp[keep]).astype(np.float64)
            if len(tp_c) == 0:
                ap[t, c] = 0.0
                continue
            recall = tp_c / num_gts[c]
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
