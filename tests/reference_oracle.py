"""Dynamic-shape numpy transcription of the reference's ENTIRE
Entropy_NMS acquisition-scoring pipeline — the oracle the jitted TPU
path is validated against at pool scale.

This is a line-faithful re-expression (ragged arrays, per-image python
loops, dynamic shapes — everything the TPU path deliberately is NOT) of
the reference chain:

* `_get_bboxes` per-level softmax/score transform, nms_pre top-k and
  decode  (/root/reference/mmdet/models/dense_heads/Lambda_L2.py:254-306)
* rescale + dummy-background column + `multiclass_nms` incl. the
  class-offset batched-NMS trick and score ordering
  (Lambda_L2.py:307-334, /root/reference/mmdet/core/post_processing/
  bbox_nms.py:7-95, mmcv batched_nms semantics)
* `GetObjectIdx` object membership (Lambda_L2.py:343-349)
* `ComputeObjUnc` per-(image, object, scale, class) Dirichlet epistemic
  means incl. the full-map FG skip, StartEnd level slicing, the
  pair-mean lambda rescale and per-pair MI (Lambda_L2.py:489-537,
  mmdet/utils/functions.py:438-446)
* `AggregateObjScaleUnc` class->scale->object reduction with empty->0
  (Lambda_L2.py:597-619, functions.py:425-436)
* `update_X_L` top-K selection with the zeroRate mechanism
  (/root/reference/mmdet/utils/active_datasets.py:102-135)

Dirichlet MI comes in both of the reference's flavors: the exact closed
form (what 500 samples converge to) and `mi="sampled"` numpy Monte-Carlo
with the reference's 500-draw scheme (Lambda_L2.py:519-525), so the
parity test can quantify the reference's own MC noise floor.

Pure numpy + scipy.special.digamma: no jax, no torch, no imports from
the package under test.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy.special import digamma


# --- primitives -----------------------------------------------------------


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def delta2bbox(
    rois: np.ndarray,
    deltas: np.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    max_shape: Optional[Tuple[int, int]] = None,
    wh_ratio_clip: float = 16.0 / 1000.0,
) -> np.ndarray:
    """delta_xywh_bbox_coder.py:144 (delta2bbox), numpy."""
    d = deltas * np.asarray(stds) + np.asarray(means)
    max_ratio = abs(np.log(wh_ratio_clip))
    dx, dy = d[..., 0], d[..., 1]
    dw = np.clip(d[..., 2], -max_ratio, max_ratio)
    dh = np.clip(d[..., 3], -max_ratio, max_ratio)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * np.exp(dw)
    gh = ph * np.exp(dh)
    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    if max_shape is not None:
        h, w = float(max_shape[0]), float(max_shape[1])
        x1, x2 = np.clip(x1, 0, w), np.clip(x2, 0, w)
        y1, y2 = np.clip(y1, 0, h), np.clip(y2, 0, h)
    return np.stack([x1, y1, x2, y2], axis=-1)


def bbox_overlaps(a: np.ndarray, b: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """iou2d_calculator.bbox_overlaps (mode='iou'), numpy. [N, M]."""
    if a.size == 0 or b.size == 0:
        return np.zeros((a.shape[0], b.shape[0]), np.float64)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = np.maximum(area_a[:, None] + area_b[None, :] - inter, eps)
    return inter / union


def nms_keep(boxes: np.ndarray, scores: np.ndarray, iou_thr: float) -> np.ndarray:
    """Greedy NMS over score-descending order (mmcv nms). Returns kept
    candidate indices in descending-score order (ties by input index)."""
    order = np.argsort(-scores, kind="stable")
    keep: List[int] = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        iou = bbox_overlaps(boxes[i : i + 1], boxes[rest]).ravel()
        order = rest[iou <= iou_thr]
    return np.asarray(keep, np.int64)


def multiclass_nms(
    bboxes: np.ndarray,
    scores: np.ndarray,
    score_thr: float,
    iou_thr: float,
    max_num: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """bbox_nms.py:7 multiclass_nms for shared boxes [N, 4] and
    FOREGROUND scores [N, C] (the dummy background column already
    stripped, as multiclass_nms itself does with `scores[:, :-1]`).

    Returns (dets [K, 5] = (x1, y1, x2, y2, score), labels [K]) in
    descending-score order, capped at max_num.
    """
    n, c = scores.shape
    # per-class expansion, anchor-major (bboxes.reshape(-1, 4) after
    # [N, C, 4] expand; labels arange(C) tiled per anchor)
    flat_boxes = np.repeat(bboxes, c, axis=0)
    flat_scores = scores.reshape(-1)
    flat_labels = np.tile(np.arange(c), n)
    valid = flat_scores > score_thr
    vb, vs, vl = flat_boxes[valid], flat_scores[valid], flat_labels[valid]
    if len(vs) == 0:
        return np.zeros((0, 5)), np.zeros((0,), np.int64)
    # mmcv batched_nms class-offset trick: max over the FILTERED boxes
    max_coord = vb.max()
    off = vb + (vl * (max_coord + 1.0))[:, None]
    keep = nms_keep(off, vs, iou_thr)
    if max_num > 0:
        keep = keep[:max_num]
    dets = np.concatenate([vb[keep], vs[keep, None]], axis=1)
    return dets, vl[keep]


# --- Dirichlet MI ----------------------------------------------------------


def dirichlet_mi_closed(alpha: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(epistemic, aleatoric) of Dirichlet(alpha) rows — the exact values
    the reference's 500-sample estimate (Lambda_L2.py:519-525) converges
    to: total = H(E[p]), aleatoric = E[H(p)], epistemic = total - aleatoric."""
    s = alpha.sum(axis=-1, keepdims=True)
    p = alpha / s
    total = -(p * np.log(p)).sum(axis=-1)
    aleatoric = -(p * (digamma(alpha + 1.0) - digamma(s + 1.0))).sum(axis=-1)
    return total - aleatoric, aleatoric


def dirichlet_mi_sampled(
    alpha: np.ndarray, rng: np.random.RandomState, num_samples: int = 500
) -> Tuple[np.ndarray, np.ndarray]:
    """The reference's estimator verbatim: Dirichlet(alpha).sample(500),
    total = H(mean(samples)), aleatoric = mean(H(samples))."""
    g = rng.standard_gamma(alpha, size=(num_samples,) + alpha.shape)
    g = np.maximum(g, 1e-300)  # torch draws are strictly positive
    samples = g / g.sum(axis=-1, keepdims=True)
    avg = samples.mean(axis=0)
    total = -(avg * np.log(avg)).sum(axis=-1)
    aleatoric = (-(samples * np.log(samples)).sum(axis=-1)).mean(axis=0)
    return total - aleatoric, aleatoric


# --- the scoring pipeline --------------------------------------------------

AGG_FUNCS = {"Sum": np.sum, "Avg": np.mean, "Max": np.max}


def extract_agg_funcs(spec: str) -> Dict[str, callable]:
    """functions.py:425-436 ExtractAggFunc."""
    out = {}
    for name in ("object", "scale", "class"):
        for part in spec.split("_"):
            if name in part:
                out[name] = AGG_FUNCS[part.replace(name, "")]
    return out


def score_image(
    level_logits: Sequence[np.ndarray],
    level_deltas: Sequence[np.ndarray],
    level_lambda: Sequence[np.ndarray],
    level_anchors: Sequence[np.ndarray],
    img_shape: Tuple[int, int],
    scale_factor: np.ndarray,
    *,
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    nms_iou_thr: float = 0.5,
    max_per_img: int = 100,
    obj_score_thr: float = 0.3,
    memb_iou_thr: float = 0.5,
    fg_score_thr: float = 0.3,
    lambda_eps: float = 1e-7,
    lambda_scale: float = 25.0,
    agg: str = "objectSum_scaleMax_classSum",
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
    mi: str = "closed",
    mi_samples: int = 500,
    rng: Optional[np.random.RandomState] = None,
) -> Dict:
    """One pool image through the whole reference pipeline.

    level_logits[l]: [A_l, C] raw class logits (conv output, flattened
    (H, W, anchor)-major); level_deltas[l]: [A_l, 4]; level_lambda[l]:
    [A_l]; level_anchors[l]: [A_l, 4]. Returns dict with 'unc' (the
    AggedUnc scalar), 'maxconf', 'n_dets', 'n_pairs_over_thr' (candidate
    -cap diagnostic: (anchor, class) pairs above score_thr).
    """
    n_levels = len(level_logits)
    topk_scores, topk_boxes, topk_lams = [], [], []
    maxconf = 0.0
    for lvl in range(n_levels):
        logits = np.asarray(level_logits[lvl], np.float64)
        alphas = softmax(logits)  # Lambda_L2.py:268 (relu path)
        maxconf = max(maxconf, float(alphas.max()))  # getMaxConf
        s = alphas.sum(axis=1, keepdims=True) + 1e-20
        scores = alphas / (s + 1e-9)  # gamma=1: alphas / (S + 1e-9)
        deltas = np.asarray(level_deltas[lvl], np.float64)
        anchors = np.asarray(level_anchors[lvl], np.float64)
        lams = np.asarray(level_lambda[lvl], np.float64)
        if 0 < nms_pre < scores.shape[0]:
            max_scores = scores.max(axis=1)  # relu: over ALL columns
            topk = np.argsort(-max_scores, kind="stable")[:nms_pre]
            scores, deltas, anchors, lams = (
                scores[topk], deltas[topk], anchors[topk], lams[topk])
        boxes = delta2bbox(anchors, deltas, target_means, target_stds,
                           max_shape=img_shape)
        topk_scores.append(scores)
        topk_boxes.append(boxes)
        topk_lams.append(lams)

    mlvl_scores = topk_scores
    mlvl_boxes = np.concatenate(topk_boxes, axis=0)
    # rescale=True in the pool sweep (apis/test.py:115)
    mlvl_boxes = mlvl_boxes / np.asarray(scale_factor, np.float64)
    all_scores = np.concatenate(mlvl_scores, axis=0)
    n_pairs = int((all_scores > score_thr).sum())

    dets, _labels = multiclass_nms(
        mlvl_boxes, all_scores, score_thr, nms_iou_thr, max_per_img)

    # GetObjectIdx (Lambda_L2.py:343-349)
    filtered = dets[dets[:, -1] > obj_score_thr]
    membership = bbox_overlaps(mlvl_boxes, filtered[:, :4]) > memb_iou_thr

    # ComputeObjUnc (Lambda_L2.py:489-537)
    n_obj = membership.shape[1]
    out: List[List[Dict]] = [[{} for _ in range(n_levels)] for _ in range(n_obj)]
    start = 0
    for lvl in range(n_levels):
        end = start + mlvl_scores[lvl].shape[0]  # StartEnd, functions.py:438
        # full-map FG skip on softmax alphas (NOT the /S scores)
        full_alphas = softmax(np.asarray(level_logits[lvl], np.float64))
        if not (full_alphas.max(axis=1) > fg_score_thr).any():
            start = end
            continue
        pos_bbox = membership[start:end]
        start = end
        if not pos_bbox.any():
            continue
        topk_score = mlvl_scores[lvl]
        fg_pos = pos_bbox & (topk_score.max(axis=1) > fg_score_thr)[:, None]
        pos_idx, obj_info = np.nonzero(fg_pos)
        if len(pos_idx) == 0:
            continue
        pos_scores = topk_score[pos_idx]
        pos_l = topk_lams[lvl][pos_idx]
        pos_l = pos_l.mean() / (pos_l + lambda_eps) * lambda_scale
        pos_alphas = pos_scores * pos_l[:, None]
        if mi == "closed":
            epistemic, aleatoric = dirichlet_mi_closed(pos_alphas)
        else:
            epistemic, aleatoric = dirichlet_mi_sampled(pos_alphas, rng, mi_samples)
        pos_cls = pos_scores.argmax(axis=1)
        for obj in np.unique(obj_info):
            obj_mask = obj_info == obj
            for cls in np.unique(pos_cls[obj_mask]):
                sel = obj_mask & (pos_cls == cls)
                out[obj][lvl][str(cls)] = (
                    float(aleatoric[sel].mean()), float(epistemic[sel].mean()))

    # AggregateObjScaleUnc (Lambda_L2.py:597-619)
    funcs = extract_agg_funcs(agg)
    unc_objs = []
    for obj in range(n_obj):
        unc_scales = []
        for lvl in range(n_levels):
            unc_clss = [epi for (_ale, epi) in out[obj][lvl].values()]
            if unc_clss:
                unc_scales.append(float(funcs["class"](np.asarray(unc_clss))))
        if unc_scales:
            unc_objs.append(float(funcs["scale"](np.asarray(unc_scales))))
    unc = float(funcs["object"](np.asarray(unc_objs))) if unc_objs else 0.0

    return {"unc": unc, "maxconf": maxconf, "n_dets": int(len(dets)),
            "n_objects": n_obj, "n_pairs_over_thr": n_pairs}


def score_image_ssd(
    level_logits: Sequence[np.ndarray],
    level_deltas: Sequence[np.ndarray],
    level_lambda: Sequence[np.ndarray],
    level_anchors: Sequence[np.ndarray],
    img_shape: Tuple[int, int],
    scale_factor: np.ndarray,
    *,
    nms_pre: int = 1000,
    score_thr: float = 0.02,
    nms_iou_thr: float = 0.5,
    max_per_img: int = 200,
    obj_score_thr: float = 0.3,
    memb_iou_thr: float = 0.5,
    fg_score_thr: float = 0.3,
    lambda_eps: float = 1e-7,
    lambda_scale: float = 25.0,
    agg: str = "objectSum_scaleMax_classSum",
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
    mi: str = "closed",
    mi_samples: int = 500,
    rng: Optional[np.random.RandomState] = None,
) -> Dict:
    """One pool image through the SSD (softmax-family) reference chain —
    the My_L_ssd_head sibling of score_image:

    * `_get_bboxes` (My_L_ssd_head.py:317-414): scores = softmax over
      C+1 INCLUDING the explicit background column; per-level top-k
      ranked by the max over FOREGROUND columns only (scores[..., :-1]);
      decode with the SSD coder stds; rescale before NMS.
    * mmdet multiclass_nms strips the background column itself
      (`scores[:, :-1]`, bbox_nms.py:26) — NMS sees foreground scores.
    * GetObjectIdx (My_L_ssd_head.py:391-395): same 0.3/0.5 thresholds.
    * ComputeObjUnc (My_L_ssd_head.py:435-484): the per-level skip gates
      on the FULL-map softmax max over FOREGROUND columns
      (`slvl_alphas[:, :-1]`, :446) — unlike retina's all-column max —
      while the per-anchor pair gate uses `topk_score.max(dim=1)` over
      ALL columns (:464, background included); the Dirichlet runs over
      all C+1 columns (module global ignoreBG = False, :19) and the
      class cell key is argmax over all columns (background can be a
      'class').
    * AggregateObjScaleUnc (My_L_ssd_head.py:520-543) — identical
      reduction; getMaxConf (functions.py:467-476) maxes the softmax
      over ALL columns, so SSD maxconf is usually the background prob.

    Same return dict as score_image.
    """
    n_levels = len(level_logits)
    topk_scores, topk_boxes, topk_lams = [], [], []
    maxconf = 0.0
    for lvl in range(n_levels):
        logits = np.asarray(level_logits[lvl], np.float64)
        scores = softmax(logits)  # [A_l, C+1] incl. background
        maxconf = max(maxconf, float(scores.max()))  # getMaxConf: ALL cols
        deltas = np.asarray(level_deltas[lvl], np.float64)
        anchors = np.asarray(level_anchors[lvl], np.float64)
        lams = np.asarray(level_lambda[lvl], np.float64)
        if 0 < nms_pre < scores.shape[0]:
            max_scores = scores[:, :-1].max(axis=1)  # FG columns only
            topk = np.argsort(-max_scores, kind="stable")[:nms_pre]
            scores, deltas, anchors, lams = (
                scores[topk], deltas[topk], anchors[topk], lams[topk])
        boxes = delta2bbox(anchors, deltas, target_means, target_stds,
                           max_shape=img_shape)
        topk_scores.append(scores)
        topk_boxes.append(boxes)
        topk_lams.append(lams)

    mlvl_boxes = np.concatenate(topk_boxes, axis=0)
    # rescale=True in the pool sweep (apis/test.py:115)
    mlvl_boxes = mlvl_boxes / np.asarray(scale_factor, np.float64)
    all_scores = np.concatenate(topk_scores, axis=0)  # incl. background
    fg_scores = all_scores[:, :-1]
    n_pairs = int((fg_scores > score_thr).sum())

    dets, _labels = multiclass_nms(
        mlvl_boxes, fg_scores, score_thr, nms_iou_thr, max_per_img)

    # GetObjectIdx (My_L_ssd_head.py:391-395)
    filtered = dets[dets[:, -1] > obj_score_thr]
    membership = bbox_overlaps(mlvl_boxes, filtered[:, :4]) > memb_iou_thr

    # ComputeObjUnc (My_L_ssd_head.py:435-484)
    n_obj = membership.shape[1]
    out: List[List[Dict]] = [[{} for _ in range(n_levels)] for _ in range(n_obj)]
    start = 0
    for lvl in range(n_levels):
        end = start + topk_scores[lvl].shape[0]
        full_probs = softmax(np.asarray(level_logits[lvl], np.float64))
        # FG skip over FOREGROUND columns of the full map (:446)
        if not (full_probs[:, :-1].max(axis=1) > fg_score_thr).any():
            start = end
            continue
        pos_bbox = membership[start:end]
        start = end
        if not pos_bbox.any():
            continue
        topk_score = topk_scores[lvl]
        # pair gate over ALL columns (background included, :464)
        fg_pos = pos_bbox & (topk_score.max(axis=1) > fg_score_thr)[:, None]
        pos_idx, obj_info = np.nonzero(fg_pos)
        if len(pos_idx) == 0:
            continue
        pos_scores = topk_score[pos_idx]
        pos_l = topk_lams[lvl][pos_idx]
        pos_l = pos_l.mean() / (pos_l + lambda_eps) * lambda_scale
        pos_alphas = pos_scores * pos_l[:, None]  # all C+1 cols (ignoreBG=False)
        if mi == "closed":
            epistemic, aleatoric = dirichlet_mi_closed(pos_alphas)
        else:
            epistemic, aleatoric = dirichlet_mi_sampled(pos_alphas, rng, mi_samples)
        pos_cls = pos_scores.argmax(axis=1)  # all cols: bg is a valid cell
        for obj in np.unique(obj_info):
            obj_mask = obj_info == obj
            for cls in np.unique(pos_cls[obj_mask]):
                sel = obj_mask & (pos_cls == cls)
                out[obj][lvl][str(cls)] = (
                    float(aleatoric[sel].mean()), float(epistemic[sel].mean()))

    # AggregateObjScaleUnc (My_L_ssd_head.py:520-543)
    funcs = extract_agg_funcs(agg)
    unc_objs = []
    for obj in range(n_obj):
        unc_scales = []
        for lvl in range(n_levels):
            unc_clss = [epi for (_ale, epi) in out[obj][lvl].values()]
            if unc_clss:
                unc_scales.append(float(funcs["class"](np.asarray(unc_clss))))
        if unc_scales:
            unc_objs.append(float(funcs["scale"](np.asarray(unc_scales))))
    unc = float(funcs["object"](np.asarray(unc_objs))) if unc_objs else 0.0

    return {"unc": unc, "maxconf": maxconf, "n_dets": int(len(dets)),
            "n_objects": n_obj, "n_pairs_over_thr": n_pairs}


def score_image_scale(
    level_logits: Sequence[np.ndarray],
    level_lambda: Optional[Sequence[np.ndarray]],
    *,
    fg_score_thr: float = 0.3,
    lambda_eps: float = 1e-7,
    lambda_scale: float = 25.0,
    agg: str = "scaleAvg_classAvg",
    mi: str = "closed",
    mi_samples: int = 500,
    rng: Optional[np.random.RandomState] = None,
) -> float:
    """One pool image through the scale-variant chain: ComputeScaleUnc +
    AggregateScaleUnc (Lambda_L2.py:539-569 + :636-691) — the
    Entropy_ALL path (full maps, nms_pre=-1, Lambda_L2.py:282-284).

    level_logits[l]: [A_l, C] raw class logits over the FULL level map;
    level_lambda[l]: [A_l] MEH lambda, or None for the Entropy_NoNMS
    pathway (get_bboxes is called without L_scores, Lambda_L2.py:404 —
    the reference's own ComputeScaleUnc would then crash indexing None;
    'no lambda rescale' is the declared rebuild semantics,
    docs/ARCHITECTURE.md). Returns the AggedUnc scalar.
    """
    n_levels = len(level_logits)
    cells: List[Dict] = [{} for _ in range(n_levels)]
    for lvl in range(n_levels):
        alphas = softmax(np.asarray(level_logits[lvl], np.float64))
        fg = alphas.max(axis=1) > fg_score_thr
        if not fg.any():
            continue
        if level_lambda is not None:
            lam = np.asarray(level_lambda[lvl], np.float64)
            # l_scores.mean() over the WHOLE level map, not FG-masked
            lam_p = lam.mean() / (lam + lambda_eps) * lambda_scale
            alphas = alphas * lam_p[:, None]
        fil = alphas[fg]
        if mi == "closed":
            epistemic, aleatoric = dirichlet_mi_closed(fil)
        else:
            epistemic, aleatoric = dirichlet_mi_sampled(fil, rng, mi_samples)
        cls = fil.argmax(axis=1)
        for c in np.unique(cls):
            sel = cls == c
            cells[lvl][str(c)] = (float(aleatoric[sel].mean()),
                                  float(epistemic[sel].mean()))

    funcs = extract_agg_funcs(agg)
    scale_vals = []
    for lvl in range(n_levels):
        cls_vals = [epi for (_ale, epi) in cells[lvl].values()]
        if cls_vals:
            scale_vals.append(float(funcs["class"](np.asarray(cls_vals))))
    return float(funcs["scale"](np.asarray(scale_vals))) if scale_vals else 0.0


def update_x_l(
    uncertainty: np.ndarray,
    x_all: np.ndarray,
    x_l: np.ndarray,
    x_s_size: int,
    zero_rate: float,
    np_random: np.random.RandomState,
    maxconf: Optional[np.ndarray] = None,
    use_max_conf: str = "False",
) -> np.ndarray:
    """active_datasets.py:102-135 update_X_L (zeroRate branch, incl. the
    useMaxConf min/max zero-pick variants), transcribed verbatim
    INCLUDING the `list(set(...))` unlabeled-pool ordering. Returns
    X_L_next sorted."""
    all_x_u = np.array(list(set(x_all.tolist()) - set(x_l.tolist())))
    unc_u = uncertainty[all_x_u]
    arg = unc_u.argsort()
    if zero_rate:
        zeros = (unc_u == 0).nonzero()[0]
        zero_size = int(x_s_size * zero_rate)
        nonzero_size = x_s_size - zero_size
        if len(zeros) < zero_size:
            zero_size = len(zeros)
        if use_max_conf != "False":
            mc_arg = np.asarray(maxconf)[all_x_u].argsort()
            zero_idx = (mc_arg[:zero_size] if use_max_conf == "min"
                        else mc_arg[-zero_size:])
        else:
            zero_idx = np_random.choice(zeros, zero_size)
        nonzero_idx = arg[-nonzero_size:]
        x_s = np.concatenate((all_x_u[zero_idx], all_x_u[nonzero_idx]))
    else:
        x_s = all_x_u[arg[-x_s_size:]]
    x_l_next = np.concatenate((x_l, x_s))
    x_l_next.sort()
    return x_l_next


def update_x_l2(
    uncertainty: np.ndarray, x_all: np.ndarray, x_l: np.ndarray, x_s_size: int
) -> np.ndarray:
    """active_datasets.py:91-100 update_X_L2 (the reselect path): the
    next labeled set is the top (|X_L| + x_s_size) most-uncertain images
    over the WHOLE pool — no monotone-growth guarantee. Verbatim incl.
    `np.array(list(set(X_all)))` (ascending for a 0..n-1 pool) indexed
    by the full argsort. Returns X_L_next sorted."""
    all_x_u = np.array(list(set(x_all.tolist())))
    arg = np.asarray(uncertainty).argsort()
    x_l_next = all_x_u[arg[-(x_s_size + len(x_l)):]]
    x_l_next.sort()
    return x_l_next
