"""Native InstaBoost: probability-map-guided instance copy-paste.

The reference gates this behind the optional ``instaboostfast`` pip
package (reference mmdet/datasets/pipelines/instaboost.py:25-33 raises
ImportError; the wrapper only converts ann formats around
``instaboost.get_new_data``). That package is not installable here
(no-new-deps environment), so this module re-derives the algorithm
itself — InstaBoost (Fang et al., ICCV 2019): cut each annotated
instance out by its polygon mask, restore the hole by inpainting, then
re-paste the instance at a jittered pose sampled either uniformly in a
local neighbourhood ('normal' action, the mode every reference config
uses: configs/instaboost/*_4x_coco.py set action_prob=(1, 0, 0)) or at
the horizontally mirrored location ('horizontal'), optionally guided by
an appearance-consistency heatmap (hflag=True).

Config surface and ann-dict semantics match the reference wrapper
exactly (instaboost.py:15-24 defaults; :64-66 drops instances whose
post-transform box degenerates to w<=0 or h<=0; :83 applies the whole
augmentation with probability ``aug_ratio`` per image, else no-op).

Everything is host-side numpy/cv2 (data-loader work, never jitted).
Masks are xy-interleaved polygon lists per instance — the same
representation data/coco.py parses.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _poly_mask(polys, h, w):
    """Rasterize one instance's polygon list into a uint8 {0,1} mask."""
    m = np.zeros((h, w), np.uint8)
    pts = [np.round(np.asarray(p, np.float64).reshape(-1, 2)).astype(np.int32)
           for p in polys if len(p) >= 6]
    if pts:
        cv2.fillPoly(m, pts, 1)
    return m


def _affine_polys(polys, mat):
    """Apply a 2x3 affine to xy-interleaved polygon lists."""
    out = []
    for p in polys:
        xy = np.asarray(p, np.float64).reshape(-1, 2)
        xy = xy @ mat[:, :2].T + mat[:, 2]
        out.append(xy.reshape(-1).astype(np.float32).tolist())
    return out


def _poly_bbox(polys, h, w):
    """Tight xyxy box over the polygons, clipped to the image."""
    xy = np.concatenate(
        [np.asarray(p, np.float64).reshape(-1, 2) for p in polys], axis=0)
    x1, y1 = xy.min(axis=0)
    x2, y2 = xy.max(axis=0)
    return np.array([max(x1, 0), max(y1, 0), min(x2, w), min(y2, h)],
                    np.float32)


def _appearance_map(img, mask, dx, dy):
    """hflag=True placement prior: the paper's appearance-consistency
    heatmap, reduced to its core — candidate offsets whose background
    ring looks like the original's score higher. We compare the mean
    color of the dilated mask boundary ring at the original location
    against the ring shifted by each candidate offset, and softmax the
    negative L2 distances into sampling weights."""
    ring = cv2.dilate(mask, np.ones((7, 7), np.uint8)) - mask
    ys, xs = np.nonzero(ring)
    if len(ys) == 0:
        return None
    h, w = mask.shape
    base = img[ys, xs].astype(np.float64).mean(axis=0)
    cands, dists = [], []
    for oy in range(-dy, dy + 1, max(1, dy // 3)):
        for ox in range(-dx, dx + 1, max(1, dx // 3)):
            cy = np.clip(ys + oy, 0, h - 1)
            cx = np.clip(xs + ox, 0, w - 1)
            cands.append((ox, oy))
            dists.append(np.linalg.norm(
                img[cy, cx].astype(np.float64).mean(axis=0) - base))
    d = np.asarray(dists)
    wgt = np.exp(-(d - d.min()) / (d.std() + 1e-6))
    return cands, wgt / wgt.sum()


def instaboost(img, ann, rng,
               action_candidate=("normal", "horizontal", "skip"),
               action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
               theta=(-1, 1), color_prob=0.5, hflag=False, aug_ratio=0.5):
    """Copy-paste jitter every instance of one image (prob aug_ratio).

    img: uint8 HWC (BGR, cv2 convention — channel-symmetric here).
    ann: dict with 'bboxes' [N,4] xyxy float32, 'labels' [N] int,
    'masks' list of per-instance polygon lists. Returns (img, ann) with
    the same schema; instances whose transformed box degenerates are
    dropped, mirroring the reference wrapper (instaboost.py:64-66).
    """
    if rng.rand() >= aug_ratio or len(ann["masks"]) == 0:
        return img, ann
    h, w = img.shape[:2]
    out = img.copy()
    keep_boxes, keep_labels, keep_masks = [], [], []
    for i, polys in enumerate(ann["masks"]):
        polys = [p for p in polys if len(p) >= 6]
        action = action_candidate[
            rng.choice(len(action_candidate), p=np.asarray(action_prob,
                                                           np.float64)
                       / np.sum(action_prob))]
        mask = _poly_mask(polys, h, w) if polys else None
        if action == "skip" or mask is None or mask.sum() < 4:
            keep_boxes.append(ann["bboxes"][i])
            keep_labels.append(ann["labels"][i])
            keep_masks.append(ann["masks"][i])
            continue

        # 1. matting: lift the instance, restore the hole by inpainting
        patch = out * mask[..., None]
        hole = cv2.inpaint(out, cv2.dilate(mask, np.ones((3, 3), np.uint8)),
                           3, cv2.INPAINT_TELEA)

        # 2. sample the jitter pose
        s = rng.uniform(*scale)
        ang = rng.uniform(*theta)
        ys, xs = np.nonzero(mask)
        cx, cy = float(xs.mean()), float(ys.mean())
        if action == "horizontal":
            tx, ty = (w - 1 - 2 * cx), 0.0  # mirror the center, x -> W-x
        elif hflag:
            amap = _appearance_map(out, mask, dx, dy)
            if amap is None:
                tx = ty = 0.0
            else:
                cands, wgt = amap
                tx, ty = cands[rng.choice(len(cands), p=wgt)]
        else:
            tx, ty = rng.uniform(-dx, dx), rng.uniform(-dy, dy)
        mat = cv2.getRotationMatrix2D((cx, cy), ang, s)
        mat[:, 2] += (tx, ty)
        if action == "horizontal":
            # mirror the patch itself so the pasted instance is flipped
            flip = np.array([[-1, 0, 2 * cx], [0, 1, 0]], np.float64)
            mat = np.asarray(
                np.vstack([mat, [0, 0, 1]]) @ np.vstack([flip, [0, 0, 1]])
            )[:2]

        new_mask = cv2.warpAffine(mask, mat, (w, h),
                                  flags=cv2.INTER_NEAREST, borderValue=0)
        new_patch = cv2.warpAffine(patch, mat, (w, h),
                                   flags=cv2.INTER_LINEAR, borderValue=0)
        if rng.rand() < color_prob:  # instaboost's color jitter on paste
            shift = rng.randint(-15, 16, size=3)
            new_patch = np.clip(new_patch.astype(np.int16) + shift,
                                0, 255).astype(np.uint8)

        new_polys = _affine_polys(polys, mat)
        box = _poly_bbox(new_polys, h, w)
        if box[2] - box[0] <= 0 or box[3] - box[1] <= 0:
            continue  # degenerate after transform: drop (reference :64-66)

        # 3. composite: background where the instance left, patch on top
        m3 = new_mask.astype(bool)[..., None]
        out = np.where(mask.astype(bool)[..., None], hole, out)
        out = np.where(m3, new_patch, out)
        keep_boxes.append(box)
        keep_labels.append(ann["labels"][i])
        keep_masks.append(new_polys)

    new_ann = dict(ann)
    new_ann["bboxes"] = (np.stack(keep_boxes).astype(np.float32)
                         if keep_boxes else np.zeros((0, 4), np.float32))
    new_ann["labels"] = (np.asarray(keep_labels, np.int32)
                         if keep_labels else np.zeros((0,), np.int32))
    new_ann["masks"] = keep_masks
    return out, new_ann


def instaboost_from_cfg(cfg: dict):
    """Build an (img, ann, rng) -> (img, ann) callable from a reference
    pipeline dict: dict(type='InstaBoost', action_candidate=..., ...)
    (configs/instaboost/mask_rcnn_r50_fpn_instaboost_4x_coco.py:5-16)."""
    kw = {k: v for k, v in cfg.items() if k != "type"}

    def apply(img, ann, rng):
        return instaboost(img, ann, rng, **kw)

    return apply
