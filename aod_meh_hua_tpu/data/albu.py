"""Native equivalents of the albumentations transforms the reference uses.

The reference's ``Albu`` pipeline stage is a thin adapter over the
optional ``albumentations`` pip package (reference mmdet/datasets/
pipelines/transforms.py:1282 — gated import, keymap/bbox_params
plumbing, filter_lost_elements). That package is not installable here,
so this module implements the transform set its one example config
actually requests (configs/albu_example/mask_rcnn_r50_fpn_albu_1x_coco.py:
4-42): ShiftScaleRotate, RandomBrightnessContrast, RGBShift,
HueSaturationValue, JpegCompression, ChannelShuffle, Blur, MedianBlur,
and the OneOf combinator — plus the Compose-level bbox bookkeeping
(pascal_voc xyxy boxes, min_visibility filtering, label_fields sync).

Semantics follow albumentations' definitions:
* ShiftScaleRotate: affine about the image center, shift as a fraction
  of each side, scale multiplier 1+U(-limit,limit), angle U(-limit,
  limit) deg, border reflect-101; boxes map by transforming their 4
  corners and re-taking min/max.
* RandomBrightnessContrast (brightness_by_max=True): alpha=1+U(contrast),
  beta=U(brightness); img = img*alpha + beta*255.
* RGBShift / HueSaturationValue: per-channel integer shifts (hue wraps
  mod 180 in cv2's uint8 HSV).
* JpegCompression: encode/decode at quality U(lower, upper).
* Blur/MedianBlur: random odd kernel in [3, blur_limit].

All host-side numpy/cv2 (loader work). Images are BGR uint8 (cv2
convention used throughout data/); RGBShift's r/g/b limits are mapped
to the right BGR channels.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _corners(boxes):
    x1, y1, x2, y2 = boxes.T
    return np.stack([np.stack([x1, y1], 1), np.stack([x2, y1], 1),
                     np.stack([x1, y2], 1), np.stack([x2, y2], 1)], 1)


def shift_scale_rotate(img, boxes, rng, shift_limit=0.0625, scale_limit=0.0,
                       rotate_limit=0, interpolation=1):
    """Returns (img, boxes). Angle/scale/shift each drawn U(-lim, lim)."""
    h, w = img.shape[:2]
    ang = rng.uniform(-rotate_limit, rotate_limit)
    s = 1.0 + rng.uniform(-scale_limit, scale_limit)
    tx = rng.uniform(-shift_limit, shift_limit) * w
    ty = rng.uniform(-shift_limit, shift_limit) * h
    mat = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), ang, s)
    mat[:, 2] += (tx, ty)
    out = cv2.warpAffine(img, mat, (w, h), flags=interpolation,
                         borderMode=cv2.BORDER_REFLECT_101)
    if len(boxes):
        c = _corners(boxes.astype(np.float64))
        c = c @ mat[:, :2].T + mat[:, 2]
        boxes = np.concatenate([c.min(1), c.max(1)], 1).astype(np.float32)
    return out, boxes


def random_brightness_contrast(img, rng, brightness_limit=(0.1, 0.3),
                               contrast_limit=(0.1, 0.3)):
    def _draw(lim):
        lo, hi = (-lim, lim) if np.isscalar(lim) else lim
        return rng.uniform(lo, hi)

    alpha = 1.0 + _draw(contrast_limit)
    beta = _draw(brightness_limit)
    return np.clip(img.astype(np.float32) * alpha + beta * 255.0,
                   0, 255).astype(np.uint8)


def rgb_shift(img, rng, r_shift_limit=10, g_shift_limit=10, b_shift_limit=10):
    # img is BGR: channel 0=b, 1=g, 2=r
    shift = np.array([rng.uniform(-b_shift_limit, b_shift_limit),
                      rng.uniform(-g_shift_limit, g_shift_limit),
                      rng.uniform(-r_shift_limit, r_shift_limit)], np.float32)
    return np.clip(img.astype(np.float32) + shift, 0, 255).astype(np.uint8)


def hue_saturation_value(img, rng, hue_shift_limit=20, sat_shift_limit=30,
                         val_shift_limit=20):
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    h = hsv[..., 0].astype(np.int16)
    h = (h + int(rng.uniform(-hue_shift_limit, hue_shift_limit))) % 180
    sv = hsv[..., 1:].astype(np.float32)
    sv[..., 0] += rng.uniform(-sat_shift_limit, sat_shift_limit)
    sv[..., 1] += rng.uniform(-val_shift_limit, val_shift_limit)
    hsv = np.concatenate([h[..., None].astype(np.uint8),
                          np.clip(sv, 0, 255).astype(np.uint8)], axis=-1)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def jpeg_compression(img, rng, quality_lower=85, quality_upper=95):
    q = int(rng.uniform(quality_lower, quality_upper + 1))
    ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
    assert ok
    return cv2.imdecode(buf, cv2.IMREAD_COLOR)


def channel_shuffle(img, rng):
    return img[..., rng.permutation(3)]


def blur(img, rng, blur_limit=3):
    k = int(rng.choice(np.arange(3, blur_limit + 1, 2)))
    return cv2.blur(img, (k, k))


def median_blur(img, rng, blur_limit=3):
    k = int(rng.choice(np.arange(3, blur_limit + 1, 2)))
    return cv2.medianBlur(img, k)


_COLOR = {
    "RandomBrightnessContrast": random_brightness_contrast,
    "RGBShift": rgb_shift,
    "HueSaturationValue": hue_saturation_value,
    "JpegCompression": jpeg_compression,
    "ChannelShuffle": channel_shuffle,
    "Blur": blur,
    "MedianBlur": median_blur,
}


def _build_one(cfg):
    """dict -> (apply(img, boxes, rng) -> (img, boxes), p)."""
    cfg = dict(cfg)
    t = cfg.pop("type")
    p = cfg.pop("p", 0.5)
    if t == "OneOf":
        subs = [_build_one(c) for c in cfg.pop("transforms")]
        weights = np.asarray([sp for _, sp in subs], np.float64)
        weights = weights / weights.sum()

        def apply(img, boxes, rng, _subs=subs, _w=weights):
            f, _ = _subs[rng.choice(len(_subs), p=_w)]
            return f(img, boxes, rng)

        return apply, p
    if t == "ShiftScaleRotate":

        def apply(img, boxes, rng, _kw=cfg):
            return shift_scale_rotate(img, boxes, rng, **_kw)

        return apply, p
    fn = _COLOR[t]  # color-only: boxes pass through

    def apply(img, boxes, rng, _fn=fn, _kw=cfg):
        return _fn(img, rng, **_kw), boxes

    return apply, p


class Albu:
    """Compose with the reference adapter's bbox bookkeeping.

    Mirrors transforms.py:1282: each transform fires independently with
    its own p; after the chain, boxes are clipped to the image and
    instances whose visible fraction (clipped area / pre-transform
    area) < min_visibility — or that left the frame — are dropped
    together with their label_fields entries and masks
    (filter_lost_elements, :1346-1352)."""

    def __init__(self, transforms, min_visibility=0.0,
                 filter_lost_elements=True, **_ignored):
        self.steps = [_build_one(c) for c in transforms]
        self.min_visibility = float(min_visibility)
        self.filter_lost = filter_lost_elements

    def __call__(self, img, ann, rng):
        boxes = np.asarray(ann["bboxes"], np.float32).reshape(-1, 4)
        area0 = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
            np.maximum(boxes[:, 3] - boxes[:, 1], 0)
        for fn, p in self.steps:
            if rng.rand() < p:
                img, boxes = fn(img, boxes, rng)
        h, w = img.shape[:2]
        clipped = boxes.copy()
        if len(clipped):
            clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, w)
            clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, h)
        area1 = (np.maximum(clipped[:, 2] - clipped[:, 0], 0)
                 * np.maximum(clipped[:, 3] - clipped[:, 1], 0)) \
            if len(clipped) else np.zeros((0,))
        vis = np.where(area0 > 0, area1 / np.maximum(area0, 1e-9), 0.0)
        keep = (vis > self.min_visibility) if self.filter_lost \
            else np.ones(len(clipped), bool)
        new_ann = dict(ann)
        new_ann["bboxes"] = clipped[keep]
        new_ann["labels"] = np.asarray(ann["labels"])[keep]
        if "masks" in ann and isinstance(ann["masks"], list):
            new_ann["masks"] = [m for m, k in zip(ann["masks"], keep) if k]
        return img, new_ann


# the exact transform list of the reference's one albu config
# (configs/albu_example/mask_rcnn_r50_fpn_albu_1x_coco.py:4-42)
ALBU_EXAMPLE_TRANSFORMS = [
    dict(type="ShiftScaleRotate", shift_limit=0.0625, scale_limit=0.0,
         rotate_limit=0, interpolation=1, p=0.5),
    dict(type="RandomBrightnessContrast", brightness_limit=[0.1, 0.3],
         contrast_limit=[0.1, 0.3], p=0.2),
    dict(type="OneOf", transforms=[
        dict(type="RGBShift", r_shift_limit=10, g_shift_limit=10,
             b_shift_limit=10, p=1.0),
        dict(type="HueSaturationValue", hue_shift_limit=20,
             sat_shift_limit=30, val_shift_limit=20, p=1.0)], p=0.1),
    dict(type="JpegCompression", quality_lower=85, quality_upper=95, p=0.2),
    dict(type="ChannelShuffle", p=0.1),
    dict(type="OneOf", transforms=[
        dict(type="Blur", blur_limit=3, p=1.0),
        dict(type="MedianBlur", blur_limit=3, p=1.0)], p=0.1),
]


def albu_from_cfg(cfg: dict) -> Albu:
    """Build from a reference pipeline dict: dict(type='Albu',
    transforms=[...], bbox_params=..., keymap=..., ...) — the keymap is
    irrelevant here (we operate on the native (img, ann) pair directly)
    and bbox_params' min_visibility/filter flags are honoured."""
    bp = cfg.get("bbox_params", {}) or {}
    return Albu(cfg["transforms"],
                min_visibility=bp.get("min_visibility", 0.0),
                filter_lost_elements=bp.get("filter_lost_elements", True))
