"""Native InstaBoost + Albu transforms (reference gated these behind
optional pip packages: mmdet/datasets/pipelines/instaboost.py:25-33,
transforms.py:1282; here they are implemented in-tree)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from aod_meh_hua_tpu.data import (Albu, albu_from_cfg, instaboost,
                                  instaboost_from_cfg)
from aod_meh_hua_tpu.data.albu import (blur, channel_shuffle,
                                       hue_saturation_value,
                                       jpeg_compression, median_blur,
                                       random_brightness_contrast, rgb_shift,
                                       shift_scale_rotate)

pytestmark = pytest.mark.smoke


def _img(h=96, w=128, seed=0):
    return np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)


def _square_ann(x1=30, y1=20, size=24):
    x2, y2 = x1 + size, y1 + size
    poly = [float(v) for v in (x1, y1, x2, y1, x2, y2, x1, y2)]
    return dict(bboxes=np.array([[x1, y1, x2, y2]], np.float32),
                labels=np.array([3], np.int32), masks=[[poly]])


# ---------------------------------------------------------------- instaboost

def test_instaboost_noop_below_aug_ratio():
    img, ann = _img(), _square_ann()
    out, out_ann = instaboost(img, ann, np.random.RandomState(0),
                              aug_ratio=0.0)
    np.testing.assert_array_equal(out, img)
    np.testing.assert_array_equal(out_ann["bboxes"], ann["bboxes"])


def test_instaboost_skip_action_keeps_everything():
    img, ann = _img(), _square_ann()
    out, out_ann = instaboost(img, ann, np.random.RandomState(1),
                              action_candidate=("skip",), action_prob=(1,),
                              aug_ratio=1.0)
    np.testing.assert_array_equal(out, img)
    np.testing.assert_array_equal(out_ann["bboxes"], ann["bboxes"])


def test_instaboost_normal_moves_instance_consistently():
    """'normal' action (the only one the reference configs enable,
    configs/instaboost/*_4x_coco.py action_prob=(1,0,0)): the box must
    move/scale, stay inside the image, and track the polygon exactly."""
    img, ann = _img(), _square_ann()
    rng = np.random.RandomState(2)
    out, out_ann = instaboost(img, ann, rng, action_prob=(1, 0, 0),
                              dx=15, dy=15, scale=(0.8, 1.2),
                              theta=(-1, 1), color_prob=0.0, aug_ratio=1.0)
    assert out_ann["bboxes"].shape == (1, 4)
    b = out_ann["bboxes"][0]
    assert not np.allclose(b, ann["bboxes"][0])  # actually jittered
    assert b[0] >= 0 and b[1] >= 0 and b[2] <= 128 and b[3] <= 96
    # box == tight hull of the transformed polygon (clipped)
    xy = np.asarray(out_ann["masks"][0][0]).reshape(-1, 2)
    np.testing.assert_allclose(
        b, [max(xy[:, 0].min(), 0), max(xy[:, 1].min(), 0),
            min(xy[:, 0].max(), 128), min(xy[:, 1].max(), 96)], atol=1e-4)
    # the image actually changed where the instance was/went
    assert (out != img).any()
    assert out_ann["labels"][0] == 3


def test_instaboost_horizontal_mirrors_center():
    img, ann = _img(), _square_ann(x1=10, y1=40, size=20)
    rng = np.random.RandomState(3)
    out, out_ann = instaboost(img, ann, rng,
                              action_candidate=("horizontal",),
                              action_prob=(1,), scale=(1.0, 1.0),
                              theta=(0, 0), color_prob=0.0, aug_ratio=1.0)
    b0, b1 = ann["bboxes"][0], out_ann["bboxes"][0]
    c0x = (b0[0] + b0[2]) / 2
    c1x = (b1[0] + b1[2]) / 2
    assert abs((127 - c0x) - c1x) < 1.5  # x center mirrored about W-1
    assert abs((b0[1] + b0[3]) / 2 - (b1[1] + b1[3]) / 2) < 1e-3


def test_instaboost_hflag_appearance_guided_runs():
    img, ann = _img(), _square_ann()
    out, out_ann = instaboost(img, ann, np.random.RandomState(4),
                              hflag=True, aug_ratio=1.0, color_prob=0.0)
    assert out_ann["bboxes"].shape == (1, 4)
    assert out.shape == img.shape


def test_instaboost_from_cfg_reference_dict():
    """The exact dict from the reference config resolves and applies
    (mask_rcnn_r50_fpn_instaboost_4x_coco.py:5-16)."""
    cfg = dict(type="InstaBoost",
               action_candidate=("normal", "horizontal", "skip"),
               action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
               theta=(-1, 1), color_prob=0.5, hflag=False, aug_ratio=0.5)
    fn = instaboost_from_cfg(cfg)
    img, ann = _img(), _square_ann()
    hit = False
    for seed in range(8):
        out, out_ann = fn(img, ann, np.random.RandomState(seed))
        assert out.shape == img.shape and len(out_ann["labels"]) <= 1
        hit = hit or (out != img).any()
    assert hit  # aug_ratio=0.5 fires within 8 seeds


# --------------------------------------------------------------------- albu

def test_color_transforms_preserve_shape_dtype():
    img = _img()
    rng = np.random.RandomState(0)
    for out in [random_brightness_contrast(img, rng),
                rgb_shift(img, rng), hue_saturation_value(img, rng),
                jpeg_compression(img, rng), channel_shuffle(img, rng),
                blur(img, rng), median_blur(img, rng)]:
        assert out.shape == img.shape and out.dtype == np.uint8


def test_brightness_contrast_formula():
    """brightness_by_max=True semantics: img*alpha + beta*255."""
    img = np.full((4, 4, 3), 100, np.uint8)

    class FixedRng:
        def __init__(self, vals):
            self.vals = list(vals)

        def uniform(self, lo, hi):
            return self.vals.pop(0)

    out = random_brightness_contrast(img, FixedRng([0.2, 0.1]),
                                     brightness_limit=(0.1, 0.3),
                                     contrast_limit=(0.1, 0.3))
    np.testing.assert_array_equal(out, np.clip(100 * 1.2 + 0.1 * 255, 0,
                                               255).astype(np.uint8))


def test_shift_scale_rotate_shifts_boxes():
    img = _img()
    boxes = np.array([[30, 20, 60, 50]], np.float32)

    class ShiftOnly:
        def uniform(self, lo, hi):
            return hi  # max shift, zero scale/rotate when limits are 0

    out, b = shift_scale_rotate(img, boxes, ShiftOnly(),
                                shift_limit=0.125, scale_limit=0.0,
                                rotate_limit=0)
    np.testing.assert_allclose(b[0], [30 + 0.125 * 128, 20 + 0.125 * 96,
                                      60 + 0.125 * 128, 50 + 0.125 * 96],
                               atol=1e-3)
    assert out.shape == img.shape


def test_albu_compose_reference_config_and_filtering():
    """The full albu_example transform list builds and runs; a box
    pushed off the frame by max shift is dropped (filter_lost_elements,
    transforms.py:1346-1352)."""
    transforms = [
        dict(type="ShiftScaleRotate", shift_limit=0.0625, scale_limit=0.0,
             rotate_limit=0, interpolation=1, p=0.5),
        dict(type="RandomBrightnessContrast", brightness_limit=[0.1, 0.3],
             contrast_limit=[0.1, 0.3], p=0.2),
        dict(type="OneOf", transforms=[
            dict(type="RGBShift", r_shift_limit=10, g_shift_limit=10,
                 b_shift_limit=10, p=1.0),
            dict(type="HueSaturationValue", hue_shift_limit=20,
                 sat_shift_limit=30, val_shift_limit=20, p=1.0)], p=0.1),
        dict(type="JpegCompression", quality_lower=85, quality_upper=95,
             p=0.2),
        dict(type="ChannelShuffle", p=0.1),
        dict(type="OneOf", transforms=[
            dict(type="Blur", blur_limit=3, p=1.0),
            dict(type="MedianBlur", blur_limit=3, p=1.0)], p=0.1),
    ]
    alb = albu_from_cfg(dict(type="Albu", transforms=transforms,
                             bbox_params=dict(type="BboxParams",
                                              format="pascal_voc",
                                              label_fields=["gt_labels"],
                                              min_visibility=0.0,
                                              filter_lost_elements=True)))
    img, ann = _img(), _square_ann()
    out, out_ann = alb(img, ann, np.random.RandomState(0))
    assert out.shape == img.shape
    assert len(out_ann["labels"]) == len(out_ann["bboxes"])

    # a near-edge box + guaranteed max shift falls out of frame -> dropped
    big = Albu([dict(type="ShiftScaleRotate", shift_limit=0.9,
                     scale_limit=0.0, rotate_limit=0, p=1.0)],
               min_visibility=0.3)

    class MaxShift:
        def rand(self):
            return 0.0  # always fire

        def uniform(self, lo, hi):
            return hi

    img2 = _img()
    ann2 = dict(bboxes=np.array([[100, 70, 126, 94]], np.float32),
                labels=np.array([1], np.int32),
                masks=[[[100.0, 70, 126, 70, 126, 94, 100, 94]]])
    _, dropped = big(img2, ann2, MaxShift())
    assert len(dropped["labels"]) == 0 and len(dropped["masks"]) == 0


@pytest.mark.full
def test_train_detector_cli_instaboost_albu(tmp_path):
    """Both augmentations reachable from the real CLI on a mask family
    (the reference applies InstaBoost to COCO mask configs,
    configs/instaboost/mask_rcnn_r50_fpn_instaboost_4x_coco.py)."""
    sys.path.insert(0, os.path.dirname(__file__))
    try:
        from test_coco import make_coco
    finally:
        sys.path.pop(0)
    repo = os.path.join(os.path.dirname(__file__), "..")
    ann_path, img_dir = make_coco(str(tmp_path / "coco"), n=4, seed=5)
    work = str(tmp_path / "work")
    r = subprocess.run(
        [sys.executable, "tools/train_detector.py", "--family", "mask_rcnn",
         "--mini", "--cpu", "--coco-train", ann_path, "--coco-val", ann_path,
         "--coco-img-prefix", img_dir, "--work-dir", work, "--epochs", "1",
         "--instaboost", "--albu"],
        capture_output=True, text=True, cwd=repo, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    row = json.loads(open(os.path.join(work, "train_log.jsonl")).read()
                     .splitlines()[0])
    assert np.isfinite(row["loss"])
