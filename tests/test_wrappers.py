"""ClassBalancedDataset repeat-factor sampling (reference
mmdet/datasets/dataset_wrappers.py, arXiv:1908.03195 heuristic)."""

import math

import numpy as np

from aod_meh_hua_tpu.data import ClassBalancedDataset


class _FakeDataset:
    """10 images: category 0 in every image, category 1 only in image 3,
    image 7 empty."""

    def __init__(self):
        self.labels = [[0]] * 10
        self.labels[3] = [0, 1]
        self.labels[7] = []

    def __len__(self):
        return 10

    def img_path(self, idx):
        return f"/img/{idx}.jpg"

    def aspect_flag(self, idx):
        return idx % 2

    def get_ann_info(self, idx):
        return {"labels": np.asarray(self.labels[idx], np.int64),
                "bboxes": np.zeros((len(self.labels[idx]), 4), np.float32)}


def test_repeat_factors_sqrt_rule():
    ds = ClassBalancedDataset(_FakeDataset(), oversample_thr=0.4)
    # f(0) = 9/10 -> r = 1;  f(1) = 1/10 -> r = sqrt(0.4/0.1) = 2
    # image 3 appears ceil(2) = 2x, others (incl. the empty one) 1x
    assert len(ds) == 11
    assert ds.repeat_indices.count(3) == 2
    assert ds.repeat_indices.count(7) == 1
    # protocol passthrough follows the expanded index list
    i = ds.repeat_indices.index(3)
    assert ds.img_path(i) == "/img/3.jpg"
    assert list(ds.get_ann_info(i)["labels"]) == [0, 1]
    assert ds.aspect_flag(i) == 1


def test_no_oversampling_above_threshold():
    ds = ClassBalancedDataset(_FakeDataset(), oversample_thr=0.05)
    assert len(ds) == 10  # every frequency >= thr -> all factors 1


def test_empty_images_as_background_category():
    # filter_empty_gt=False: the empty image forms its own category with
    # f = 1/10 -> r = sqrt(0.4/0.1) = 2 (dataset_wrappers.py:164-166)
    ds = ClassBalancedDataset(_FakeDataset(), oversample_thr=0.4,
                              filter_empty_gt=False)
    assert ds.repeat_indices.count(7) == 2
    assert len(ds) == 12


def test_ceil_of_fractional_factor():
    # category 1 in 2/10 images, thr 0.3 -> r = sqrt(1.5) ~ 1.22 -> ceil 2
    fake = _FakeDataset()
    fake.labels[5] = [0, 1]
    ds = ClassBalancedDataset(fake, oversample_thr=0.3)
    r = max(1.0, math.sqrt(0.3 / 0.2))
    assert math.ceil(r) == 2
    assert ds.repeat_indices.count(3) == 2
    assert ds.repeat_indices.count(5) == 2
