"""Dataset wrappers beyond repeat/concat (those live in the loader and
ConcatVOC respectively).

Behavioral parity target (reference, /root/reference):
* mmdet/datasets/dataset_wrappers.py ClassBalancedDataset — LVIS-style
  repeat-factor sampling (Gupta et al., arXiv:1908.03195):
  f(c) = fraction of images containing category c;
  r(c) = max(1, sqrt(thr / f(c)));
  r(I) = max_{c in I} r(c); each image appears ceil(r(I)) times.
  Empty images count as a synthetic background category when
  filter_empty_gt=False (dataset_wrappers.py:164-166).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import List


class ClassBalancedDataset:
    """Loader-protocol wrapper: exposes img_path / aspect_flag /
    get_ann_info / __len__ over the repeat-expanded index list, so it
    drops into TrainLoader / EvalLoader unchanged."""

    def __init__(self, dataset, oversample_thr: float,
                 filter_empty_gt: bool = True):
        self.dataset = dataset
        self.oversample_thr = oversample_thr
        self.filter_empty_gt = filter_empty_gt
        factors = self._repeat_factors(dataset, oversample_thr)
        self.repeat_indices: List[int] = []
        for idx, rf in enumerate(factors):
            self.repeat_indices.extend([idx] * math.ceil(rf))

    def _img_cats(self, idx: int):
        return set(int(l) for l in self.dataset.get_ann_info(idx)["labels"])

    def _repeat_factors(self, dataset, thr: float) -> List[float]:
        n = len(dataset)
        freq = defaultdict(int)
        per_img = []
        bg_cat = -1  # synthetic background id for empty images
        for i in range(n):
            cats = self._img_cats(i)
            if not cats and not self.filter_empty_gt:
                cats = {bg_cat}
            per_img.append(cats)
            for c in cats:
                freq[c] += 1
        cat_repeat = {c: max(1.0, math.sqrt(thr / (v / n)))
                      for c, v in freq.items()}
        return [max((cat_repeat[c] for c in cats), default=1.0)
                for cats in per_img]

    def __len__(self) -> int:
        return len(self.repeat_indices)

    def img_path(self, idx: int) -> str:
        return self.dataset.img_path(self.repeat_indices[idx])

    def aspect_flag(self, idx: int):
        return self.dataset.aspect_flag(self.repeat_indices[idx])

    def get_ann_info(self, idx: int) -> dict:
        return self.dataset.get_ann_info(self.repeat_indices[idx])
