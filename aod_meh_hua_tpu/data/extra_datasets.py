"""WIDER Face and DeepFashion datasets — the remaining reference
dataset classes (Cityscapes arrives in COCO form through
tools/dataset_converters/cityscapes.py, matching the reference's
workflow).

Behavioral parity targets (reference, /root/reference):
* mmdet/datasets/wider_face.py:11 (WIDERFaceDataset: VOC-XML-converted
  WIDER Face — single 'face' class, image files under the per-event
  `folder` recorded in each XML).
* mmdet/datasets/deepfashion.py:6 (DeepFashionDataset: CocoDataset with
  the 15 fashion classes).
"""

from __future__ import annotations

import os.path as osp

from .coco import CocoDataset
from .voc import VOCDataset

DEEPFASHION_CLASSES = (
    "top", "skirt", "leggings", "dress", "outer", "pants", "bag",
    "neckwear", "headwear", "eyeglass", "belt", "footwear", "hair",
    "skin", "face",
)


class WIDERFaceDataset(VOCDataset):
    """WIDER Face in PASCAL-VOC XML form (the sovrasov conversion the
    reference consumes): classes = ('face',) and the image lives under
    the event `folder` named in its XML."""

    def __init__(self, ann_file: str, img_prefix: str, **kwargs):
        kwargs.setdefault("classes", ("face",))
        super().__init__(ann_file, img_prefix, **kwargs)

    def img_path(self, idx: int) -> str:
        img_id = self.img_ids[idx]
        root = self._xml_root(img_id)
        folder = root.find("folder")
        sub = folder.text if folder is not None else ""
        return osp.join(self.img_prefix, "JPEGImages", sub, f"{img_id}.jpg")


class DeepFashionDataset(CocoDataset):
    def __init__(self, ann_file: str, img_prefix: str, **kwargs):
        kwargs.setdefault("classes", DEEPFASHION_CLASSES)
        super().__init__(ann_file, img_prefix, **kwargs)
