"""COCO-format dataset: JSON instance annotations.

Behavioral parity targets (reference, /root/reference):
* mmdet/datasets/coco.py:1 (CocoDataset) — category-id remap to
  contiguous labels in CLASSES order, `iscrowd` annotations routed to
  the ignore lists, degenerate boxes (w/h < 1, area <= 0, or clipped
  empty) dropped, train-mode filtering of empty-gt / tiny images.
* mmdet/datasets/api_wrappers/coco_api.py — the pycocotools index this
  loader replaces with plain dict passes (no pycocotools dependency).

The class speaks the same dataset protocol as VOCDataset (img_path /
get_ann_info / image_size / aspect_flag / __len__), so every loader,
trainer, and the canvas cache work unchanged on COCO directories.
"""

from __future__ import annotations

import json
import os.path as osp
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

COCO_CLASSES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep",
    "cow", "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
)


class CocoDataset:
    """One COCO-style annotation JSON + an image root.

    classes: restrict/reorder to a subset (label i = classes[i]); by
    default every category named in the JSON, in json order, capped to
    the standard 80 names when they match.
    """

    def __init__(
        self,
        ann_file: str,
        img_prefix: str,
        classes: Optional[Sequence[str]] = None,
        test_mode: bool = False,
        min_size: int = 32,
        filter_empty_gt: bool = True,
    ):
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        with open(ann_file) as f:
            db = json.load(f)

        name_by_cat = {c["id"]: c["name"] for c in db.get("categories", [])}
        if classes is None:
            classes = tuple(name_by_cat[c["id"]] for c in db["categories"])
        self.classes = tuple(classes)
        # category-id -> contiguous label, CLASSES order (coco.py cat2label)
        self.cat2label: Dict[int, int] = {}
        for cid, name in name_by_cat.items():
            if name in self.classes:
                self.cat2label[cid] = self.classes.index(name)

        self._imgs = {im["id"]: im for im in db["images"]}
        self._anns_by_img: Dict[int, list] = {im_id: [] for im_id in self._imgs}
        for a in db.get("annotations", []):
            if a["image_id"] in self._anns_by_img:
                self._anns_by_img[a["image_id"]].append(a)

        self.img_ids = [im["id"] for im in db["images"]]
        if not test_mode:
            self.img_ids = [
                i for i in self.img_ids
                if self._keep(i, min_size, filter_empty_gt)
            ]
        self._ann_cache: Dict[int, dict] = {}

    def __len__(self):
        return len(self.img_ids)

    def _keep(self, img_id: int, min_size: int, filter_empty_gt: bool) -> bool:
        im = self._imgs[img_id]
        if min(im["width"], im["height"]) < min_size:
            return False
        if not filter_empty_gt:
            return True
        return any(a.get("category_id") in self.cat2label
                   and not a.get("iscrowd", 0) and not a.get("ignore", 0)
                   for a in self._anns_by_img[img_id])

    def img_path(self, idx: int) -> str:
        return osp.join(self.img_prefix, self._imgs[self.img_ids[idx]]["file_name"])

    def image_size(self, idx: int) -> Tuple[int, int]:
        im = self._imgs[self.img_ids[idx]]
        return im["width"], im["height"]

    def aspect_flag(self, idx: int) -> int:
        w, h = self.image_size(idx)
        return int(w / h > 1)

    def get_ann_info(self, idx: int) -> dict:
        img_id = self.img_ids[idx]
        if img_id in self._ann_cache:
            return self._ann_cache[img_id]
        im = self._imgs[img_id]
        W, H = im["width"], im["height"]
        bboxes, labels, bboxes_ig, labels_ig, masks = [], [], [], [], []
        for a in self._anns_by_img[img_id]:
            if a.get("ignore", 0):
                continue  # coco.py:_parse_ann_info drops ignore flags
            x1, y1, w, h = a["bbox"]
            # clip to image, drop degenerate (coco.py inter_w/inter_h)
            inter_w = max(0.0, min(x1 + w, W) - max(x1, 0))
            inter_h = max(0.0, min(y1 + h, H) - max(y1, 0))
            if inter_w * inter_h == 0:
                continue
            if a.get("area", w * h) <= 0 or w < 1 or h < 1:
                continue
            if a["category_id"] not in self.cat2label:
                continue
            box = [x1, y1, x1 + w, y1 + h]
            label = self.cat2label[a["category_id"]]
            if a.get("iscrowd", 0):
                bboxes_ig.append(box)
                labels_ig.append(label)
            else:
                bboxes.append(box)
                labels.append(label)
                # polygon instance masks (coco.py _parse_ann_info
                # gt_masks_ann); RLE crowd masks are routed to ignore
                # above, so only xy-interleaved polygon lists land here
                seg = a.get("segmentation")
                masks.append([p for p in seg if len(p) >= 6]
                             if isinstance(seg, list) else [])
        ann = dict(
            # width/height ride along for mask rasterization at eval
            # (segm mAP pastes dets + gt polygons at image resolution)
            width=W,
            height=H,
            masks=masks,
            bboxes=(np.array(bboxes, np.float32).reshape(-1, 4)
                    if bboxes else np.zeros((0, 4), np.float32)),
            labels=np.array(labels, np.int64) if labels else np.zeros((0,), np.int64),
            bboxes_ignore=(np.array(bboxes_ig, np.float32).reshape(-1, 4)
                           if bboxes_ig else np.zeros((0, 4), np.float32)),
            labels_ignore=(np.array(labels_ig, np.int64)
                           if labels_ig else np.zeros((0,), np.int64)),
        )
        self._ann_cache[img_id] = ann
        return ann
