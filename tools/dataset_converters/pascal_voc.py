#!/usr/bin/env python
"""PASCAL VOC -> COCO-format instances JSON converter.

Behavioral parity target (reference, /root/reference):
* tools/dataset_converters/pascal_voc.py — converts the VOC XML splits
  into COCO-style annotation files (the reference emits its pickle
  "middle format"; COCO JSON here so the output feeds data/coco.py and
  every --coco-train consumer directly). `difficult` objects become
  ignore=1 entries, as the reference keeps them flagged.

Usage:
  python tools/dataset_converters/pascal_voc.py <VOCdevkit/VOC2007> \
      --split ImageSets/Main/trainval.txt --out voc07_trainval.json
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from aod_meh_hua_tpu.data.voc import VOC_CLASSES, VOCDataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("voc_root", help="e.g. .../VOCdevkit/VOC2007")
    ap.add_argument("--split", default="ImageSets/Main/trainval.txt")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    ds = VOCDataset(osp.join(args.voc_root, args.split), args.voc_root,
                    test_mode=True)
    images, annotations = [], []
    ann_id = 1
    for idx in range(len(ds)):
        w, h = ds.image_size(idx)
        img_id = idx + 1
        images.append(dict(
            id=img_id, width=w, height=h,
            file_name=osp.join("JPEGImages", f"{ds.img_ids[idx]}.jpg")))
        ann = ds.get_ann_info(idx)
        rows = [(ann["bboxes"], ann["labels"], 0),
                (ann["bboxes_ignore"], ann["labels_ignore"], 1)]
        for boxes, labels, ignore in rows:
            for box, label in zip(boxes, labels):
                x1, y1, x2, y2 = [float(v) for v in box]
                annotations.append(dict(
                    id=ann_id, image_id=img_id,
                    category_id=int(label) + 1,
                    bbox=[x1, y1, x2 - x1, y2 - y1],
                    area=(x2 - x1) * (y2 - y1), iscrowd=0,
                    ignore=ignore))
                ann_id += 1
    out = dict(images=images, annotations=annotations,
               categories=[dict(id=i + 1, name=c)
                           for i, c in enumerate(VOC_CLASSES)])
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"{len(images)} images, {len(annotations)} boxes -> {args.out}")


if __name__ == "__main__":
    main()
