#!/usr/bin/env python
"""Cityscapes -> COCO-format instances JSON converter.

Behavioral parity target (reference, /root/reference):
* tools/dataset_converters/cityscapes.py — walks gtFine/<split>, turns
  each city's instance annotations into COCO dicts with the 8
  Cityscapes instance classes, writes instancesonly_filtered_gtFine_
  <split>.json. The reference goes through the cityscapesscripts
  package; this standalone version reads the *_gtFine_polygons.json
  files directly (plain JSON polygon lists) so no extra dependency is
  needed. Group/crowd regions ('group' suffix classes) become
  iscrowd=1, matching the cityscapesscripts instancesonly protocol.

Usage:
  python tools/dataset_converters/cityscapes.py <cityscapes_root> \
      --out-dir <dir> [--splits train val]

Expects <root>/gtFine/<split>/<city>/*_gtFine_polygons.json and
<root>/leftImg8bit/<split>/<city>/*_leftImg8bit.png.
"""

import argparse
import glob
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

CLASSES = ("person", "rider", "car", "truck", "bus", "train",
           "motorcycle", "bicycle")


def polygon_bbox(poly):
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    x1, y1 = min(xs), min(ys)
    return [x1, y1, max(xs) - x1, max(ys) - y1]


def convert_split(root: str, split: str, out_file: str):
    images, annotations = [], []
    ann_id = 1
    pattern = osp.join(root, "gtFine", split, "*", "*_gtFine_polygons.json")
    for img_idx, gt_path in enumerate(sorted(glob.glob(pattern))):
        with open(gt_path) as f:
            gt = json.load(f)
        base = osp.basename(gt_path).replace("_gtFine_polygons.json", "")
        city = osp.basename(osp.dirname(gt_path))
        file_name = osp.join(split, city, f"{base}_leftImg8bit.png")
        img_id = img_idx + 1
        images.append(dict(id=img_id, file_name=file_name,
                           width=gt["imgWidth"], height=gt["imgHeight"]))
        for obj in gt.get("objects", []):
            label = obj["label"]
            crowd = 0
            if label.endswith("group"):
                label = label[: -len("group")]
                crowd = 1
            if label not in CLASSES:
                continue
            poly = obj["polygon"]
            if len(poly) < 3:
                continue
            bbox = polygon_bbox(poly)
            if bbox[2] < 1 or bbox[3] < 1:
                continue
            seg = [float(v) for xy in poly for v in xy]
            annotations.append(dict(
                id=ann_id, image_id=img_id,
                category_id=CLASSES.index(label) + 1, bbox=bbox,
                area=bbox[2] * bbox[3], iscrowd=crowd,
                segmentation=[seg]))
            ann_id += 1
    out = dict(
        images=images, annotations=annotations,
        categories=[dict(id=i + 1, name=c) for i, c in enumerate(CLASSES)])
    with open(out_file, "w") as f:
        json.dump(out, f)
    print(f"{split}: {len(images)} images, {len(annotations)} instances "
          f"-> {out_file}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="cityscapes root (gtFine + leftImg8bit)")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--splits", nargs="*", default=["train", "val"])
    args = ap.parse_args()
    out_dir = args.out_dir or osp.join(args.root, "annotations")
    os.makedirs(out_dir, exist_ok=True)
    for split in args.splits:
        convert_split(
            args.root, split,
            osp.join(out_dir,
                     f"instancesonly_filtered_gtFine_{split}.json"))


if __name__ == "__main__":
    main()
