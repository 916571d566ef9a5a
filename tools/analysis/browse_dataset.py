"""Dump pipeline-processed samples with GT boxes drawn
(reference tools/misc/browse_dataset.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voc", required=True, help="path to .../VOC2007")
    ap.add_argument("--split", default=None)
    ap.add_argument("--out", default="browse_out")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--ssd", action="store_true", help="use the SSD warp pipeline")
    args = ap.parse_args()

    import cv2

    from aod_meh_hua_tpu.data import PipelineConfig, VOCDataset, prepare_sample
    from aod_meh_hua_tpu.data.pipeline import load_image

    split = args.split or os.path.join(args.voc, "ImageSets/Main/trainval.txt")
    ds = VOCDataset(split, args.voc)
    pipe = (PipelineConfig(img_scale=(300, 300), canvas=(300, 300), std=(1, 1, 1),
                           keep_ratio=False)
            if args.ssd else PipelineConfig())
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(min(args.n, len(ds))):
        img = load_image(ds.img_path(i))
        out = prepare_sample(img, ds.get_ann_info(i), pipe, rng=rng)
        vis = out["image"] * np.asarray(pipe.std) + np.asarray(pipe.mean)
        vis = np.clip(vis[..., ::-1], 0, 255).astype(np.uint8).copy()  # RGB -> BGR
        for box in out["gt_bboxes"].astype(int):
            cv2.rectangle(vis, (box[0], box[1]), (box[2], box[3]), (0, 255, 0), 2)
        cv2.imwrite(os.path.join(args.out, f"{i}.jpg"), vis)
    print(f"wrote {min(args.n, len(ds))} images to {args.out}/")


if __name__ == "__main__":
    main()
