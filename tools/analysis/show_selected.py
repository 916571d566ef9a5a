"""Gallery of the images an AL cycle selected (ShowSelectedImg port).

Reference: /root/reference/mmdet/utils/functions.py:380-412 — after a
cycle, render every newly-acquired image (X_L_c minus X_L_{c-1}) with
its GT boxes and acquisition score into a visualization directory.
The reference re-runs the model per image to also dump per-anchor
uncertainty heatmaps; here detections are drawn only when --checkpoint
is given (the npy score is already persisted by the driver).

  python tools/analysis/show_selected.py --work-dir W --cycle 1 \
      --voc07 /data/VOC2007 [--voc12 ...] [--checkpoint ckpt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="render a cycle's newly selected images")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--cycle", type=int, required=True)
    ap.add_argument("--voc07", required=True)
    ap.add_argument("--voc12", default=None)
    ap.add_argument("--checkpoint", default=None, help="draw detections too")
    ap.add_argument("--mini", action="store_true", help="tiny model for --checkpoint")
    ap.add_argument("--score-thr", type=float, default=0.3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import cv2

    from aod_meh_hua_tpu.data import ConcatVOC, VOCDataset
    from aod_meh_hua_tpu.utils.visualize import draw_detections, save_image

    c = args.cycle
    x_l = np.load(os.path.join(args.work_dir, f"X_L_{c}.npy"))
    x_l_prev = np.load(os.path.join(args.work_dir, f"X_L_{c - 1}.npy"))
    unc = np.load(os.path.join(args.work_dir, f"Unc_{c}.npy"))
    new = np.setdiff1d(x_l, x_l_prev)

    datasets = [VOCDataset(os.path.join(args.voc07, "ImageSets/Main/trainval.txt"),
                           args.voc07)]
    if args.voc12:
        datasets.append(VOCDataset(
            os.path.join(args.voc12, "ImageSets/Main/trainval.txt"), args.voc12))
    pool = ConcatVOC(datasets)

    detector = None
    if args.checkpoint:
        import jax

        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        from aod_meh_hua_tpu.api import Detector, init_detector
        from aod_meh_hua_tpu.utils.config import RetinaNetConfig, tiny_test_config

        cfg = tiny_test_config() if args.mini else RetinaNetConfig()
        model, variables = init_detector(cfg, checkpoint=args.checkpoint)
        detector = Detector(cfg, model, variables)

    out_dir = os.path.join(args.work_dir, "visualization", f"cycle{c}")
    # rank of each new image among the cycle's acquisition scores
    order = (-unc).argsort()
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    for i in sorted(new.tolist(), key=lambda j: rank[j]):
        img = cv2.imread(pool.img_path(int(i)))
        ann = pool.get_ann_info(int(i))
        img = draw_detections(img, ann["bboxes"], ann["labels"])
        if detector is not None:
            per_class = detector(pool.img_path(int(i)))
            boxes, labels, scores = [], [], []
            for ci, arr in enumerate(per_class):
                for row in np.asarray(arr).reshape(-1, 5):
                    if row[4] >= args.score_thr:
                        boxes.append(row[:4])
                        labels.append(ci)
                        scores.append(row[4])
            if boxes:
                img = draw_detections(img, np.asarray(boxes),
                                      np.asarray(labels, np.int32),
                                      scores=np.asarray(scores))
        cv2.putText(img, f"unc={unc[i]:.4f} rank={rank[i]}", (8, 22),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 255, 255), 2, cv2.LINE_AA)
        name = os.path.splitext(os.path.basename(pool.img_path(int(i))))[0]
        save_image(img, os.path.join(out_dir, f"rank{rank[i]:05d}_{name}.jpg"))
    print(f"wrote {len(new)} selected-image renders to {out_dir}")


if __name__ == "__main__":
    main()
