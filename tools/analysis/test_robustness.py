"""Corruption-robustness benchmark: eval VOC mAP under the 15 benchmark
corruptions x severities 0-5.

VOC-scoped port of /root/reference/tools/analysis_tools/test_robustness.py
(:98-163 flags, :216-263 corruption sets + eval loop): for every
(corruption, severity) pair, decode each test image, corrupt it
(aod_meh_hua_tpu.data.corruptions — in-house re-implementations of the
Hendrycks benchmark; the reference uses the `imagecorruptions` package),
run the jitted eval step, and record per-class VOC AP. Severity 0 (clean)
runs once for the first corruption, like the reference (:256-262).
Results land as json consumable by robustness_eval.py (P / mPC / rPC).

  python tools/analysis/test_robustness.py --voc07 ... --checkpoint c.ckpt \
      --out robust.json [--corruptions benchmark] [--severities 0 1 2 3 4 5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="corruption robustness benchmark")
    p.add_argument("--voc07", required=True)
    p.add_argument("--split", default=None, help="image-id list (default test.txt)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--family", default="retinanet", choices=["retinanet", "ssd"])
    p.add_argument("--corruptions", nargs="+", default=["benchmark"],
                   help="set name (benchmark|all|noise|blur|weather|digital|"
                        "holdout|None) or explicit corruption names")
    p.add_argument("--severities", type=int, nargs="+", default=[0, 1, 2, 3, 4, 5])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", default="robustness_results.json")
    p.add_argument("--seed", type=int, default=20)
    p.add_argument("--final-prints", nargs="+", default=["P", "mPC", "rPC"],
                   choices=["P", "mPC", "rPC"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--mini", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("AOD_JAX_CACHE", "/tmp/jaxcache"))

    from aod_meh_hua_tpu.api import init_detector, _default_pipeline
    from aod_meh_hua_tpu.data import EvalLoader, PipelineConfig, VOCDataset
    from aod_meh_hua_tpu.data.corruptions import CORRUPTION_SETS, corrupt
    from aod_meh_hua_tpu.engine import detections_to_per_class, make_eval_step
    from aod_meh_hua_tpu.utils.config import (
        RetinaNetConfig, SSDConfig, tiny_test_config,
    )
    from aod_meh_hua_tpu.utils.voc_eval import eval_map

    if args.mini:
        cfg = tiny_test_config()
        pipe = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas,
                              device_normalize=True)
    else:
        cfg = SSDConfig() if args.family == "ssd" else RetinaNetConfig()
        pipe = _default_pipeline(cfg)

    if len(args.corruptions) == 1 and args.corruptions[0] in CORRUPTION_SETS:
        corruptions = list(CORRUPTION_SETS[args.corruptions[0]])
    elif args.corruptions == ["None"]:
        corruptions, args.severities = ["None"], [0]
    else:
        corruptions = args.corruptions

    split = args.split or os.path.join(args.voc07, "ImageSets/Main/test.txt")
    ds = VOCDataset(split, args.voc07, test_mode=True)
    annotations = [ds.get_ann_info(i) for i in range(len(ds))]
    model, variables = init_detector(cfg, checkpoint=args.checkpoint, seed=args.seed)
    steps = {o: make_eval_step(model, cfg.for_orientation(o))
             for o in ("landscape", "portrait")}

    def evaluate(corruption, severity):
        rng = np.random.RandomState(args.seed + severity)
        tf = None
        if severity > 0:
            tf = lambda img, i: corrupt(img, corruption, severity,
                                        np.random.RandomState(args.seed * 100003 + i))
        loader = EvalLoader(ds, np.arange(len(ds)), pipe,
                            batch_size=args.batch_size, transform_fn=tf)
        results, order = [], []
        for orientation, batch, idx in loader:
            dets = steps[orientation](variables, batch)
            results.extend(detections_to_per_class(
                dets, cfg.num_fg_classes, np.asarray(batch.valid)))
            order.extend(idx.tolist())
        anns = [annotations[i] for i in order]
        return eval_map(results, anns, iou_thr=0.5, mode="11points")

    aggregated = {}
    for ci, corruption in enumerate(corruptions):
        aggregated[corruption] = {}
        for severity in args.severities:
            if severity == 0 and ci > 0:
                # clean baseline only once (reference :256-262)
                aggregated[corruption]["0"] = aggregated[corruptions[0]]["0"]
                continue
            out = evaluate(corruption, severity)
            aggregated[corruption][str(severity)] = [
                {"ap": float(r["ap"])} for r in out["per_class"]]
            print(f"{corruption} severity {severity}: mAP {out['mAP']:.4f}",
                  flush=True)

    with open(args.out, "w") as f:
        json.dump(aggregated, f)
    print(f"wrote {args.out}")

    from robustness_eval import get_voc_style_results

    get_voc_style_results(args.out, prints=args.final_prints,
                          aggregate="all" if set(corruptions) -
                          set(CORRUPTION_SETS["benchmark"]) else "benchmark")


if __name__ == "__main__":
    main()
