"""AL run log analysis (reference tools/analysis_tools/analyze_logs.py).

Digests a work dir's metrics.json + per-cycle npys into the mAP-vs-budget
curve and acquisition statistics.
"""

import argparse
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("work_dir")
    args = ap.parse_args()

    mpath = os.path.join(args.work_dir, "metrics.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            metrics = json.load(f)
        print("cycle  n_labeled   mAP")
        for m in metrics:
            print(f"{m['cycle']:>5d}  {m['n_labeled']:>9d}   {m['mAP']:.4f}")
    else:
        print("no metrics.json found")

    cycle = 1
    while True:
        upath = os.path.join(args.work_dir, f"Unc_{cycle}.npy")
        if not os.path.exists(upath):
            break
        unc = np.load(upath)
        nz = unc[unc > 0]
        print(
            f"Unc_{cycle}: n={len(unc)} zeros={np.sum(unc == 0)} "
            f"mean={unc.mean():.4f} p50={np.median(unc):.4f} "
            f"p95={np.percentile(unc, 95):.4f} max={unc.max():.4f}"
            + (f" (nonzero mean {nz.mean():.4f})" if len(nz) else "")
        )
        cycle += 1


if __name__ == "__main__":
    main()
