"""P / mPC / rPC summary of a robustness run (VOC metrics).

Port of the reference's get_voc_style_results
(/root/reference/tools/analysis_tools/robustness_eval.py:111-152): read
the per-(corruption, severity) eval output of test_robustness.py and
print Performance on clean data (P), mean Performance under Corruption
(mPC, severities 1-5), and relative Performance under Corruption
(rPC = mPC / P). The json layout mirrors the reference's pickle:
{corruption: {severity: [{'ap': ...} per class]}}.

  python tools/analysis/robustness_eval.py results.json [--aggregate benchmark|all]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def get_voc_style_results(filename, prints=("P", "mPC", "rPC"),
                          aggregate="benchmark"):
    assert aggregate in ("benchmark", "all")
    with open(filename) as f:
        eval_output = json.load(f)

    from aod_meh_hua_tpu.data.corruptions import BENCHMARK_CORRUPTIONS

    distortions = list(eval_output.keys())
    num_classes = len(next(iter(next(iter(eval_output.values())).values())))
    results = np.zeros((len(distortions), 6, num_classes), np.float32)
    for i, distortion in enumerate(distortions):
        for severity, per_class in eval_output[distortion].items():
            results[i, int(severity)] = [c["ap"] for c in per_class]

    p = results[0, 0, :]  # clean = severity 0 of the first corruption
    if aggregate == "benchmark":
        bench = [i for i, d in enumerate(distortions) if d in BENCHMARK_CORRUPTIONS]
        mpc = results[bench][:, 1:, :].mean(axis=(0, 1))
    else:
        mpc = results[:, 1:, :].mean(axis=(0, 1))
    rpc = mpc / np.maximum(p, 1e-12)

    out = {"P": float(p.mean()), "mPC": float(mpc.mean()), "rPC": float(rpc.mean())}
    if "P" in prints:
        print(f"Performance on Clean Data [P] in AP50 = {out['P']:0.3f}")
    if "mPC" in prints:
        print(f"Mean Performance under Corruption [mPC] in AP50 = {out['mPC']:0.3f}")
    if "rPC" in prints:
        print(f"Relative Performance under Corruption [rPC] in % = {out['rPC'] * 100:0.1f}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("filename", help="results json from test_robustness.py")
    ap.add_argument("--aggregate", default="benchmark", choices=["benchmark", "all"])
    ap.add_argument("--prints", nargs="+", default=["P", "mPC", "rPC"],
                    choices=["P", "mPC", "rPC"])
    args = ap.parse_args()
    get_voc_style_results(args.filename, prints=args.prints, aggregate=args.aggregate)


if __name__ == "__main__":
    main()
