"""CLI analysis-tool tests (subprocess, numpy-only — no model forward).

The reference ships these as untested scripts (SURVEY.md section 4);
here each gets an end-to-end drive on the synthetic VOC fixture.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from test_data import make_voc

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def voc_with_results(tmp_path_factory):
    """Synthetic VOC + a results .pkl: perfect GT echoes for the first
    half of the split, empty detections for the rest."""
    root = str(tmp_path_factory.mktemp("toolvoc"))
    base, lst, ids = make_voc(root, "VOC2007", n=8, seed=5)
    test_list = os.path.join(base, "ImageSets/Main/test.txt")
    with open(test_list, "w") as f:
        f.write("\n".join(ids))

    sys.path.insert(0, REPO)
    from aod_meh_hua_tpu.data import VOCDataset

    ds = VOCDataset(test_list, base, test_mode=True)
    results = []
    for i in range(len(ds)):
        per_class = [np.zeros((0, 5), np.float32) for _ in range(20)]
        if i < len(ds) // 2:  # perfect detections
            ann = ds.get_ann_info(i)
            for box, lab in zip(ann["bboxes"], ann["labels"]):
                det = np.concatenate([box, [0.95]]).astype(np.float32)[None]
                per_class[int(lab)] = np.concatenate([per_class[int(lab)], det])
        results.append(per_class)
    pkl = os.path.join(root, "results.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(results, f)
    return base, pkl, len(ds)


def _run(args):
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_analyze_results_cli(voc_with_results, tmp_path):
    base, pkl, n = voc_with_results
    show = str(tmp_path / "show")
    out = _run(["tools/analysis/analyze_results.py", pkl, show,
                "--voc", base, "--topk", "3"])
    assert "per-image mAP" in out
    good = os.listdir(os.path.join(show, "good"))
    bad = os.listdir(os.path.join(show, "bad"))
    assert len(good) == 3 and len(bad) == 3
    # perfect-detection images rank good (mAP 1.0), empty ones bad (0.0)
    assert all("_1.000" in f for f in good), good
    assert all("_0.000" in f for f in bad), bad


def test_eval_metric_cli(voc_with_results):
    base, pkl, n = voc_with_results
    out = _run(["tools/analysis/eval_metric.py", pkl, "--voc", base])
    assert "mAP@0.5" in out


def test_show_selected_cli(voc_with_results, tmp_path):
    """ShowSelectedImg port: renders the cycle's newly acquired images."""
    base, pkl, n = voc_with_results
    work = str(tmp_path / "work")
    os.makedirs(work)
    np.save(os.path.join(work, "X_L_0.npy"), np.array([0, 1]))
    np.save(os.path.join(work, "X_L_1.npy"), np.array([0, 1, 3, 5]))
    np.save(os.path.join(work, "Unc_1.npy"), np.linspace(0, 1, n))
    out = _run(["tools/analysis/show_selected.py", "--work-dir", work,
                "--cycle", "1", "--voc07", base])
    assert "wrote 2 selected-image renders" in out
    files = os.listdir(os.path.join(work, "visualization", "cycle1"))
    assert len(files) == 2 and all(f.startswith("rank") for f in files)
