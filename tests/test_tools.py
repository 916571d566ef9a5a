"""CLI analysis-tool tests (subprocess, numpy-only — no model forward).

The reference ships these as untested scripts (SURVEY.md section 4);
here each gets an end-to-end drive on the synthetic VOC fixture.
"""

import json
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


def test_error_analysis_cli(voc_with_results, tmp_path):
    """Progressive error decomposition: perfect detections give
    C75=C50=...=1.0 for detected classes; monotone non-decreasing gains."""
    import json

    base, pkl, n = voc_with_results
    out = str(tmp_path / "err")
    stdout = _run(["tools/analysis/error_analysis.py", pkl, out, "--voc", base])
    assert "mean" in stdout
    table = json.load(open(os.path.join(out, "error_analysis.json")))
    keys = ("C75", "C50", "Loc", "Cls", "BG", "FN")
    for cls_name, row in table.items():
        vals = [row[k] for k in keys]
        assert all(b >= a - 1e-6 for a, b in zip(vals, vals[1:])), (cls_name, vals)
        assert row["FN"] == 1.0


def test_corruptions_library():
    """Every benchmark + holdout corruption: valid uint8 output, shape
    preserved, deterministic under a fixed rng, and actually changes
    the image."""
    from aod_meh_hua_tpu.data.corruptions import (
        BENCHMARK_CORRUPTIONS, HOLDOUT_CORRUPTIONS, corrupt,
    )

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3), np.uint8)
    for name in BENCHMARK_CORRUPTIONS + HOLDOUT_CORRUPTIONS:
        for severity in (1, 3, 5):
            a = corrupt(img, name, severity, np.random.RandomState(7))
            b = corrupt(img, name, severity, np.random.RandomState(7))
            assert a.shape == img.shape and a.dtype == np.uint8, name
            np.testing.assert_array_equal(a, b, err_msg=f"{name} nondeterministic")
            assert not np.array_equal(a, img), f"{name}@{severity} is identity"
    np.testing.assert_array_equal(corrupt(img, "fog", 0, rng), img)  # severity 0


def test_robustness_eval_math(tmp_path):
    """P/mPC/rPC computation on a fabricated results file (the
    reference's get_voc_style_results semantics)."""
    import json
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "robustness_eval", os.path.join(REPO, "tools/analysis/robustness_eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # 2 corruptions x severities 0..5 x 2 classes
    mk = lambda ap: [{"ap": ap}, {"ap": ap}]
    data = {
        "gaussian_noise": {"0": mk(0.8), "1": mk(0.6), "2": mk(0.5),
                           "3": mk(0.4), "4": mk(0.3), "5": mk(0.2)},
        "fog": {"0": mk(0.8), "1": mk(0.7), "2": mk(0.6),
                "3": mk(0.5), "4": mk(0.4), "5": mk(0.3)},
    }
    f = str(tmp_path / "r.json")
    with open(f, "w") as fh:
        json.dump(data, fh)
    out = mod.get_voc_style_results(f, aggregate="benchmark")
    assert out["P"] == pytest.approx(0.8)
    assert out["mPC"] == pytest.approx((0.6 + 0.5 + 0.4 + 0.3 + 0.2 +
                                        0.7 + 0.6 + 0.5 + 0.4 + 0.3) / 10)
    assert out["rPC"] == pytest.approx(out["mPC"] / 0.8)


def test_test_robustness_cli(voc_with_results, tmp_path):
    """End-to-end robustness drive: mini model, 2 corruptions, clean +
    severity-1, through the real CLI."""
    base, pkl, n = voc_with_results
    out = str(tmp_path / "robust.json")
    stdout = _run(["tools/analysis/test_robustness.py", "--voc07", base,
                   "--mini", "--cpu", "--batch-size", "4", "--out", out,
                   "--corruptions", "gaussian_noise", "brightness",
                   "--severities", "0", "1"])
    assert "Relative Performance under Corruption" in stdout
    import json

    data = json.load(open(out))
    assert set(data) == {"gaussian_noise", "brightness"}
    assert set(data["gaussian_noise"]) == {"0", "1"}
    assert len(data["brightness"]["1"]) == 6  # tiny config: 6 classes


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


def test_rpn_to_fast_rcnn_cli_workflow(voc_with_results, tmp_path):
    """The reference's two-step detached pipeline end-to-end through the
    real CLIs (configs/rpn/* -> proposal dump -> configs/fast_rcnn/*):
    train an RPN, dump proposals with tools/gen_proposals.py, train
    Fast R-CNN from the .npz. Mini models, one epoch each."""
    base, _, _ = voc_with_results
    test_txt = os.path.join(base, "ImageSets/Main/test.txt")
    if not os.path.exists(test_txt):
        ids = [l.strip() for l in
               open(os.path.join(base, "ImageSets/Main/trainval.txt"))]
        with open(test_txt, "w") as f:
            f.write("\n".join(ids[:2]))
    work = str(tmp_path / "rpnwork")
    out = _run(["tools/train_detector.py", "--family", "rpn", "--mini",
                "--cpu", "--voc07", base, "--work-dir", work,
                "--epochs", "1"])
    assert "mean loss" in out and "nan" not in out
    assert "mAP" in out  # AR@100 reported under the shared key
    ckpt = os.path.join(work, "rpn_final.ckpt")
    assert os.path.exists(ckpt)

    props = os.path.join(work, "proposals.npz")
    out = _run(["tools/gen_proposals.py", "--voc07", base,
                "--split", "ImageSets/Main/trainval.txt",
                "--checkpoint", ckpt, "--mini", "--cpu", "--out", props])
    assert "wrote" in out
    npz = np.load(props)
    assert len(npz.files) == 8  # one entry per trainval image
    assert npz["0"].shape[1] == 5  # [P, 5] boxes + scores

    work2 = str(tmp_path / "frcnnwork")
    out = _run(["tools/train_detector.py", "--family", "fast_rcnn",
                "--mini", "--cpu", "--voc07", base, "--work-dir", work2,
                "--epochs", "1", "--proposal-file", props,
                "--lr", "0.005"])
    assert "mean loss" in out and "nan" not in out
    assert os.path.exists(os.path.join(work2, "fast_rcnn_final.ckpt"))


def test_train_detector_cli(voc_with_results, tmp_path):
    """Generic zoo trainer (upstream tools/train.py equivalent): one FCOS
    mini epoch through the real CLI produces a finite loss, an eval mAP
    row, and a checkpoint."""
    base, _, _ = voc_with_results
    test_txt = os.path.join(base, "ImageSets/Main/test.txt")
    if not os.path.exists(test_txt):
        ids = [l.strip() for l in open(os.path.join(base, "ImageSets/Main/trainval.txt"))]
        with open(test_txt, "w") as f:
            f.write("\n".join(ids[:2]))
    work = str(tmp_path / "det")
    out = _run(["tools/train_detector.py", "--family", "fcos", "--mini",
                "--cpu", "--voc07", base, "--work-dir", work,
                "--epochs", "1"])
    assert "mean loss" in out and "nan" not in out
    assert "mAP" in out
    assert os.path.exists(os.path.join(work, "fcos_final.ckpt"))
    row = json.loads(open(os.path.join(work, "train_log.jsonl")).read().splitlines()[0])
    assert np.isfinite(row["loss"]) and "mAP" in row


def test_serve_cli(tmp_path):
    """HTTP serving tool (the reference's TorchServe deployment analog,
    tools/deployment/mmdet2torchserve.py + mmdet_handler.py): /ping
    health, raw-bytes and base64 POSTs return detection JSON."""
    import base64
    import socket
    import time
    import urllib.request

    import cv2

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools/deployment/serve.py"),
         "--family", "retinanet", "--mini", "--cpu", "--port", str(port),
         "--score-thr", "0.0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=REPO)
    try:
        health = None
        for _ in range(300):
            time.sleep(1)
            try:
                health = json.load(urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/ping", timeout=5))
                break
            except OSError:
                continue
        assert health == {"status": "Healthy"}
        img = (np.random.RandomState(0).rand(40, 80, 3) * 255).astype(np.uint8)
        _, buf = cv2.imencode(".jpg", img)
        for payload in (buf.tobytes(), base64.b64encode(buf.tobytes())):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predictions", data=payload,
                method="POST")
            out = json.load(urllib.request.urlopen(req, timeout=900))
            assert isinstance(out, list)
            for det in out:
                assert set(det) == {"class_name", "bbox", "score"}
                assert len(det["bbox"]) == 4
        # undecodable payload -> clean 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predictions", data=b"not-an-image",
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        proc.terminate()
        proc.wait(timeout=30)
