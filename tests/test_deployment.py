"""Deployment-path tests: export a detector artifact and evaluate it
against a dataset through the deployed program only (reference
tools/deployment/{pytorch2onnx,test}.py analogs)."""

import os
import subprocess
import sys

from test_data import make_voc

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run(args, timeout=600):
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, cwd=REPO, timeout=timeout)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    return r.stdout


def test_export_then_eval_deployed(tmp_path):
    """export_model --mini -> test_exported: the full deployment loop
    (serialize eval step -> fresh process -> dataset sweep -> VOC mAP)
    without the framework's model code in the serving process path."""
    base, lst, ids = make_voc(str(tmp_path / "voc"), "VOC2007", n=6, seed=7)
    with open(os.path.join(base, "ImageSets/Main/test.txt"), "w") as f:
        f.write("\n".join(ids[:4]))

    art = str(tmp_path / "det.bin")
    out = _run(["tools/deployment/export_model.py", "--mini", "--cpu",
                "--batch", "2", "--out", art])
    assert "round-trip OK" in out
    assert os.path.getsize(art) > 1000

    out = _run(["tools/deployment/test_exported.py", art, "--mini", "--cpu",
                "--voc07", base, "--split", "test", "--batch", "2"])
    assert "mAP:" in out
    # random weights: the pipeline must still complete a full eval
    assert "evaluated" in out
