"""Driver-level deep-ensemble baseline (--baseline ensemble): the
reference's CalEnsembleUnc experiment (apis/CalEnsembleUnc.py:86-181)
as an AL mode — N independently seeded members trained per cycle on the
same X_L, pool scored with the 3-member sigmoid MI instead of HUA."""

import os
import subprocess
import sys

import numpy as np
import pytest

from test_data import make_voc

cv2 = pytest.importorskip("cv2")

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_ensemble_baseline_cli(tmp_path):
    root = str(tmp_path / "voc")
    base, _lst, ids = make_voc(root, "VOC2007", n=14, seed=3)
    with open(os.path.join(base, "ImageSets/Main/test.txt"), "w") as f:
        f.write("\n".join(ids[:4]))

    work = str(tmp_path / "work")
    env = dict(os.environ)
    env.setdefault("AOD_JAX_CACHE", "/tmp/jaxcache_dist")
    r = subprocess.run(
        [sys.executable, "tools/train_retinanet.py", "--mini", "--cpu",
         "--voc07", base, "--work-dir", work,
         "--batch-size", "8", "--score-batch-size", "8",
         "--baseline", "ensemble", "--ensemble-size", "2",
         "--no-validate"],
        capture_output=True, text=True, cwd=REPO, timeout=900, env=env)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
    assert "ensemble member 2/2" in r.stdout

    x0 = np.load(os.path.join(work, "X_L_0.npy"))
    x1 = np.load(os.path.join(work, "X_L_1.npy"))
    unc = np.load(os.path.join(work, "Unc_1.npy"))
    assert len(x1) > len(x0)
    assert set(x0.tolist()) <= set(x1.tolist())
    # sigmoid-MI scores are continuous — no exact zeros, all finite
    assert np.isfinite(unc).all() and (unc != 0).any()


def test_ensemble_baseline_rejects_maxconf():
    from aod_meh_hua_tpu.al import ALDriver, ALPaths
    from aod_meh_hua_tpu.utils.config import (ALConfig, TrainConfig,
                                              tiny_test_config)
    import dataclasses

    al = dataclasses.replace(ALConfig(), use_max_conf="min")
    with pytest.raises(ValueError, match="maxconf"):
        ALDriver(tiny_test_config(), TrainConfig(), al,
                 ALPaths(voc07="/nonexistent", voc12=None, work_dir="/tmp/x"),
                 baseline="ensemble", validate=False, log=None)
