"""Legacy-checkpoint upgrade surgery + deployment archive packaging
(reference tools/model_converters/upgrade_model_version.py /
upgrade_ssd_version.py and tools/deployment/mmdet2torchserve.py
analogs)."""

import json
import os
import subprocess
import sys
import tarfile

import numpy as np
import pytest

from aod_meh_hua_tpu.models.upgrade import (reorder_cls_channel,
                                            truncate_cls_channel,
                                            truncate_reg_channel,
                                            upgrade_ssd_state_dict,
                                            upgrade_state_dict)

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run(args, timeout=600):
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, cwd=REPO, timeout=timeout)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    return r.stdout


# ------------------------------------------------------- channel surgery

def test_reorder_cls_bias_moves_bg_last():
    # 1.x bg-first [bg, c1, c2] -> 2.x bg-last [c1, c2, bg]  (:45-48)
    out = reorder_cls_channel(np.array([9.0, 1.0, 2.0]), num_classes=3)
    np.testing.assert_array_equal(out, [1.0, 2.0, 9.0])


def test_reorder_cls_conv_weight_per_anchor_group():
    # conv_cls with 2 anchors x 3 classes: each anchor's group rotates
    # independently (:52-56)
    w = np.arange(2 * 3 * 4).reshape(6, 4).astype(np.float32)
    out = reorder_cls_channel(w, num_classes=3)
    expect = w.reshape(2, 3, 4)[:, [1, 2, 0]].reshape(6, 4)
    np.testing.assert_array_equal(out, expect)


def test_reorder_fc_cls_exact_numclasses():
    w = np.arange(3 * 5).reshape(3, 5).astype(np.float32)
    out = reorder_cls_channel(w, num_classes=3)
    np.testing.assert_array_equal(out, w[[1, 2, 0]])


def test_reorder_agnostic_passthrough():
    w = np.ones((7, 5), np.float32)  # 7 % 3 != 0 -> untouched (:60-61)
    np.testing.assert_array_equal(reorder_cls_channel(w, 3), w)


def test_truncate_reg_reference_asymmetry():
    """The reference's own bias/weight asymmetry is preserved verbatim
    (upgrade_model_version.py:94-96 vs :103-106): bias keeps the FIRST
    C-1 groups, weight drops group 0."""
    b = np.arange(3 * 4).astype(np.float32)  # 3 classes x 4 deltas
    out_b = truncate_reg_channel(b, num_classes=3)
    np.testing.assert_array_equal(out_b, b[:8])  # first 2 groups
    w = np.arange(3 * 4 * 2).reshape(12, 2).astype(np.float32)
    out_w = truncate_reg_channel(w, num_classes=3)
    np.testing.assert_array_equal(out_w, w[4:])  # drops group 0


def test_truncate_cls_mask_logits():
    w = np.arange(3 * 2 * 1 * 1).reshape(3, 2, 1, 1).astype(np.float32)
    out = truncate_cls_channel(w, num_classes=3)
    np.testing.assert_array_equal(out, w[1:])
    b = np.arange(3).astype(np.float32)
    np.testing.assert_array_equal(truncate_cls_channel(b, 3), b[:2])


# --------------------------------------------------- whole-dict upgrades

def test_upgrade_state_dict_two_stage_and_renames():
    sd = {
        "bbox_head.fc_cls.bias": np.array([9.0, 1.0, 2.0]),
        "bbox_head.fc_reg.bias": np.arange(12).astype(np.float32),
        "backbone.conv1.weight": np.ones((4, 3, 7, 7), np.float32),
    }
    out = upgrade_state_dict(sd, num_classes=3, is_two_stage=True)
    # roi_head. prefix (:143-145) + cls reorder + reg truncate applied
    assert "roi_head.bbox_head.fc_cls.bias" in out
    np.testing.assert_array_equal(out["roi_head.bbox_head.fc_cls.bias"],
                                  [1.0, 2.0, 9.0])
    assert out["roi_head.bbox_head.fc_reg.bias"].shape == (8,)
    assert "backbone.conv1.weight" in out  # untouched


def test_upgrade_retina_legacy_convmodule_rename():
    sd = {"bbox_head.cls_convs.0.weight": np.ones((4, 4, 3, 3), np.float32),
          "bbox_head.cls_convs.0.bias": np.zeros(4, np.float32)}
    out = upgrade_state_dict(sd, num_classes=3, upgrade_retina=True)
    assert set(out) == {"bbox_head.cls_convs.0.conv.weight",
                        "bbox_head.cls_convs.0.conv.bias"}  # (:171-179)


def test_upgrade_rpn_flag_controls_rpn_cls():
    sd = {"rpn_head.rpn_cls.bias": np.array([9.0, 1.0, 2.0])}
    old = upgrade_state_dict(dict(sd), num_classes=3, upgrade_rpn=True)
    new = upgrade_state_dict(dict(sd), num_classes=3, upgrade_rpn=False)
    np.testing.assert_array_equal(old["rpn_head.rpn_cls.bias"],
                                  [1.0, 2.0, 9.0])  # <2.5.0: reorder
    np.testing.assert_array_equal(new["rpn_head.rpn_cls.bias"],
                                  [9.0, 1.0, 2.0])  # >=2.5.0: untouched


def test_upgrade_ssd_layout_renames():
    sd = {
        "neck.extra.0.weight": np.ones(1, np.float32),
        "neck.extra.3.bias": np.ones(1, np.float32),
        "backbone.l2_norm.scale": np.ones(1, np.float32),
        # key[:21] + '.0' + key[21:] (upgrade_ssd_version.py:35-36)
        "bbox_head.cls_convs.0.weight": np.ones(1, np.float32),
        "backbone.features.0.weight": np.ones(1, np.float32),
    }
    out = upgrade_ssd_state_dict(sd)
    assert "neck.extra_layers.0.0.conv.weight" in out
    assert "neck.extra_layers.1.1.conv.bias" in out
    assert "neck.l2_norm.weight" in out
    assert "backbone.features.0.weight" in out
    key = "bbox_head.cls_convs.0.weight"
    assert key[:21] + ".0" + key[21:] in out


def test_upgrade_cli_roundtrip(tmp_path):
    src = str(tmp_path / "legacy.npz")
    np.savez(src, **{"bbox_head.fc_cls.bias": np.array([9.0, 1.0, 2.0])})
    dst = str(tmp_path / "modern.npz")
    out = _run(["tools/model_converters/upgrade_checkpoint.py", src, dst,
                "--num-classes", "3", "--two-stage"])
    assert "1 tensors" in out
    got = dict(np.load(dst))
    np.testing.assert_array_equal(got["roi_head.bbox_head.fc_cls.bias"],
                                  [1.0, 2.0, 9.0])


# ------------------------------------------------------ archive packaging

def test_package_and_load_archive(tmp_path):
    """export --mini -> package -> load_archive -> run the deserialized
    program: the full mar-analog loop (mmdet2torchserve.py:46-66)."""
    art = str(tmp_path / "det.bin")
    _run(["tools/deployment/export_model.py", "--mini", "--cpu",
          "--batch", "1", "--out", art])

    out = _run(["tools/deployment/package_model.py", art,
                "--output-folder", str(tmp_path / "store"),
                "--model-name", "retina_mini", "--voc-classes",
                "--score-thr", "0.4", "--mini", "--batch", "1"])
    assert "packaged ->" in out
    tar_path = str(tmp_path / "store" / "retina_mini.tar")
    assert os.path.exists(tar_path)

    # no-force clobber refusal (mmdet2torchserve --force semantics)
    r = subprocess.run([sys.executable, "tools/deployment/package_model.py",
                        art, "--output-folder", str(tmp_path / "store"),
                        "--model-name", "retina_mini"],
                       capture_output=True, text=True, cwd=REPO)
    assert r.returncode != 0 and "force" in (r.stderr + r.stdout)

    with tarfile.open(tar_path) as tf:
        manifest = json.loads(tf.extractfile("MANIFEST.json").read())
    assert manifest["score_thr"] == 0.4
    assert len(manifest["classes"]) == 20

    sys.path.insert(0, os.path.join(REPO, "tools", "deployment"))
    try:
        from package_model import load_archive
    finally:
        sys.path.pop(0)
    import jax.numpy as jnp

    from aod_meh_hua_tpu.engine import EvalBatch
    from aod_meh_hua_tpu.utils.config import tiny_test_config

    manifest2, programs = load_archive(tar_path)
    assert manifest2 == manifest and set(programs) == {"landscape"}
    h, w = tiny_test_config().canvas
    batch = EvalBatch(jnp.zeros((1, h, w, 3), jnp.float32),
                      jnp.zeros((1, 2), jnp.int32),
                      jnp.ones((1, 4), jnp.float32),
                      jnp.ones(1, dtype=bool))
    dets = programs["landscape"].call(batch)
    assert np.asarray(dets.boxes).ndim == 3  # [b, max_per_img, 4]

    # --- serve from the archive: ArchiveDetector (serve.py --archive),
    # incl. the portrait -> landscape letterbox fallback (only a
    # landscape artifact was packaged)
    import importlib.util

    assert manifest["geometry"]["batch"] == 1
    spec = importlib.util.spec_from_file_location(
        "serve_mod_arch", os.path.join(REPO, "tools", "deployment",
                                       "serve.py"))
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)
    det = serve_mod.ArchiveDetector(tar_path)
    rng = np.random.RandomState(0)
    land = rng.randint(0, 255, (60, 100, 3), np.uint8)
    port = rng.randint(0, 255, (100, 60, 3), np.uint8)
    per = det.predict_batch([land, port])
    assert len(per) == 2
    for per_class in per:
        assert len(per_class) == manifest["geometry"]["num_fg_classes"]
        for arr in per_class:
            assert arr.ndim == 2 and arr.shape[1] == 5
