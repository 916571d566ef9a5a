"""Config loader tests: the reference-format file round-trips into the
dataclasses with the live experiment's values."""

import os

import pytest

from aod_meh_hua_tpu.utils.config import load_reference_config

REPO_CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "retinanet_voc.py")


def test_load_repo_config():
    model, train, al, ns = load_reference_config(REPO_CFG)
    assert model.num_classes == 20
    assert model.anchor.strides == (8, 16, 32, 64, 128)
    assert model.anchor.octave_base_scale == 4
    assert model.pos_iou_thr == 0.5 and model.neg_iou_thr == 0.4
    assert model.test.nms_pre == 1000 and model.test.max_per_img == 100
    assert model.test.score_thr == pytest.approx(0.05)
    assert model.hua.pool == "Entropy_NMS"
    assert model.hua.agg == "objectSum_scaleMax_classSum"
    assert train.lr == pytest.approx(0.001)
    assert train.weight_decay == pytest.approx(1e-4)
    assert train.batch_size == 2
    assert al.x_l_0_size == 16551 // 20
    assert al.x_s_size == 16551 // 40
    assert al.cycles == (0, 1, 2, 3, 4, 5, 6)
    assert al.x_l_repeat == 2


@pytest.mark.skipif(
    not os.path.exists("/root/reference/configs/_base_/Config_RetinaNet.py"),
    reason="reference tree not mounted",
)
def test_load_actual_reference_config():
    """The loader consumes the reference's own live config unchanged."""
    model, train, al, ns = load_reference_config(
        "/root/reference/configs/_base_/Config_RetinaNet.py"
    )
    assert model.num_classes == 20
    assert model.hua.agg == "objectSum_scaleMax_classSum"
    assert al.x_s_size == 16551 // 40
    assert train.batch_size == 2
