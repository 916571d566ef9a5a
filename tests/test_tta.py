"""Test-time augmentation (engine/tta.py + Detector.tta).

Parity targets: reference datasets/pipelines/test_time_aug.py:10
(MultiScaleFlipAug), dense_test_mixins.py:71-143 (aug_test_bboxes),
core/bbox/transforms.py bbox_mapping_back flip geometry.
"""

import jax
import numpy as np
import pytest

from aod_meh_hua_tpu.api import Detector
from aod_meh_hua_tpu.data.pipeline import PipelineConfig, prepare_sample
from aod_meh_hua_tpu.engine import EvalBatch
from aod_meh_hua_tpu.engine.tta import (canvas_for_scale,
                                        make_tta_candidate_step)
from aod_meh_hua_tpu.models import init_retinanet
from aod_meh_hua_tpu.utils.config import tiny_test_config

CFG = tiny_test_config()


@pytest.fixture(scope="module")
def detector():
    model, variables = init_retinanet(CFG, jax.random.PRNGKey(3))
    pipe = PipelineConfig(img_scale=(250, 120), canvas=CFG.canvas,
                          device_normalize=True)
    return Detector(CFG, model, variables, pipeline=pipe)


def _img(seed=0, h=100, w=200):
    return np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)


def test_canvas_for_scale():
    assert canvas_for_scale((1000, 600)) == (608, 1024)
    assert canvas_for_scale((250, 120)) == (128, 256)


def test_identity_aug_matches_plain_eval(detector):
    """Single scale, no flip: the TTA path must reproduce the plain eval
    step exactly (same candidates, same rescale-then-NMS order)."""
    img = _img(1)
    plain = detector(img)
    tta = detector.tta(img, scales=[(250, 120)], flip=False)
    assert len(plain) == len(tta) == CFG.num_fg_classes
    for p, t in zip(plain, tta):
        assert p.shape == t.shape
        np.testing.assert_allclose(p, t, rtol=1e-5, atol=1e-4)


def test_flip_mapping_geometry():
    """Candidates of (img, flip=True) mapped back == mirror-in-original
    of candidates of (mirrored img, flip=False): the network sees the
    SAME pixels in both, so any difference is the mapping-back math."""
    model, variables = init_retinanet(CFG, jax.random.PRNGKey(5))
    pipe = PipelineConfig(img_scale=(250, 120), canvas=CFG.canvas,
                          device_normalize=True)
    step = make_tta_candidate_step(model, CFG)
    img = _img(2)
    w0 = img.shape[1]

    def run(image, f):
        s = prepare_sample(image, None, pipe, flip=f)
        batch = EvalBatch(s["image"][None], s["img_shape"][None],
                          s["scale_factor"][None], np.ones(1, bool))
        b, sc = step(variables, batch, np.array([f], bool))
        return np.asarray(b)[0], np.asarray(sc)[0]

    b_flip, s_flip = run(img, True)
    b_mirror, s_mirror = run(img[:, ::-1], False)
    # same pixels -> same scores in the same candidate order
    np.testing.assert_allclose(s_flip, s_mirror, rtol=1e-4, atol=1e-5)
    # mirror the no-flip result back into original coordinates
    b_back = np.stack([w0 - b_mirror[:, 2], b_mirror[:, 1],
                       w0 - b_mirror[:, 0], b_mirror[:, 3]], axis=-1)
    np.testing.assert_allclose(b_flip, b_back, rtol=1e-3, atol=0.05)


def test_multiscale_flip_merge(detector):
    """Two scales x flip: merged detections are well-formed and inside
    the original image."""
    img = _img(3, h=96, w=180)
    out = detector.tta(img, scales=[(250, 120), (180, 90)], flip=True)
    assert len(out) == CFG.num_fg_classes
    for dets in out:
        assert dets.shape[1] == 5
        if len(dets):
            assert (dets[:, 0] >= -1).all() and (dets[:, 2] <= 181).all()
            assert (dets[:, 1] >= -1).all() and (dets[:, 3] <= 97).all()
            assert ((dets[:, 4] >= 0) & (dets[:, 4] <= 1)).all()
