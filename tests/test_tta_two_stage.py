"""Two-stage TTA (reference two_stage.py:184 aug_test: aug_test_rpn ->
merge_aug_proposals -> RoI aug_test_bboxes with mean-merged boxes)."""

import jax
import numpy as np
import pytest

from aod_meh_hua_tpu.api import Detector, init_detector
from aod_meh_hua_tpu.data.pipeline import PipelineConfig, prepare_sample
from aod_meh_hua_tpu.engine import EvalBatch
from aod_meh_hua_tpu.engine.tta import make_tta_rpn_step
from aod_meh_hua_tpu.utils.config import tiny_faster_rcnn_config

CFG = tiny_faster_rcnn_config()


@pytest.fixture(scope="module")
def detector():
    model, variables = init_detector(CFG, seed=4)
    pipe = PipelineConfig(img_scale=(120, 60), canvas=CFG.canvas,
                          device_normalize=True)
    return Detector(CFG, model, variables, pipeline=pipe)


def test_rpn_flip_geometry(detector):
    """Proposals of (img, flip=True) mapped back == mirror-in-original of
    proposals of (mirrored img, flip=False)."""
    pipe = detector.pipeline
    step = make_tta_rpn_step(detector.model, CFG)
    img = np.random.RandomState(11).randint(0, 255, (50, 100, 3), np.uint8)
    w0 = img.shape[1]

    def run(image, f):
        s = prepare_sample(image, None, pipe, flip=f)
        batch = EvalBatch(s["image"][None], s["img_shape"][None],
                          s["scale_factor"][None], np.ones(1, bool))
        _, props, scores, valid = step(detector.variables, batch,
                                       np.array([f], bool))
        return (np.asarray(props)[0], np.asarray(scores)[0],
                np.asarray(valid)[0])

    p_flip, s_flip, v_flip = run(img, True)
    p_mir, s_mir, v_mir = run(img[:, ::-1], False)
    np.testing.assert_array_equal(v_flip, v_mir)
    np.testing.assert_allclose(s_flip[v_flip], s_mir[v_mir],
                               rtol=1e-4, atol=1e-5)
    back = np.stack([w0 - p_mir[:, 2], p_mir[:, 1],
                     w0 - p_mir[:, 0], p_mir[:, 3]], axis=-1)
    np.testing.assert_allclose(p_flip[v_flip], back[v_mir],
                               rtol=1e-3, atol=0.05)


def test_two_stage_tta_full_flow(detector):
    img = np.random.RandomState(12).randint(0, 255, (60, 110, 3), np.uint8)
    out = detector.tta(img, scales=[(120, 60), (90, 45)], flip=True)
    assert len(out) == CFG.num_fg_classes
    for dets in out:
        assert dets.shape[1] == 5
        if len(dets):
            assert (dets[:, 2] <= 111).all() and (dets[:, 3] <= 61).all()
            assert ((dets[:, 4] >= 0) & (dets[:, 4] <= 1)).all()

    # identity aug: same detections repeated augs merge into a sane set —
    # overlapping the plain eval's top detection
    plain = detector(img)
    tta1 = detector.tta(img, scales=[(120, 60)], flip=False)
    n_plain = sum(len(d) for d in plain)
    n_tta = sum(len(d) for d in tta1)
    assert (n_tta > 0) == (n_plain > 0)
