"""TTA for the cascade/mask families (VERDICT r3 directive #6).

Reference parity targets (/root/reference):
* mmdet/models/roi_heads/cascade_roi_head.py:413-519 aug_test — per-aug
  multi-stage refinement on the merged proposals, stage-averaged
  scores, mean-merged boxes, one NMS; then per-aug per-stage mask
  sigmoid probs merged by merge_aug_masks.
* mmdet/models/roi_heads/test_mixins.py aug_test_mask (Mask R-CNN).
* mmdet/core/post_processing/merge_augs.py merge_aug_masks (the
  mask[..., ::-1] flip-back + mean).
"""

import numpy as np
import pytest

from aod_meh_hua_tpu.api import Detector, init_detector
from aod_meh_hua_tpu.data.pipeline import PipelineConfig, prepare_sample
from aod_meh_hua_tpu.engine import EvalBatch
from aod_meh_hua_tpu.engine.tta import make_tta_mask_step, make_tta_rpn_step
from aod_meh_hua_tpu.utils.config import (tiny_cascade_config,
                                          tiny_htc_config,
                                          tiny_mask_rcnn_config)


def _detector(cfg):
    model, variables = init_detector(cfg, seed=4)
    pipe = PipelineConfig(img_scale=(120, 60), canvas=cfg.canvas,
                          device_normalize=True)
    return Detector(cfg, model, variables, pipeline=pipe)


@pytest.fixture(scope="module")
def cascade_det():
    return _detector(tiny_cascade_config())


@pytest.fixture(scope="module")
def mask_det():
    return _detector(tiny_mask_rcnn_config())


@pytest.fixture(scope="module")
def htc_det():
    return _detector(tiny_htc_config())


def _check_boxes(out, n_classes, w, h):
    assert len(out) == n_classes
    for dets in out:
        assert dets.shape[1] == 5
        if len(dets):
            assert (dets[:, 2] <= w + 1).all() and (dets[:, 3] <= h + 1).all()
            assert ((dets[:, 4] >= 0) & (dets[:, 4] <= 1)).all()


def test_cascade_tta_full_flow(cascade_det):
    cfg = cascade_det.cfg
    img = np.random.RandomState(7).randint(0, 255, (60, 110, 3), np.uint8)
    out = cascade_det.tta(img, scales=[(120, 60), (90, 45)], flip=True)
    _check_boxes(out, cfg.num_fg_classes, 110, 60)

    # identity aug merges into a set consistent with the plain cascade
    # eval (same proposals -> same stage refinements)
    plain = cascade_det(img)
    tta1 = cascade_det.tta(img, scales=[(120, 60)], flip=False)
    n_plain = sum(len(d) for d in plain)
    n_tta = sum(len(d) for d in tta1)
    assert (n_tta > 0) == (n_plain > 0)
    if n_plain:
        # the top-scoring detection survives the TTA merge at the same
        # class with a near-identical box (orderings may differ)
        top_c = int(np.argmax([d[:, 4].max() if len(d) else -1 for d in plain]))
        assert len(tta1[top_c]) > 0
        tb = plain[top_c][np.argmax(plain[top_c][:, 4])]
        cand = tta1[top_c]
        d = np.abs(cand[:, :4] - tb[:4]).max(axis=1)
        assert d.min() < 2.0


def test_mask_rcnn_tta_returns_bbox_and_segm(mask_det):
    cfg = mask_det.cfg
    img = np.random.RandomState(8).randint(0, 255, (60, 110, 3), np.uint8)
    res, segm = mask_det.tta(img, scales=[(120, 60)], flip=True,
                             return_masks=True)
    _check_boxes(res, cfg.num_fg_classes, 110, 60)
    assert len(segm) == cfg.num_fg_classes
    for boxes_c, masks_c in zip(res, segm):
        assert len(masks_c) == len(boxes_c)
        if len(masks_c):
            assert masks_c.shape[1:] == (cfg.mask_size, cfg.mask_size)
            assert (masks_c >= 0).all() and (masks_c <= 1).all()

    # without return_masks the call keeps the plain per-class contract
    plain_shape = mask_det.tta(img, scales=[(120, 60)], flip=False)
    assert len(plain_shape) == cfg.num_fg_classes


def test_htc_tta_full_flow(htc_det):
    cfg = htc_det.cfg
    img = np.random.RandomState(9).randint(0, 255, (60, 110, 3), np.uint8)
    res, segm = htc_det.tta(img, scales=[(120, 60), (90, 45)], flip=True,
                            return_masks=True)
    _check_boxes(res, cfg.num_fg_classes, 110, 60)
    for boxes_c, masks_c in zip(res, segm):
        assert len(masks_c) == len(boxes_c)


def test_mask_flip_geometry(mask_det):
    """merge_aug_masks flip-back parity: the mask raster of (img,
    flip=True, det b) after the step's internal flip-back equals the
    MIRROR of the raster of (pre-mirrored img, flip=False, det
    mirror(b)) — both runs see identical pixels, only the coordinate
    mapping differs (merge_augs.py:153 mask[..., ::-1])."""
    cfg = mask_det.cfg
    pipe = mask_det.pipeline
    rpn = make_tta_rpn_step(mask_det.model, cfg)
    mstep = make_tta_mask_step(mask_det.model, cfg)
    img = np.random.RandomState(10).randint(0, 255, (50, 100, 3), np.uint8)
    w0 = img.shape[1]
    det = np.array([[[10.0, 12.0, 60.0, 40.0], [30.0, 5.0, 90.0, 45.0]]],
                   np.float32)                      # [1, 2, 4] original coords
    mdet = det.copy()
    mdet[..., [0, 2]] = w0 - det[..., [2, 0]]       # mirrored boxes
    labels = np.array([[1, 3]], np.int32)

    def run(image, f, boxes):
        s = prepare_sample(image, None, pipe, flip=f)
        batch = EvalBatch(s["image"][None], s["img_shape"][None],
                          s["scale_factor"][None], np.ones(1, bool))
        feats, _, _, _ = rpn(mask_det.variables, batch, np.array([f], bool))
        return np.asarray(mstep(mask_det.variables, feats, batch,
                                np.array([f], bool), boxes, labels))

    a = run(img, True, det)            # flipped aug, internal flip-back
    b = run(img[:, ::-1], False, mdet)  # same pixels, plain mapping
    np.testing.assert_allclose(a, b[..., ::-1], rtol=1e-4, atol=1e-5)


def test_scnet_tta_full_flow():
    """SCNet aug_test (scnet_roi_head.py:450-545): cascade TTA with
    semantic + global-context fusion per stage, mask pass with the
    final-stage relayed bbox feature."""
    from aod_meh_hua_tpu.utils.config import tiny_scnet_config

    det = _detector(tiny_scnet_config())
    cfg = det.cfg
    img = np.random.RandomState(13).randint(0, 255, (60, 110, 3), np.uint8)
    res, segm = det.tta(img, scales=[(120, 60)], flip=True,
                        return_masks=True)
    _check_boxes(res, cfg.num_fg_classes, 110, 60)
    for boxes_c, masks_c in zip(res, segm):
        assert len(masks_c) == len(boxes_c)
        if len(masks_c):
            assert masks_c.shape[1:] == (cfg.mask_size, cfg.mask_size)


def test_point_rend_tta_full_flow():
    """PointRend aug_test_mask (point_rend_roi_head.py:178-209): box
    TTA = standard two-stage; the mask pass runs the coarse head +
    point-subdivision refinement per aug and averages sigmoid probs."""
    from aod_meh_hua_tpu.utils.config import tiny_point_rend_config

    det = _detector(tiny_point_rend_config())
    cfg = det.cfg
    img = np.random.RandomState(14).randint(0, 255, (60, 110, 3), np.uint8)
    res, segm = det.tta(img, scales=[(120, 60)], flip=True,
                        return_masks=True)
    _check_boxes(res, cfg.num_fg_classes, 110, 60)
    refined = cfg.mask_size * (cfg.subdivision_scale ** cfg.subdivision_steps)
    for boxes_c, masks_c in zip(res, segm):
        assert len(masks_c) == len(boxes_c)
        if len(masks_c):
            assert masks_c.shape[1:] == (refined, refined)
            assert (masks_c >= 0).all() and (masks_c <= 1).all()


def test_sparse_rcnn_tta_raises_like_reference():
    """Parity: the reference's SparseRoIHead.aug_test raises
    NotImplementedError (sparse_roi_head.py:301-302)."""
    from aod_meh_hua_tpu.utils.config import tiny_sparse_rcnn_config

    det = _detector(tiny_sparse_rcnn_config())
    img = np.zeros((40, 60, 3), np.uint8)
    with pytest.raises(NotImplementedError, match="Sparse R-CNN"):
        det.tta(img)
