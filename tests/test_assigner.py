import numpy as np
import jax.numpy as jnp

from aod_meh_hua_tpu.ops import max_iou_assign, anchor_targets


def _assign(anchors, gts, valid=None, **kw):
    anchors = jnp.asarray(anchors, dtype=jnp.float32)
    gts = jnp.asarray(gts, dtype=jnp.float32)
    if valid is None:
        valid = jnp.ones(gts.shape[0], dtype=bool)
    return np.asarray(max_iou_assign(anchors, gts, jnp.asarray(valid), **kw))


def test_reference_docstring_example():
    # MaxIoUAssigner(0.5, 0.5) example from the reference docstring
    anchors = [[0, 0, 10, 10], [10, 10, 20, 20]]
    gts = [[0, 0, 10, 9]]
    out = _assign(anchors, gts, pos_iou_thr=0.5, neg_iou_thr=0.5)
    np.testing.assert_array_equal(out, [1, 0])


def test_ignore_band():
    # iou in [neg_thr, pos_thr) and not a per-gt max -> ignore (-1)
    anchors = [[0, 0, 10, 10], [0, 0, 10, 4.5], [50, 50, 60, 60]]
    gts = [[0, 0, 10, 10]]
    out = _assign(anchors, gts, pos_iou_thr=0.5, neg_iou_thr=0.4)
    assert out[0] == 1  # iou 1.0
    assert out[1] == -1  # iou 0.45: ignore band, gt's max anchor is anchor 0
    assert out[2] == 0  # background


def test_low_quality_match():
    # gt whose best anchor is below pos_thr still claims that anchor
    anchors = [[0, 0, 10, 10], [20, 20, 30, 30]]
    gts = [[0, 0, 10, 22]]  # iou with anchor0 = 100/220 = 0.4545
    out = _assign(anchors, gts, pos_iou_thr=0.5, neg_iou_thr=0.4)
    assert out[0] == 1
    assert out[1] == 0


def test_low_quality_last_gt_wins_on_tie():
    # two identical gts: reference's ordered loop leaves the later gt
    anchors = [[0, 0, 10, 22]]
    gts = [[0, 0, 10, 10], [0, 0, 10, 10]]
    out = _assign(anchors, gts, pos_iou_thr=0.9, neg_iou_thr=0.2)
    assert out[0] == 2


def test_gt_max_assign_all_false():
    # SSD mode: only the single argmax anchor gets the low-quality match
    anchors = [[0, 0, 10, 22], [0, 0, 10, 22]]
    gts = [[0, 0, 10, 10]]
    out = _assign(anchors, gts, pos_iou_thr=0.9, neg_iou_thr=0.5, gt_max_assign_all=False)
    assert (out == 1).sum() == 1


def test_padded_gts_ignored():
    anchors = [[0, 0, 10, 10]]
    gts = [[0, 0, 10, 10], [0, 0, 10, 10]]
    out = _assign(anchors, gts, valid=[True, False], pos_iou_thr=0.5, neg_iou_thr=0.4)
    assert out[0] == 1  # padded duplicate must not win


def test_no_valid_gt_all_background():
    anchors = [[0, 0, 10, 10], [5, 5, 15, 15]]
    gts = [[0, 0, 10, 10]]
    out = _assign(anchors, gts, valid=[False])
    np.testing.assert_array_equal(out, [0, 0])


def test_invalid_anchor_excluded_from_gt_max():
    # the pad-region anchor has the best iou; the reference assigns the
    # best *valid* anchor instead in step 4
    anchors = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 14]], dtype=jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10]], dtype=jnp.float32)
    valid_gt = jnp.ones(1, dtype=bool)
    av = jnp.asarray([False, True])
    out = np.asarray(
        max_iou_assign(anchors, gts, valid_gt, anchor_valid=av, pos_iou_thr=0.9, neg_iou_thr=0.3)
    )
    assert out[1] == 1  # low-quality match lands on the valid anchor


def test_anchor_targets_shapes_and_weights():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [20, 20, 30, 30], [0, 0, 9, 9], [100, 100, 110, 110]], dtype=jnp.float32
    )
    av = jnp.asarray([True, True, True, False])
    gts = jnp.asarray([[0, 0, 10, 10], [0, 0, 0, 0]], dtype=jnp.float32)
    labels = jnp.asarray([3, 0], dtype=jnp.int32)
    gv = jnp.asarray([True, False])
    t = anchor_targets(anchors, av, gts, labels, gv, num_classes=20)
    assert int(t.labels[0]) == 3
    assert int(t.labels[1]) == 20  # background
    assert int(t.labels[3]) == 20  # invalid anchor -> bg label, zero weight
    assert float(t.label_weights[3]) == 0.0
    assert float(t.bbox_weights[0, 0]) == 1.0
    assert float(t.bbox_weights[1, 0]) == 0.0
    assert int(t.num_pos) >= 1
    # encoded target of a perfect match is zero delta
    np.testing.assert_allclose(np.asarray(t.bbox_targets[0]), np.zeros(4), atol=1e-5)
