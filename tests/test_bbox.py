import numpy as np
import jax.numpy as jnp
import pytest

from aod_meh_hua_tpu.ops import bbox_overlaps, delta_encode, delta_decode


def test_iou_basic():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0], [10.0, 10.0, 20.0, 20.0]])
    b2 = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
    iou = np.asarray(bbox_overlaps(b1, b2))
    assert iou[0, 0] == pytest.approx(1.0)
    # inter 5x5=25, union 100+100-25=175
    assert iou[0, 1] == pytest.approx(25.0 / 175.0, rel=1e-5)
    assert iou[1, 0] == pytest.approx(0.0)


def test_iof_mode():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b2 = jnp.array([[0.0, 0.0, 5.0, 10.0]])
    iof = np.asarray(bbox_overlaps(b1, b2, mode="iof"))
    assert iof[0, 0] == pytest.approx(0.5)  # inter 50 / area1 100


def test_degenerate_boxes_no_nan():
    b1 = jnp.array([[5.0, 5.0, 5.0, 5.0]])
    b2 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    iou = np.asarray(bbox_overlaps(b1, b2))
    assert np.isfinite(iou).all()
    assert iou[0, 0] == pytest.approx(0.0)


def test_encode_decode_roundtrip(rng):
    anchors = jnp.asarray(rng.uniform(0, 100, (32, 4)).astype(np.float32))
    anchors = jnp.concatenate(
        [anchors[:, :2], anchors[:, :2] + jnp.abs(anchors[:, 2:]) + 1.0], axis=-1
    )
    gt = anchors + jnp.asarray(rng.uniform(-3, 3, (32, 4)).astype(np.float32))
    gt = jnp.concatenate([gt[:, :2], jnp.maximum(gt[:, 2:], gt[:, :2] + 0.5)], axis=-1)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = delta_encode(anchors, gt, stds=stds)
    back = delta_decode(anchors, deltas, stds=stds)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4, atol=1e-3)


def test_decode_known_values():
    # mirror of delta2bbox's docstring example semantics
    rois = jnp.array([[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0]])
    deltas = jnp.array([[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]])
    out = np.asarray(delta_decode(rois, deltas, max_shape=(32, 32)))
    np.testing.assert_allclose(out[0], [0.0, 0.0, 1.0, 1.0], atol=1e-5)
    # center (0.5,0.5)+1*1 = 1.5; wh = e
    e = np.exp(1.0)
    np.testing.assert_allclose(out[1], [1.5 - e / 2, 1.5 - e / 2, 1.5 + e / 2, 1.5 + e / 2], rtol=1e-5)


def test_decode_clip_and_ratio_clamp():
    rois = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.array([[0.0, 0.0, 99.0, -99.0]])  # huge dw / dh
    out = np.asarray(delta_decode(rois, deltas, max_shape=(20, 20)))
    max_ratio = abs(np.log(16.0 / 1000.0))
    w = 10 * np.exp(max_ratio)
    assert out[0, 0] == pytest.approx(max(0.0, 5 - w / 2))
    assert out[0, 2] == pytest.approx(min(20.0, 5 + w / 2))  # clipped to W
    assert out[0, 3] - out[0, 1] <= 10 * np.exp(-max_ratio) + 1e-4


def test_decode_batched_max_shape():
    rois = jnp.tile(jnp.array([[[0.0, 0.0, 10.0, 10.0]]]), (2, 1, 1))
    deltas = jnp.zeros((2, 1, 4))
    shapes = jnp.array([[5, 7], [20, 20]])
    out = np.asarray(delta_decode(rois, deltas, max_shape=shapes))
    np.testing.assert_allclose(out[0, 0], [0, 0, 7, 5])
    np.testing.assert_allclose(out[1, 0], [0, 0, 10, 10])
