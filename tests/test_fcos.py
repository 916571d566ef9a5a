"""FCOS family: point grid, target assignment, centerness, and the fused
train/eval steps (parity targets: reference fcos_head.py, cited in
aod_meh_hua_tpu/models/fcos.py and engine/fcos.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.ops import (
    centerness_target,
    distance2bbox,
    fcos_points,
    fcos_targets_single,
)
from aod_meh_hua_tpu.utils.config import tiny_fcos_config


def test_fcos_points_layout():
    pts = fcos_points([(2, 3), (1, 2)], [8, 16])
    # level 0: row-major cells, point = cell * stride + stride // 2
    np.testing.assert_array_equal(pts[:6], [
        [4, 4], [12, 4], [20, 4],
        [4, 12], [12, 12], [20, 12]])
    np.testing.assert_array_equal(pts[6:], [[8, 8], [24, 8]])


def test_distance2bbox_roundtrip():
    pts = jnp.asarray([[10.0, 20.0]])
    d = jnp.asarray([[3.0, 4.0, 5.0, 6.0]])
    box = np.asarray(distance2bbox(pts, d))
    np.testing.assert_allclose(box, [[7, 16, 15, 26]])
    clipped = np.asarray(distance2bbox(pts, d, max_shape=(25, 12)))
    np.testing.assert_allclose(clipped, [[7, 16, 12, 25]])


def test_centerness_target():
    # centered point: centerness 1
    np.testing.assert_allclose(
        float(centerness_target(jnp.asarray([5.0, 5.0, 5.0, 5.0]))), 1.0)
    # l=1,r=4 t=2,b=8 -> sqrt((1/4)*(2/8)) = 0.25
    np.testing.assert_allclose(
        float(centerness_target(jnp.asarray([1.0, 2.0, 4.0, 8.0]))), 0.25)


def test_fcos_target_assignment():
    # two gts: a small one (fits level-0 range) and a large one; the
    # overlapping point takes the SMALLER area gt
    points = jnp.asarray([[10.0, 10.0], [40.0, 40.0], [200.0, 200.0]])
    ranges = jnp.asarray([[-1.0, 16.0], [16.0, 64.0], [64.0, 1e8]])
    gt = jnp.asarray([[5.0, 5.0, 20.0, 20.0], [5.0, 5.0, 70.0, 70.0]])
    labels_gt = jnp.asarray([2, 4], jnp.int32)
    valid = jnp.asarray([True, True])
    labels, bbox_t = fcos_targets_single(points, ranges, gt, labels_gt, valid, 6)
    lab = np.asarray(labels)
    # point 0: inside both, max ltrb vs ranges — small gt max(ltrb)=10 <= 16
    assert lab[0] == 2
    # point 1: inside large gt only; max ltrb = 30 within (16, 64]
    assert lab[1] == 4
    # point 2: inside nothing -> background
    assert lab[2] == 6
    np.testing.assert_allclose(np.asarray(bbox_t[0]), [5, 5, 10, 10])
    # invalid gts are never assigned
    labels2, _ = fcos_targets_single(points, ranges, gt, labels_gt,
                                     jnp.asarray([False, False]), 6)
    assert (np.asarray(labels2) == 6).all()


def test_fcos_range_excludes_wrong_level():
    points = jnp.asarray([[10.0, 10.0]])
    gt = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])  # max ltrb = 90
    labels_lo, _ = fcos_targets_single(
        points, jnp.asarray([[-1.0, 16.0]]), gt, jnp.asarray([1], jnp.int32),
        jnp.asarray([True]), 6)
    labels_hi, _ = fcos_targets_single(
        points, jnp.asarray([[64.0, 128.0]]), gt, jnp.asarray([1], jnp.int32),
        jnp.asarray([True]), 6)
    assert int(labels_lo[0]) == 6 and int(labels_hi[0]) == 1


@pytest.fixture(scope="module")
def fcos_setup():
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.fcos import make_fcos_eval_step, make_fcos_train_step
    from aod_meh_hua_tpu.models import init_fcos
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_fcos_config()
    model, variables = init_fcos(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(lr=0.02, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_fcos_train_step(model, cfg, tx)
    eval_step = make_fcos_eval_step(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 10:34, 20:44] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [20, 10, 44, 34]
    labels[0, 0] = 1
    images[1, 20:52, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [60, 20, 92, 52]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    # FCOS has no anchors: anchor_valid is unused by its loss — pass [B, 1]
    batch = Batch(images, boxes, labels, gt_valid, np.ones((2, 1), bool), shapes)
    return cfg, state, train_step, eval_step, batch


def test_fcos_train_step_runs(fcos_setup):
    cfg, state, train_step, eval_step, batch = fcos_setup
    own = jax.tree.map(jnp.array, state)
    _, aux = train_step(own, batch)
    for k in ("loss", "loss_cls", "loss_bbox", "loss_centerness"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) > 0


def test_fcos_overfits_and_detects(fcos_setup):
    cfg, state, train_step, eval_step, batch = fcos_setup
    state = jax.tree.map(jnp.array, state)
    losses = []
    for _ in range(400):
        state, aux = train_step(state, batch)
        losses.append(float(aux["loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    from aod_meh_hua_tpu.engine import EvalBatch

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step(variables, eb)
    boxes = np.asarray(dets.boxes)
    labels = np.asarray(dets.labels)
    scores = np.asarray(dets.scores)
    valid = np.asarray(dets.valid)
    for i, (gt, lab) in enumerate([(batch.gt_boxes[0, 0], 1), (batch.gt_boxes[1, 0], 3)]):
        m = valid[i] & (scores[i] > 0.2)
        assert m.any(), f"image {i}: no confident detection"
        top = np.argmax(np.where(m, scores[i], -1))
        assert labels[i][top] == lab
        bx = boxes[i][top]
        x1 = max(bx[0], gt[0]); y1 = max(bx[1], gt[1])
        x2 = min(bx[2], gt[2]); y2 = min(bx[3], gt[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        union = ((bx[2] - bx[0]) * (bx[3] - bx[1])
                 + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
        assert inter / union > 0.5, f"image {i}: IoU {inter / union}"
