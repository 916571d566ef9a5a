"""YOLOv3 family: anchors, grid assignment, coder, and the fused
train/eval steps (parity targets: reference darknet.py / yolo_neck.py /
yolo_head.py / grid_assigner.py / yolo_bbox_coder.py, cited in
aod_meh_hua_tpu/models/yolo.py and engine/yolo.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.ops import YOLOAnchorGenerator
from aod_meh_hua_tpu.utils.config import tiny_yolo_config


def test_yolo_anchor_centers_and_sizes():
    gen = YOLOAnchorGenerator(base_sizes=(((116, 90), (156, 198), (373, 326)),),
                              strides=(32,))
    anchors = gen.grid_anchors([(2, 2)])[0]
    assert anchors.shape == (2 * 2 * 3, 4)
    # first anchor: cell (0,0), center (16, 16), size (116, 90)
    np.testing.assert_allclose(anchors[0], [16 - 58, 16 - 45, 16 + 58, 16 + 45])
    # cell (0,1): center (48, 16)
    np.testing.assert_allclose(anchors[3], [48 - 58, 16 - 45, 48 + 58, 16 + 45])


def test_grid_assigner_responsibility():
    from aod_meh_hua_tpu.engine.yolo import (
        _grid_assign, _level_meta, _responsible_flags,
    )

    cfg = tiny_yolo_config()
    meta = tuple(_level_meta(cfg))
    gen = cfg.build_anchor_generator()
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(cfg.featmap_sizes())))
    # one gt centered in the top-left stride-32 cell
    gt = jnp.asarray([[4.0, 4.0, 28.0, 28.0]])
    valid = jnp.asarray([True])
    flags = _responsible_flags(gt, valid, meta, anchors.shape[0])
    f = np.asarray(flags)
    # exactly one cell (3 anchors) responsible per level = 9 anchors
    assert f.sum() == 9
    assigned = np.asarray(_grid_assign(anchors, gt, valid, flags, cfg))
    pos = (assigned > 0).nonzero()[0]
    assert len(pos) >= 1
    assert f[pos].all()  # positives only among responsible anchors
    # invalid gt -> no positives
    a2 = np.asarray(_grid_assign(anchors, gt, jnp.asarray([False]), flags, cfg))
    assert (a2 == 0).all()


def test_yolo_encode_roundtrip():
    """The train-target encoding inverts the eval decode."""
    from aod_meh_hua_tpu.engine.yolo import _targets_single, _level_meta

    cfg = tiny_yolo_config()
    meta = tuple(_level_meta(cfg))
    gen = cfg.build_anchor_generator()
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(cfg.featmap_sizes())))
    strides = jnp.asarray(np.concatenate([
        np.full((s1 - s0,), st, np.float32) for (s0, s1, st, _, _) in meta]))
    gt = jnp.asarray([[10.0, 14.0, 40.0, 38.0]])
    labels, xywh, pos, neg = _targets_single(
        anchors, strides, gt, jnp.asarray([2], jnp.int32), jnp.asarray([True]),
        cfg, meta)
    p = np.asarray(pos).nonzero()[0]
    assert len(p) >= 1
    i = p[0]
    a = np.asarray(anchors[i])
    t = np.asarray(xywh[i])
    s = float(strides[i])
    # decode: cx = (tx - 0.5) * stride + acx ; w = exp(tw) * aw
    cx = (t[0] - 0.5) * s + (a[0] + a[2]) / 2
    cy = (t[1] - 0.5) * s + (a[1] + a[3]) / 2
    w = np.exp(t[2]) * (a[2] - a[0])
    h = np.exp(t[3]) * (a[3] - a[1])
    np.testing.assert_allclose([cx, cy, w, h], [25, 26, 30, 24], atol=1e-3)


@pytest.fixture(scope="module")
def yolo_setup():
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.yolo import make_yolo_eval_step, make_yolo_train_step
    from aod_meh_hua_tpu.models import init_yolov3
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_yolo_config()
    model, variables = init_yolov3(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(lr=0.01, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_yolo_train_step(model, cfg, tx)
    eval_step = make_yolo_eval_step(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:32, 8:32] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [8, 8, 32, 32]
    labels[0, 0] = 1
    images[1, 30:62, 28:60] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [28, 30, 60, 62]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(), shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, state, train_step, eval_step, batch


def test_yolo_train_step_runs_and_updates_bn(yolo_setup):
    cfg, state, train_step, eval_step, batch = yolo_setup
    own = jax.tree.map(jnp.array, state)
    before = np.asarray(own.batch_stats["backbone"]["conv1"]["bn"]["mean"]).copy()
    state1, aux = train_step(own, batch)
    for k in ("loss", "loss_cls", "loss_conf", "loss_xy", "loss_wh"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) > 0
    after = np.asarray(state1.batch_stats["backbone"]["conv1"]["bn"]["mean"])
    assert not np.allclose(before, after), "BN stats must train (YOLO is not frozen-BN)"


def test_yolo_overfits_and_detects(yolo_setup):
    cfg, state, train_step, eval_step, batch = yolo_setup
    state = jax.tree.map(jnp.array, state)
    losses = []
    for _ in range(300):
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
