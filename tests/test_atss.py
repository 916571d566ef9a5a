"""ATSS family: adaptive assigner semantics and the fused train/eval
steps (parity targets: reference atss_assigner.py / atss_head.py, cited
in aod_meh_hua_tpu/models/atss.py and engine/atss.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.ops import atss_assign
from aod_meh_hua_tpu.utils.config import tiny_atss_config


def _grid_anchors(n, stride, size):
    """n x n anchors of `size` at stride centers (one level)."""
    anchors = []
    for r in range(n):
        for c in range(n):
            cx, cy = c * stride + stride / 2, r * stride + stride / 2
            anchors.append([cx - size / 2, cy - size / 2, cx + size / 2, cy + size / 2])
    return np.array(anchors, np.float32)


def test_atss_assign_basic():
    # one level of 4x4 anchors (stride 8, size 8); gt centered on one cell
    anchors = jnp.asarray(_grid_anchors(4, 8, 8))
    bounds = [(0, 16)]
    gt = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])  # covers cells (1..2, 1..2)
    assigned = np.asarray(atss_assign(anchors, bounds, gt,
                                      jnp.asarray([True]), topk=9))
    # positives must be among the cells whose centers are inside the gt
    pos = assigned.nonzero()[0]
    assert len(pos) > 0
    for p in pos:
        cx = (anchors[p, 0] + anchors[p, 2]) / 2
        cy = (anchors[p, 1] + anchors[p, 3]) / 2
        assert 8 < cx < 24 and 8 < cy < 24
    # the best-IoU anchors (cells 1,1 / 1,2 / 2,1 / 2,2) are all positive
    for cell in (5, 6, 9, 10):
        assert assigned[cell] == 1


def test_atss_assign_threshold_excludes_far_anchors():
    anchors = jnp.asarray(_grid_anchors(6, 8, 8))
    bounds = [(0, 36)]
    gt = jnp.asarray([[0.0, 0.0, 12.0, 12.0]])
    assigned = np.asarray(atss_assign(anchors, bounds, gt,
                                      jnp.asarray([True]), topk=9))
    # anchors far from the gt (last row/col) never assigned
    assert (assigned.reshape(6, 6)[3:, :] == 0).all()
    assert (assigned.reshape(6, 6)[:, 3:] == 0).all()


def test_atss_assign_multi_gt_highest_iou_wins():
    anchors = jnp.asarray(_grid_anchors(4, 8, 8))
    bounds = [(0, 16)]
    # two gts share candidate anchors; the overlapping anchor goes to the
    # one it overlaps more
    gt = jnp.asarray([[4.0, 4.0, 16.0, 16.0], [6.0, 6.0, 14.0, 14.0]])
    assigned = np.asarray(atss_assign(
        anchors, bounds, gt, jnp.asarray([True, True]), topk=4))
    # anchor at cell (1,1) = [8,8,16,16]: IoU with gt0 = 64/144*... just
    # assert it is assigned and to the higher-IoU gt computed by hand:
    # inter gt0 = 8x8=64, union = 64+144-64 = 144 -> 0.444
    # inter gt1 = 6x6=36, union = 64+64-36 = 92 -> 0.391 -> gt 1 loses
    assert assigned[5] == 1


def test_atss_assign_invalid_gt_ignored():
    anchors = jnp.asarray(_grid_anchors(4, 8, 8))
    bounds = [(0, 16)]
    gt = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])
    assigned = np.asarray(atss_assign(anchors, bounds, gt,
                                      jnp.asarray([False]), topk=9))
    assert (assigned == 0).all()


@pytest.fixture(scope="module")
def atss_setup():
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.atss import make_atss_eval_step, make_atss_train_step
    from aod_meh_hua_tpu.models import init_atss
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_atss_config()
    model, variables = init_atss(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(lr=0.02, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_atss_train_step(model, cfg, tx)
    eval_step = make_atss_eval_step(model, cfg)

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
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(), shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, state, train_step, eval_step, batch


def test_atss_train_step_runs(atss_setup):
    cfg, state, train_step, eval_step, batch = atss_setup
    own = jax.tree.map(jnp.array, state)
    _, aux = train_step(own, batch)
    for k in ("loss", "loss_cls", "loss_bbox", "loss_centerness"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) > 0


def test_atss_overfits_and_detects(atss_setup):
    cfg, state, train_step, eval_step, batch = atss_setup
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
