"""Grid R-CNN: sub-region geometry, dense grid targets vs a
transcription of the reference's rasterizer, and learnability.

Reference: /root/reference/mmdet/models/roi_heads/mask_heads/
grid_head.py + grid_roi_head.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.engine.grid_rcnn import grid_targets
from aod_meh_hua_tpu.models.grid_rcnn import calc_sub_regions, grid_neighbors
from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_grid_rcnn_config


def test_sub_regions_match_reference_layout():
    """grid_head.py:191-220 for the 9-point/56-map case."""
    subs = calc_sub_regions(9, 3, 56)
    assert subs[0] == (0, 0, 28, 28)          # corner point
    assert subs[8] == (28, 28, 56, 56)        # opposite corner
    assert subs[4] == (14, 14, 42, 42)        # center point
    # neighbor structure: center has 4, corners 2, edges 3
    nbrs = grid_neighbors(3)
    assert sorted(len(n) for n in nbrs) == [2, 2, 2, 2, 3, 3, 3, 3, 4]


def _np_grid_targets(pos_boxes, gt_boxes, gp, whole, radius):
    """Transcription of grid_head.get_targets (:222-287) per roi."""
    gs = int(np.sqrt(gp))
    half = whole // 4 * 2
    subs = calc_sub_regions(gp, gs, whole)
    n = pos_boxes.shape[0]
    out = np.zeros((n, gp, half, half), np.float32)
    ok = np.zeros((n,), bool)
    for i in range(n):
        b = pos_boxes[i]
        x1 = b[0] - (b[2] - b[0]) / 2
        y1 = b[1] - (b[3] - b[1]) / 2
        x2 = b[2] + (b[2] - b[0]) / 2
        y2 = b[3] + (b[3] - b[1]) / 2
        w, h = x2 - x1, y2 - y1
        if w <= gs or h <= gs:
            continue
        ok[i] = True
        full = np.zeros((gp, whole, whole), np.float32)
        for j in range(gp):
            fx = 1 - (j // gs) / (gs - 1)
            fy = 1 - (j % gs) / (gs - 1)
            gx = fx * gt_boxes[i, 0] + (1 - fx) * gt_boxes[i, 2]
            gy = fy * gt_boxes[i, 1] + (1 - fy) * gt_boxes[i, 3]
            cx = int((gx - x1) / w * whole)
            cy = int((gy - y1) / h * whole)
            for x in range(cx - radius, cx + radius + 1):
                for y in range(cy - radius, cy + radius + 1):
                    if 0 <= x < whole and 0 <= y < whole:
                        if (x - cx) ** 2 + (y - cy) ** 2 <= radius ** 2:
                            full[j, y, x] = 1
        for j in range(gp):
            sx, sy, ex, ey = subs[j]
            out[i, j] = full[j, sy:ey, sx:ex]
    return out, ok


def test_grid_targets_match_reference():
    rng = np.random.RandomState(0)
    n = 6
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(5, 40, n)
    boxes[:, 1] = rng.uniform(5, 40, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(8, 40, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(8, 40, n)
    boxes[5, 2] = boxes[5, 0] + 1.0  # degenerate: ignored
    gts = boxes + rng.uniform(-3, 3, (n, 4)).astype(np.float32)

    want, want_ok = _np_grid_targets(boxes, gts, 9, 56, 1)
    got, got_ok = grid_targets(jnp.asarray(boxes), jnp.asarray(gts),
                               9, 56, 1)
    np.testing.assert_array_equal(np.asarray(got_ok), want_ok)
    np.testing.assert_array_equal(np.asarray(got)[want_ok], want[want_ok])


def test_grid_rcnn_trains_and_refines():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, EvalBatch, create_train_state
    from aod_meh_hua_tpu.engine.grid_rcnn import make_grid_rcnn_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_grid_rcnn_config()
    model, variables = init_detector(cfg, seed=0)
    assert "grid_head" in variables["params"]
    tcfg = TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    step = make_grid_rcnn_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 10:34, 20:44] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [20, 10, 44, 34]
    labels[0, 0] = 2
    images[1, 20:52, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [60, 20, 92, 52]
    labels[1, 0] = 4
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(9)
    losses = []
    for _ in range(80):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])
    assert float(aux["loss_grid"]) < losses[0]

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step(variables, eb)
    scores = np.asarray(dets.scores)
    valid = np.asarray(dets.valid)
    bx = np.asarray(dets.boxes)
    # at least one confident detection near each gt (IoU > 0.3: the
    # tiny grid head refines coarsely)
    for i in range(2):
        m = valid[i] & (scores[i] > 0.2)
        assert m.any(), f"image {i}: no detection"
        gt = batch.gt_boxes[i, 0]
        best = 0.0
        for b in bx[i][m]:
            x1 = max(b[0], gt[0]); y1 = max(b[1], gt[1])
            x2 = min(b[2], gt[2]); y2 = min(b[3], gt[3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            union = ((b[2] - b[0]) * (b[3] - b[1])
                     + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
            best = max(best, inter / max(union, 1e-6))
        assert best > 0.3, f"image {i}: best IoU {best}"
