"""FoveaBox family: fovea-region targets, scale-range routing, and the
fused train / eval steps (parity targets: reference fovea_head.py,
cited in aod_meh_hua_tpu/models/foveabox.py and engine/foveabox.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_foveabox_config


def test_fovea_targets_scale_routing_and_window():
    """A sqrt-area-32 gt hits only the levels whose scale range covers
    it AND whose shrunk window is non-empty; targets are clamped
    log-space offsets; smallest gt wins overlaps (fovea_head.py:215-266)."""
    from aod_meh_hua_tpu.engine.foveabox import (
        _fovea_targets_single, fovea_tables,
    )

    cfg = tiny_foveabox_config()
    tables = jnp.asarray(fovea_tables(cfg))
    g = cfg.max_gt
    gt = np.zeros((g, 4), np.float32)
    gl = np.zeros((g,), np.int32)
    gv = np.zeros((g,), bool)
    gt[0] = [8, 8, 40, 40]  # sqrt-area 32: ranges (12, 48) and (24, 1000)
    gl[0] = 2
    gv[0] = True
    labels, targets = _fovea_targets_single(
        tables, jnp.asarray(gt), jnp.asarray(gl), jnp.asarray(gv), cfg)
    labels = np.asarray(labels)
    bounds = cfg.level_bounds()
    per_level = [(labels[s0:s1] == 2).sum() for (s0, s1) in bounds]
    assert per_level[0] == 0        # area below level-0 range
    assert per_level[1] >= 1        # the fovea center cell
    assert per_level[2] == 0        # stride-32 shrunk window is empty
    # the center point of level 1 (stride 16): cell (1, 1), point 24
    s0, s1 = bounds[1]
    i = int(np.nonzero(labels[s0:s1] == 2)[0][0])
    t = np.asarray(targets)[s0 + i]
    x = np.asarray(tables)[s0 + i, 0] * 16  # stride * (col + 0.5)
    y = np.asarray(tables)[s0 + i, 1] * 16
    exp = np.log(np.clip(np.array([
        (x - 8) / 32, (y - 8) / 32, (40 - x) / 32, (40 - y) / 32,
    ]), 1 / 16, 16))
    np.testing.assert_allclose(t, exp, atol=1e-5)
    # background cells carry log(1) = 0 targets
    bg = labels == cfg.num_classes
    assert np.abs(np.asarray(targets)[bg]).max() == 0.0

    # two overlapping gts on one level: the SMALLER wins the overlap
    gt[1] = [10, 10, 34, 34]  # sqrt-area 24, same center region
    gl[1] = 4
    gv[1] = True
    labels2, _ = _fovea_targets_single(
        tables, jnp.asarray(gt), jnp.asarray(gl), jnp.asarray(gv), cfg)
    labels2 = np.asarray(labels2)
    assert labels2[s0 + i] == 4


@pytest.fixture(scope="module")
def fovea_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.foveabox import make_fovea_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_foveabox_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_fovea_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:40, 8:40] = rng.randn(32, 32, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [8, 8, 40, 40]
    labels[0, 0] = 1
    images[1, 24:62, 20:60] = rng.randn(38, 40, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [20, 24, 60, 62]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, state, train_step, eval_step, batch


def test_fovea_train_step_finite(fovea_setup):
    cfg, state, train_step, eval_step, batch = fovea_setup
    own = jax.tree.map(jnp.array, state)
    state1, aux = train_step(own, batch)
    for k in ("loss", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) >= 2.0


def test_fovea_overfits_and_detects(fovea_setup):
    """300 steps recover both synthetic boxes with the right labels."""
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps
    from aod_meh_hua_tpu.engine.batch import EvalBatch

    cfg, state, train_step, eval_step, batch = fovea_setup
    state = jax.tree.map(jnp.array, state)
    for _ in range(300):
        state, aux = train_step(state, batch)
    assert float(aux["loss"]) < 0.5

    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, eb)
    bx, sc = np.asarray(dets.boxes), np.asarray(dets.scores)
    lb = np.asarray(dets.labels)
    for b, (gt, lab) in enumerate([([8, 8, 40, 40], 1), ([20, 24, 60, 62], 3)]):
        i = sc[b].argmax()
        iou = np.asarray(bbox_overlaps(jnp.asarray([gt], jnp.float32),
                                       jnp.asarray(bx[b, i:i + 1])))[0, 0]
        assert iou > 0.7, (b, bx[b, i], iou)
        assert lb[b, i] == lab
