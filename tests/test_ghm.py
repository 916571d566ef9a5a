"""GHM losses: parity vs a torch transcription of the reference's binned
reweighting (incl. the EMA acc_sum path), plus family learnability.

Reference: /root/reference/mmdet/models/losses/ghm_loss.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.engine.ghm import _harmonize
from aod_meh_hua_tpu.utils.config import tiny_ghm_config


def _ref_ghmc_weights(pred, target, valid, bins, acc_sum, momentum):
    """Transcription of GHMC.forward:69-93 (weights only)."""
    edges = np.arange(bins + 1) / bins
    edges[-1] += 1e-6
    g = np.abs(1 / (1 + np.exp(-pred)) - target)
    weights = np.zeros_like(pred)
    tot = max(valid.sum(), 1.0)
    acc = acc_sum.copy()
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num = inds.sum()
        if num > 0:
            if momentum > 0:
                acc[i] = momentum * acc[i] + (1 - momentum) * num
                weights[inds] = tot / acc[i]
            else:
                weights[inds] = tot / num
            n += 1
    if n > 0:
        weights = weights / n
    return weights, acc, tot


def test_harmonize_matches_reference_ghmc():
    rng = np.random.RandomState(0)
    pred = rng.randn(200, 6).astype(np.float32) * 2
    target = (rng.rand(200, 6) < 0.1).astype(np.float32)
    valid = rng.rand(200, 6) < 0.8
    for momentum in (0.0, 0.75):
        acc0 = np.zeros(30, np.float32)
        want_w, want_acc, want_tot = _ref_ghmc_weights(
            pred, target, valid, 30, acc0, momentum)
        g = np.abs(1 / (1 + np.exp(-pred)) - target)
        got_w, got_acc, got_tot = _harmonize(
            jnp.asarray(g), jnp.asarray(valid), 30, jnp.asarray(acc0),
            momentum)
        np.testing.assert_allclose(np.asarray(got_w), want_w, rtol=1e-4,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(got_acc), want_acc, rtol=1e-5)
        assert float(got_tot) == want_tot


def test_harmonize_ema_accumulates_across_calls():
    rng = np.random.RandomState(1)
    g = rng.rand(300).astype(np.float32)
    valid = np.ones(300, bool)
    acc = jnp.zeros(10)
    for _ in range(3):
        _, acc, _ = _harmonize(jnp.asarray(g), jnp.asarray(valid), 10, acc,
                               0.7)
    # EMA of a constant 30-per-bin histogram converges toward 30
    a = np.asarray(acc)
    assert (a > 0).all() and a.sum() == pytest.approx(
        300 * (1 - 0.7 ** 3), rel=1e-4)


@pytest.fixture(scope="module")
def ghm_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.ghm import make_ghm_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_ghm_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_ghm_train_step(model, cfg, tx)
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
    return cfg, state, train_step, eval_step, batch


def test_ghm_overfits_and_detects(ghm_setup):
    cfg, state, train_step, eval_step, batch = ghm_setup
    state = jax.tree.map(jnp.array, state)
    losses = []
    for _ in range(150):
        state, aux = train_step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    # the EMA buffers moved
    ghm = state.batch_stats["__ghm__"]
    assert float(np.asarray(ghm["acc_sum_c"]).sum()) > 0

    from aod_meh_hua_tpu.engine import EvalBatch

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step(variables, eb)
    boxes = np.asarray(dets.boxes)
    labels = np.asarray(dets.labels)
    scores = np.asarray(dets.scores)
    valid = np.asarray(dets.valid)
    for i, (gt, lab) in enumerate([(batch.gt_boxes[0, 0], 2),
                                   (batch.gt_boxes[1, 0], 4)]):
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
