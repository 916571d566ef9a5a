"""GFL family: QFL / DFL / Integral numerics and the fused train/eval
steps (parity targets: reference gfl_head.py + gfocal_loss.py, cited in
aod_meh_hua_tpu/models/gfl.py and engine/gfl.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.models import integral
from aod_meh_hua_tpu.ops import distribution_focal_loss, quality_focal_loss
from aod_meh_hua_tpu.utils.config import tiny_gfl_config


def test_integral_expectation():
    # a point mass on bin 3 -> distance 3; uniform over {0..4} -> 2
    logits = np.full((1, 4 * 5), -1e9, np.float32)
    logits[0, 0 * 5 + 3] = 1e9          # side 0: delta at 3
    logits[0, 1 * 5: 2 * 5] = 0.0        # side 1: uniform
    logits[0, 2 * 5 + 0] = 1e9           # side 2: delta at 0
    logits[0, 3 * 5 + 4] = 1e9           # side 3: delta at 4
    out = np.asarray(integral(jnp.asarray(logits), reg_max=4))
    np.testing.assert_allclose(out[0], [3.0, 2.0, 0.0, 4.0], atol=1e-4)


def test_dfl_fixture():
    # target 2.3 between bins 2 and 3: loss = 0.7*CE(2) + 0.3*CE(3)
    logits = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
    tgt = jnp.asarray([2.3])
    lp = np.log(1.0 / 4)
    want = 0.7 * (-lp) + 0.3 * (-lp)
    np.testing.assert_allclose(float(distribution_focal_loss(logits, tgt).sum()),
                               want, rtol=1e-5)
    # exact integer target concentrates on (t, t+1) with weights (1, 0)
    sharp = jnp.asarray([[-20.0, 20.0, -20.0, -20.0]])
    np.testing.assert_allclose(
        float(distribution_focal_loss(sharp, jnp.asarray([1.0])).sum()), 0.0, atol=1e-4)


def test_qfl_fixture():
    # background anchor: every class supervised to 0 with sigmoid^2 factor
    logits = jnp.asarray([[0.0, 0.0]])
    labels = jnp.asarray([2], jnp.int32)  # bg (C = 2)
    q = jnp.asarray([0.0])
    bce0 = np.log(2.0)  # BCE(0 logits, 0 target)
    want = 2 * (0.5 ** 2) * bce0
    np.testing.assert_allclose(float(quality_focal_loss(logits, labels, q).sum()),
                               want, rtol=1e-5)
    # positive anchor with quality 1 and saturated logit: near-zero loss
    logits = jnp.asarray([[20.0, -20.0]])
    labels = jnp.asarray([0], jnp.int32)
    q = jnp.asarray([1.0])
    assert float(quality_focal_loss(logits, labels, q).sum()) < 1e-4


def test_qfl_pulls_toward_quality():
    # gradient on the pos entry points the sigmoid toward the quality target
    labels = jnp.asarray([0], jnp.int32)
    g = jax.grad(lambda l: quality_focal_loss(l, labels, jnp.asarray([0.7])).sum())
    low = np.asarray(g(jnp.asarray([[-2.0, 0.0]])))[0, 0]   # sigmoid 0.12 < 0.7
    high = np.asarray(g(jnp.asarray([[3.0, 0.0]])))[0, 0]   # sigmoid 0.95 > 0.7
    assert low < 0 < high


@pytest.fixture(scope="module")
def gfl_setup():
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.gfl import make_gfl_eval_step, make_gfl_train_step
    from aod_meh_hua_tpu.models import init_gfl
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_gfl_config()
    model, variables = init_gfl(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(lr=0.02, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_gfl_train_step(model, cfg, tx)
    eval_step = make_gfl_eval_step(model, cfg)

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


def test_gfl_train_step_runs(gfl_setup):
    cfg, state, train_step, eval_step, batch = gfl_setup
    own = jax.tree.map(jnp.array, state)
    _, aux = train_step(own, batch)
    for k in ("loss", "loss_cls", "loss_bbox", "loss_dfl"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) > 0


def test_gfl_overfits_and_detects(gfl_setup):
    cfg, state, train_step, eval_step, batch = gfl_setup
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
