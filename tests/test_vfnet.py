"""VFNet family: star-shaped dcn offsets, varifocal loss semantics, and
the fused train/eval steps (parity targets: reference vfnet_head.py /
varifocal_loss.py, cited in aod_meh_hua_tpu/models/vfnet.py and
engine/vfnet.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import tiny_vfnet_config


def test_star_dcn_offset_geometry():
    """The 9 taps must land on the initial box's corners, edge midpoints
    and center (star_dcn_offset vfnet_head.py:273-314)."""
    from aod_meh_hua_tpu.models.reppoints import _BASE_YX
    from aod_meh_hua_tpu.models.vfnet import star_dcn_offset

    stride = 8.0
    # one pixel predicting l=8, t=16, r=24, b=32 (pixels)
    pred = jnp.asarray([[[[8.0, 16.0, 24.0, 32.0]]]])
    off = np.asarray(star_dcn_offset(pred, gradient_mul=1.0, stride=stride))
    taps = off.reshape(9, 2) + _BASE_YX  # absolute (y, x) in feature cells
    l, t, r, b = 1.0, 2.0, 3.0, 4.0  # pred / stride
    expect = np.array([
        [-t, -l], [-t, 0], [-t, r],
        [0, -l], [0, 0], [0, r],
        [b, -l], [b, 0], [b, r],
    ])
    np.testing.assert_allclose(taps, expect, atol=1e-5)


def test_star_dcn_offset_gradient_mul():
    """gradient_mul blends detached and live pred; values are identical
    either way (only the gradient path differs)."""
    from aod_meh_hua_tpu.models.vfnet import star_dcn_offset

    pred = jnp.asarray(np.random.RandomState(0)
                       .rand(1, 2, 2, 4).astype(np.float32)) * 10
    o1 = np.asarray(star_dcn_offset(pred, 0.1, 8))
    o2 = np.asarray(star_dcn_offset(pred, 1.0, 8))
    np.testing.assert_allclose(o1, o2, atol=1e-6)

    g = jax.grad(lambda p: star_dcn_offset(p, 0.1, 8).sum())(pred)
    g_full = jax.grad(lambda p: star_dcn_offset(p, 1.0, 8).sum())(pred)
    np.testing.assert_allclose(np.asarray(g), 0.1 * np.asarray(g_full),
                               rtol=1e-5)


def test_varifocal_loss_semantics():
    """Positives weighted by the IoU target itself; negatives by
    alpha * |p - 0|^gamma (varifocal_loss.py:8)."""
    from aod_meh_hua_tpu.ops.losses import varifocal_loss

    pred = jnp.asarray([[2.0, -3.0]])
    target = jnp.asarray([[0.7, 0.0]])
    p = jax.nn.sigmoid(pred)
    bce = np.clip(pred, 0, None) - pred * target + np.log1p(
        np.exp(-np.abs(pred)))
    w_pos = 0.7
    w_neg = 0.75 * float(p[0, 1]) ** 2
    expect = float(bce[0, 0]) * w_pos + float(bce[0, 1]) * w_neg
    got = float(varifocal_loss(pred, target))
    assert abs(got - expect) < 1e-5


@pytest.fixture(scope="module")
def vfnet_setup():
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.vfnet import (make_vfnet_eval_step,
                                              make_vfnet_train_step)
    from aod_meh_hua_tpu.models import init_vfnet
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_vfnet_config()
    model, variables = init_vfnet(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(lr=0.01, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_vfnet_train_step(model, cfg, tx)
    eval_step = make_vfnet_eval_step(model, cfg)

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
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, state, train_step, eval_step, batch


def test_vfnet_train_step_runs(vfnet_setup):
    cfg, state, train_step, eval_step, batch = vfnet_setup
    own = jax.tree.map(jnp.array, state)
    _, aux = train_step(own, batch)
    for k in ("loss", "loss_cls", "loss_bbox", "loss_bbox_rf"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) > 0


def test_vfnet_overfits_and_detects(vfnet_setup):
    cfg, state, train_step, eval_step, batch = vfnet_setup
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
    for i, (gt, lab) in enumerate([(batch.gt_boxes[0, 0], 1),
                                   (batch.gt_boxes[1, 0], 3)]):
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
