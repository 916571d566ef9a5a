"""AutoAssign family: center-prior weighting, pos/neg loss semantics and
the fused train/eval steps (parity targets: reference
autoassign_head.py, cited in aod_meh_hua_tpu/models/autoassign.py and
engine/autoassign.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import tiny_autoassign_config


def test_autoassign_points_have_no_half_stride_offset():
    """autoassign_head.py:173 removes the half-stride offset."""
    from aod_meh_hua_tpu.engine.autoassign import autoassign_points

    pts, pstr = autoassign_points([(2, 4), (1, 2)], (8, 16))
    assert pts.shape == (10, 2)
    np.testing.assert_array_equal(pts[0], [0.0, 0.0])
    np.testing.assert_array_equal(pts[1], [8.0, 0.0])
    np.testing.assert_array_equal(pts[4], [0.0, 8.0])
    np.testing.assert_array_equal(pts[8], [0.0, 0.0])  # level 2 start
    assert (pstr[:8] == 8).all() and (pstr[8:] == 16).all()


def test_center_prior_peaks_at_center():
    """With mean=0 / sigma=1 the learnable prior is the pure gaussian on
    ((p - center)/stride), masked to the gt interior
    (CenterPrior.forward autoassign_head.py:45-120)."""
    from aod_meh_hua_tpu.engine.autoassign import _image_loss, autoassign_points

    cfg = tiny_autoassign_config()
    pts, pstr = autoassign_points(cfg.featmap_sizes(), cfg.strides)
    P = pts.shape[0]
    G = cfg.max_gt
    C = cfg.num_classes
    gt = np.zeros((G, 4), np.float32)
    gt[0] = [16, 16, 48, 48]
    labels = np.zeros(G, np.int32)
    valid = np.zeros(G, bool)
    valid[0] = True
    # uniform predictions: pos weighting then reduces to the prior
    cls_p = np.full((P, C), 0.5, np.float32)
    reg = np.full((P, 4), 8.0, np.float32)
    obj_p = np.full((P,), 0.5, np.float32)
    pos_s, neg_s, center_n, prior_s, n_gt = _image_loss(
        jnp.asarray(cls_p), jnp.asarray(reg), jnp.asarray(obj_p),
        jnp.zeros((C, 2)), jnp.ones((C, 2)), jnp.asarray(pts),
        jnp.asarray(pstr), jnp.asarray(gt), jnp.asarray(labels),
        jnp.asarray(valid), cfg)
    assert float(n_gt) == 1.0
    assert float(prior_s) > 0.0
    assert np.isfinite(float(pos_s)) and np.isfinite(float(neg_s))
    assert float(center_n) > 0.0


def test_empty_image_gives_zero_pos_and_center():
    from aod_meh_hua_tpu.engine.autoassign import _image_loss, autoassign_points

    cfg = tiny_autoassign_config()
    pts, pstr = autoassign_points(cfg.featmap_sizes(), cfg.strides)
    P = pts.shape[0]
    G, C = cfg.max_gt, cfg.num_classes
    pos_s, neg_s, center_n, prior_s, n_gt = _image_loss(
        jnp.full((P, C), 0.2), jnp.full((P, 4), 8.0), jnp.full((P,), 0.2),
        jnp.zeros((C, 2)), jnp.ones((C, 2)), jnp.asarray(pts),
        jnp.asarray(pstr), jnp.zeros((G, 4)), jnp.zeros(G, jnp.int32),
        jnp.zeros(G, bool), cfg)
    assert float(pos_s) == 0.0
    assert float(center_n) == 0.0
    assert float(prior_s) == 0.0
    assert float(neg_s) > 0.0  # all points are plain negatives


def test_neg_weight_later_gt_wins():
    """Two same-label gts covering a point: the reference scatters per
    gt in order so the LAST gt's normalized weight lands
    (autoassign_head.py:298-304)."""
    from aod_meh_hua_tpu.engine.autoassign import _image_loss, autoassign_points

    cfg = tiny_autoassign_config()
    pts, pstr = autoassign_points(cfg.featmap_sizes(), cfg.strides)
    P = pts.shape[0]
    G, C = cfg.max_gt, cfg.num_classes
    gt = np.zeros((G, 4), np.float32)
    gt[0] = [8, 8, 56, 56]
    gt[1] = [16, 16, 48, 48]
    labels = np.zeros(G, np.int32)
    labels[:2] = 2
    valid = np.zeros(G, bool)
    valid[:2] = True
    # just exercise the scan path end-to-end; numerically the loss must
    # stay finite with overlapping same-label gts
    pos_s, neg_s, center_n, prior_s, n_gt = _image_loss(
        jnp.full((P, C), 0.3), jnp.full((P, 4), 10.0), jnp.full((P,), 0.3),
        jnp.zeros((C, 2)), jnp.ones((C, 2)), jnp.asarray(pts),
        jnp.asarray(pstr), jnp.asarray(gt), jnp.asarray(labels),
        jnp.asarray(valid), cfg)
    for v in (pos_s, neg_s, center_n, prior_s):
        assert np.isfinite(float(v))
    assert float(n_gt) == 2.0


@pytest.fixture(scope="module")
def autoassign_setup():
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.autoassign import (
        make_autoassign_eval_step, make_autoassign_train_step)
    from aod_meh_hua_tpu.models import init_autoassign
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_autoassign_config()
    model, variables = init_autoassign(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(lr=0.01, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_autoassign_train_step(model, cfg, tx)
    eval_step = make_autoassign_eval_step(model, cfg)

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


def test_autoassign_train_step_runs(autoassign_setup):
    cfg, state, train_step, eval_step, batch = autoassign_setup
    own = jax.tree.map(jnp.array, state)
    _, aux = train_step(own, batch)
    for k in ("loss", "loss_pos", "loss_neg", "loss_center"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) == 2.0


def test_autoassign_center_prior_gets_gradients(autoassign_setup):
    """The learnable CenterPrior mean/sigma must receive gradients
    through the pos + center losses (they are the point of the paper)."""
    cfg, state, train_step, eval_step, batch = autoassign_setup
    from aod_meh_hua_tpu.engine.autoassign import make_autoassign_loss_fn
    from aod_meh_hua_tpu.models import init_autoassign

    model, variables = init_autoassign(cfg, jax.random.PRNGKey(1))
    loss_fn, pts, pstr = make_autoassign_loss_fn(model, cfg)
    grads = jax.grad(
        lambda p: loss_fn(p, variables.get("batch_stats", {}), batch,
                          jnp.asarray(pts), jnp.asarray(pstr))[0]
    )(variables["params"])
    gm = np.asarray(grads["head"]["prior_mean"])
    gs = np.asarray(grads["head"]["prior_sigma"])
    assert np.abs(gm).sum() > 0
    assert np.abs(gs).sum() > 0


def test_autoassign_overfits_and_detects(autoassign_setup):
    cfg, state, train_step, eval_step, batch = autoassign_setup
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
