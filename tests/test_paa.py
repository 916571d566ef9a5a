"""PAA family: on-device GMM separation, probabilistic reassignment,
IoU-prediction branch, score voting (parity targets: reference
paa_head.py, cited in aod_meh_hua_tpu/engine/paa.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_paa_config


def test_gmm_separates_bimodal_losses():
    """Clearly bimodal candidate losses: the low-loss cluster is
    component 0 (the reference's fg component by means init); sklearn
    agrees on the assignment."""
    from aod_meh_hua_tpu.engine.paa import gmm_fit_predict_1d

    x = np.array([0.1, 0.12, 0.11, 3.0, 3.1, 2.9, 0.09, 3.05], np.float32)
    pred0, score = gmm_fit_predict_1d(jnp.asarray(x), jnp.ones(8, bool))
    np.testing.assert_array_equal(
        np.asarray(pred0), x < 1.0)
    assert np.isfinite(np.asarray(score)).all()

    # sklearn cross-check with the reference's exact init
    import sklearn.mixture as skm

    gmm = skm.GaussianMixture(
        2, weights_init=np.array([0.5, 0.5]),
        means_init=np.array([[x.min()], [x.max()]]),
        precisions_init=np.ones((2, 1, 1)))
    gmm.fit(np.sort(x)[:, None])
    ours0, _ = gmm_fit_predict_1d(jnp.asarray(np.sort(x)), jnp.ones(8, bool))
    np.testing.assert_array_equal(np.asarray(ours0),
                                  gmm.predict(np.sort(x)[:, None]) == 0)

    # padded entries must not poison the EM (0 * inf NaN regression)
    xp = np.concatenate([x, [1e30] * 4]).astype(np.float32)
    vp = np.array([True] * 8 + [False] * 4)
    pred0, score = gmm_fit_predict_1d(jnp.asarray(xp), jnp.asarray(vp))
    assert np.isfinite(np.asarray(score)[:8]).all()
    np.testing.assert_array_equal(np.asarray(pred0)[:8], x < 1.0)


def test_paa_reassign_keeps_low_loss_prefix():
    from aod_meh_hua_tpu.engine.paa import _paa_reassign_single
    from aod_meh_hua_tpu.ops.assigner import max_iou_assign
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_paa_config()
    gen = cfg.build_anchor_generator()
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(cfg.featmap_sizes())))
    g = cfg.max_gt
    gt = np.zeros((g, 4), np.float32)
    gt[0] = [8, 8, 40, 40]
    gv = np.zeros((g,), bool)
    gv[0] = True
    shapes = np.asarray([[64, 128]], np.int32)
    av = anchor_valid_flags(gen, cfg.featmap_sizes(), shapes)[0]
    assigned = max_iou_assign(anchors, jnp.asarray(gt), jnp.asarray(gv),
                              anchor_valid=jnp.asarray(av),
                              pos_iou_thr=0.1, neg_iou_thr=0.1,
                              min_pos_iou=0.0)
    a = np.asarray(assigned)
    assert (a > 0).sum() > 10  # loose initial assign finds candidates

    bounds = cfg.level_bounds()
    lvl = jnp.asarray(np.concatenate([
        np.full(s1 - s0, i, np.int32) for i, (s0, s1) in enumerate(bounds)]))
    # bimodal candidate losses: candidates on even indices cheap
    rng = np.random.RandomState(0)
    base = np.where(np.arange(a.shape[0]) % 2 == 0, 0.1, 3.0)
    pos_loss = jnp.asarray(np.where(a > 0, base + rng.rand(a.shape[0]) * 0.05,
                                    1e30).astype(np.float32))
    mask = np.asarray(_paa_reassign_single(
        pos_loss, assigned, lvl, jnp.asarray(gv), cfg, len(bounds)))
    assert mask.sum() > 0
    # every kept anchor is a cheap candidate
    assert (np.asarray(pos_loss)[mask] < 1.0).all()


@pytest.fixture(scope="module")
def paa_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.paa import make_paa_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_paa_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_paa_train_step(model, cfg, tx)
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


def test_paa_train_step_finite(paa_setup):
    cfg, state, train_step, eval_step, batch = paa_setup
    own = jax.tree.map(jnp.array, state)
    state1, aux = train_step(own, batch)
    for k in ("loss", "loss_cls", "loss_bbox", "loss_iou"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) >= 2.0


def test_paa_overfits_and_detects(paa_setup):
    """300 steps recover both synthetic boxes (score-voted output)."""
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps
    from aod_meh_hua_tpu.engine.batch import EvalBatch

    cfg, state, train_step, eval_step, batch = paa_setup
    state = jax.tree.map(jnp.array, state)
    for _ in range(300):
        state, aux = train_step(state, batch)
    assert float(aux["loss"]) < 1.0

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
        assert iou > 0.6, (b, bx[b, i], iou)
        assert lb[b, i] == lab
