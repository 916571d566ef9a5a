"""End-to-end engine tests on a tiny synthetic setup (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aod_meh_hua_tpu.utils.config import tiny_test_config, TrainConfig
from aod_meh_hua_tpu.models import init_retinanet
from aod_meh_hua_tpu.engine import (
    Batch,
    EvalBatch,
    create_train_state,
    make_train_step,
    make_eval_step,
    make_score_step,
    detections_to_per_class,
    schedule_lr,
)
from aod_meh_hua_tpu.engine.train import set_learning_rate, frozen_mask
from aod_meh_hua_tpu.ops import AnchorGenerator, anchor_valid_flags


CFG = tiny_test_config()
TCFG = TrainConfig(batch_size=2)


def _gen():
    return AnchorGenerator(
        strides=CFG.anchor.strides, ratios=CFG.anchor.ratios,
        octave_base_scale=CFG.anchor.octave_base_scale,
        scales_per_octave=CFG.anchor.scales_per_octave,
    )


def _make_batch(rng, b=2):
    h, w = CFG.canvas
    images = rng.randn(b, h, w, 3).astype(np.float32) * 0.1
    g = CFG.max_gt
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_labels = np.zeros((b, g), np.int32)
    gt_valid = np.zeros((b, g), bool)
    for i in range(b):
        n = rng.randint(1, 4)
        for j in range(n):
            x1, y1 = rng.uniform(0, w - 80), rng.uniform(0, h - 80)
            bw, bh = rng.uniform(30, 70), rng.uniform(30, 70)
            gt_boxes[i, j] = [x1, y1, x1 + bw, y1 + bh]
            gt_labels[i, j] = rng.randint(0, CFG.num_classes)
            gt_valid[i, j] = True
    shapes = np.tile([[h, w]], (b, 1)).astype(np.int32)
    av = anchor_valid_flags(_gen(), CFG.featmap_sizes(), shapes)
    return Batch(
        jnp.asarray(images), jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_valid), jnp.asarray(av), jnp.asarray(shapes),
    )


@pytest.fixture(scope="module")
def _model():
    model, variables = init_retinanet(CFG, jax.random.PRNGKey(0))
    _, tx = create_train_state(model, variables, TCFG)
    step = make_train_step(model, CFG, tx)
    return model, variables, tx, step


@pytest.fixture
def model_state(_model):
    model, variables, tx, step = _model
    # fresh, deep-copied state per test: train_step donates its input
    # state, which would otherwise delete the shared variables' buffers
    fresh = jax.tree.map(jnp.array, variables)
    state, _ = create_train_state(model, fresh, TCFG)
    return model, variables, state, tx, step


def test_train_step_runs_and_learns(model_state, rng):
    model, _, state, tx, step = model_state
    batch = _make_batch(rng)
    losses = []
    for _ in range(6):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits a fixed batch
    assert float(aux["loss_meh"]) > 0
    assert int(state.step) == 6


def test_frozen_params_do_not_move(model_state, rng):
    model, variables, state, tx, step = model_state
    p0 = jax.tree.map(lambda x: x.copy(), state.params)
    state2, _ = step(state, _make_batch(rng))
    mask = frozen_mask(p0)
    diffs = jax.tree.map(lambda a, b, m: float(jnp.abs(a - b).max()) if not m else None,
                         p0, state2.params, mask)
    frozen_moved = jax.tree.map(
        lambda a, b, m: float(jnp.abs(a - b).max()) if m else None, p0, state2.params, mask
    )
    moved = [d for d in jax.tree.leaves(diffs) if d is not None]
    frozen = [d for d in jax.tree.leaves(frozen_moved) if d is not None]
    assert max(frozen) == 0.0
    assert max(moved) > 0.0


def test_meh_gradient_partition(model_state, rng):
    """MEH grads only touch the lambda branch; main grads never do."""
    from aod_meh_hua_tpu.engine.train import make_loss_fn

    model, variables, state, _, _ = model_state
    loss_fn, anchors = make_loss_fn(model, CFG)
    batch = _make_batch(rng)

    def meh_only(params):
        _, aux = loss_fn(params, state.batch_stats, batch, anchors)
        return aux["loss_meh"]

    grads = jax.jit(jax.grad(meh_only))(state.params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        keys = "/".join(getattr(p, "key", str(p)) for p in path)
        nz = float(jnp.abs(g).max()) > 0
        in_meh = ("L_convs" in keys) or ("retina_L" in keys)
        if nz:
            assert in_meh, f"MEH loss leaked gradient into {keys}"


def test_schedule_lr():
    t = TrainConfig(outer_epoch=2, epoch_ratio=(3, 1), lr_step_epoch=2, lr=0.001)
    assert schedule_lr(t, 0, 0) == 0.001
    assert schedule_lr(t, 0, 2) == 0.001  # no step outside the final outer epoch
    assert schedule_lr(t, 1, 1) == 0.001
    assert schedule_lr(t, 1, 2) == pytest.approx(1e-4)


def test_set_learning_rate(model_state):
    _, _, state, _, _ = model_state
    new = set_learning_rate(state.opt_state, 0.5)
    assert float(new[0].hyperparams["learning_rate"]) == 0.5


def _eval_batch(rng, b=2):
    h, w = CFG.canvas
    images = rng.randn(b, h, w, 3).astype(np.float32) * 0.1
    shapes = np.tile([[h - 10, w - 20]], (b, 1)).astype(np.int32)
    sf = np.ones((b, 4), np.float32) * 1.6
    return EvalBatch(jnp.asarray(images), jnp.asarray(shapes), jnp.asarray(sf),
                     jnp.ones(b, dtype=bool))


def test_eval_step_shapes(model_state, rng):
    model, variables, _, _, _ = model_state
    step = make_eval_step(model, CFG)
    dets = step(variables, _eval_batch(rng))
    assert dets.boxes.shape == (2, CFG.test.max_per_img, 4)
    per_cls = detections_to_per_class(dets, CFG.num_classes)
    assert len(per_cls) == 2 and len(per_cls[0]) == CFG.num_classes
    # rescaled boxes stay within original-image bounds
    for img in per_cls:
        for arr in img:
            if len(arr):
                assert arr[:, :4].max() <= (CFG.canvas[1] / 1.6) + 1e-3


def test_score_step_runs(model_state, rng):
    model, variables, _, _, _ = model_state
    step = make_score_step(model, CFG)
    unc, maxconf = step(variables, _eval_batch(rng))
    assert unc.shape == (2,) and maxconf.shape == (2,)
    assert np.isfinite(np.asarray(unc)).all()
    assert (np.asarray(maxconf) > 0).all() and (np.asarray(maxconf) <= 1).all()


def test_score_step_scale_pools(model_state, rng):
    from dataclasses import replace

    model, variables, _, _, _ = model_state
    for pool, agg in (("Entropy_ALL", "scaleAvg_classAvg"), ("Entropy_NoNMS", "scaleSum_classSum")):
        cfg2 = replace(CFG, hua=replace(CFG.hua, pool=pool, agg=agg))
        step = make_score_step(model, cfg2)
        unc, _ = step(variables, _eval_batch(rng))
        assert np.isfinite(np.asarray(unc)).all()


def test_selector_max_prob_matches_full_softmax(model_state, rng):
    """Candidates.max_prob (getMaxConf fused into the selector) equals
    the standalone full-map softmax max up to the relu-transform's
    1/(1+eps) constant — ranking-identical by construction."""
    import jax
    import jax.numpy as jnp

    from aod_meh_hua_tpu.engine.postprocess import make_candidate_selector

    model, variables, _, _, _ = model_state
    cfg = CFG
    select, anchors_host = make_candidate_selector(cfg)
    h, w = cfg.canvas
    images = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
    shapes = jnp.asarray(np.tile([[h, w]], (2, 1)).astype(np.int32))
    cls_scores, bbox_preds, lambdas = model.apply(variables, images)
    cand = select(jnp.asarray(anchors_host), cls_scores, bbox_preds, lambdas, shapes)
    want = jax.nn.softmax(cls_scores, axis=-1).reshape(2, -1).max(axis=-1)
    np.testing.assert_allclose(np.asarray(cand.max_prob), np.asarray(want),
                               rtol=1e-5)


def test_fast_topk_score_step(model_state, rng):
    """test_cfg.fast_topk routes candidate selection through
    approx_max_k; scores stay finite and close to the exact path."""
    import dataclasses

    import jax.numpy as jnp

    from aod_meh_hua_tpu.engine import EvalBatch, make_score_step

    model, variables, _, _, _ = model_state
    cfg = CFG
    h, w = cfg.canvas
    batch = EvalBatch(
        jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32)),
        jnp.asarray(np.tile([[h, w]], (2, 1)).astype(np.int32)),
        jnp.ones((2, 4), np.float32), np.ones(2, bool))
    u_exact, mc_exact = make_score_step(model, cfg)(variables, batch)
    fcfg = dataclasses.replace(cfg, test=dataclasses.replace(cfg.test, fast_topk=True))
    u_fast, mc_fast = make_score_step(model, fcfg)(variables, batch)
    assert np.isfinite(np.asarray(u_fast)).all()
    np.testing.assert_allclose(np.asarray(mc_fast), np.asarray(mc_exact), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u_fast), np.asarray(u_exact),
                               rtol=0.05, atol=1e-5)
