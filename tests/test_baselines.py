"""Ensemble and MC-dropout baseline scorer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from aod_meh_hua_tpu.utils.config import tiny_test_config
from aod_meh_hua_tpu.models import init_retinanet, build_retinanet
from aod_meh_hua_tpu.engine import EvalBatch
from aod_meh_hua_tpu.al.baselines import (
    make_ensemble_score_step,
    make_mc_dropout_score_step,
    _sig_entropy,
)

CFG = tiny_test_config()


def _batch(rng, b=2):
    h, w = CFG.canvas
    return EvalBatch(
        jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 0.1),
        jnp.asarray(np.tile([[h, w]], (b, 1)).astype(np.int32)),
        jnp.ones((b, 4), jnp.float32),
        jnp.ones(b, dtype=bool),
    )


def test_ensemble_mi_matches_transcription(rng):
    model, v1 = init_retinanet(CFG, jax.random.PRNGKey(1))
    _, v2 = init_retinanet(CFG, jax.random.PRNGKey(2))
    _, v3 = init_retinanet(CFG, jax.random.PRNGKey(3))
    batch = _batch(rng)
    got = np.asarray(make_ensemble_score_step(model, CFG)([v1, v2, v3], batch))

    # direct numpy transcription of ComputeMI
    outs = [np.asarray(model.apply(v, batch.images, with_meh=False)[0]) for v in (v1, v2, v3)]
    bounds = CFG.level_bounds()
    want = []
    for b in range(2):
        per_scale = []
        for (s0, s1) in bounds:
            preds = 1 / (1 + np.exp(-np.stack([o[b, s0:s1] for o in outs])))  # [3, Al, C]
            avg = preds.mean(0)
            total = -(avg * np.log(avg)).sum(-1)
            ale = (-(preds * np.log(preds)).sum(-1)).mean(0)
            per_scale.append((total - ale).mean())
        want.append(np.mean(per_scale))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_identical_members_zero_epistemic(rng):
    model, v = init_retinanet(CFG, jax.random.PRNGKey(1))
    batch = _batch(rng)
    got = np.asarray(make_ensemble_score_step(model, CFG)([v, v, v], batch))
    np.testing.assert_allclose(got, 0.0, atol=1e-4)


def test_mc_dropout_step(rng):
    mc_cfg = replace(CFG, mc_dropout=0.1)
    _, variables = init_retinanet(CFG, jax.random.PRNGKey(1))
    mc_model = build_retinanet(mc_cfg)  # same params, dropout active
    batch = _batch(rng)
    step = make_mc_dropout_score_step(mc_model, mc_cfg, num_passes=4)
    u1 = np.asarray(step(variables, batch, jax.random.PRNGKey(0)))
    u2 = np.asarray(step(variables, batch, jax.random.PRNGKey(7)))
    assert u1.shape == (2,)
    assert np.isfinite(u1).all() and (u1 > 0).all()  # stochastic passes disagree
    assert not np.allclose(u1, u2)  # different keys -> different MC estimates


def test_mc_dropout_zero_rate_is_deterministic(rng):
    _, variables = init_retinanet(CFG, jax.random.PRNGKey(1))
    model = build_retinanet(CFG)  # mc_dropout = 0
    batch = _batch(rng)
    step = make_mc_dropout_score_step(model, CFG, num_passes=3)
    u = np.asarray(step(variables, batch, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(u, 0.0, atol=1e-4)  # identical passes -> MI 0
