"""Flip-consistency SSL (SelfSSL_* family): the loss transcribes
old_codes/SelfSSL_EDL_RetinaSoft.py:197-214 — flip the flipped image's
score maps back along W per level and penalize the squared softmax
difference."""

import numpy as np
import jax
import jax.numpy as jnp

from aod_meh_hua_tpu.engine.self_ssl import (
    flip_level_maps_w, self_ssl_consistency_loss, make_self_ssl_loss_fn)
from aod_meh_hua_tpu.utils.config import tiny_test_config


def _flat(maps, a, c):
    """Flatten [B, H, W, a*C] level maps the way the heads do."""
    return np.concatenate(
        [m.reshape(m.shape[0], -1, c) for m in maps], axis=1)


def test_flip_level_maps_w_matches_numpy():
    rng = np.random.RandomState(0)
    b, a, c = 2, 3, 5
    feats = [(4, 6), (2, 3)]
    maps = [rng.randn(b, h, w, a * c).astype(np.float32) for h, w in feats]
    flat = _flat(maps, a, c)
    got = np.asarray(flip_level_maps_w(jnp.asarray(flat), feats, a))
    want = _flat([m[:, :, ::-1] for m in maps], a, c)
    np.testing.assert_allclose(got, want)


def test_consistency_loss_zero_for_mirrored_outputs():
    """If the flipped image's scores ARE the mirror of the original's
    (a perfectly flip-equivariant detector), the loss is exactly 0."""
    rng = np.random.RandomState(1)
    b, a, c = 2, 3, 5
    feats = [(4, 6), (2, 3)]
    maps = [rng.randn(b, h, w, a * c).astype(np.float32) for h, w in feats]
    flat = _flat(maps, a, c)
    mirrored = _flat([m[:, :, ::-1] for m in maps], a, c)
    loss = float(self_ssl_consistency_loss(
        jnp.asarray(flat), jnp.asarray(mirrored), feats, a))
    assert loss == 0.0


def test_consistency_loss_matches_transcription():
    rng = np.random.RandomState(2)
    b, a, c = 2, 3, 5
    feats = [(4, 6), (2, 3)]
    maps = [rng.randn(b, h, w, a * c).astype(np.float32) for h, w in feats]
    maps_f = [rng.randn(b, h, w, a * c).astype(np.float32) for h, w in feats]

    def soft(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    # reference: per level, clsFlip = flip(W); sum((softmax - softmax)^2)
    want = 0.0
    for m, mf in zip(maps, maps_f):
        p = soft(m.reshape(-1, c).astype(np.float64))
        q = soft(mf[:, :, ::-1].reshape(-1, c).astype(np.float64))
        want += ((p - q) ** 2).sum()

    got = float(self_ssl_consistency_loss(
        jnp.asarray(_flat(maps, a, c)), jnp.asarray(_flat(maps_f, a, c)),
        feats, a))
    assert abs(got - want) < 1e-4 * max(1.0, abs(want))


def test_self_ssl_loss_fn_runs_and_differentiates():
    cfg = tiny_test_config()
    from aod_meh_hua_tpu.models import init_retinanet

    model, variables = init_retinanet(cfg, jax.random.PRNGKey(0))
    loss_fn = make_self_ssl_loss_fn(model, cfg)
    imgs = jnp.asarray(
        np.random.RandomState(3).randn(1, *cfg.canvas, 3), jnp.float32)
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn({**variables, "params": p}, imgs))(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) >= 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)
