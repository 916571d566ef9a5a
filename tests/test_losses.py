import numpy as np
import jax.numpy as jnp
import pytest

from aod_meh_hua_tpu.ops import (
    sigmoid_focal_loss,
    edl_softmax_focal_loss,
    edl_relu_loss,
    l1_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
    weight_reduce_loss,
)
from aod_meh_hua_tpu.ops.losses import sigmoid_focal_loss_elementwise


def _focal_np(logits, labels, gamma=2.0, alpha=0.25):
    p = 1 / (1 + np.exp(-logits))
    n, c = logits.shape
    out = np.zeros_like(logits)
    for i in range(n):
        for j in range(c):
            if labels[i] == j:
                out[i, j] = -alpha * (1 - p[i, j]) ** gamma * np.log(p[i, j])
            else:
                out[i, j] = -(1 - alpha) * p[i, j] ** gamma * np.log(1 - p[i, j])
    return out


def test_focal_elementwise_matches_formula(rng):
    logits = rng.randn(6, 4).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 4, 4])  # 4 = background (no positive column)
    got = np.asarray(sigmoid_focal_loss_elementwise(jnp.asarray(logits), jnp.asarray(labels)))
    want = _focal_np(logits, labels)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_focal_background_row_all_negative_terms(rng):
    logits = rng.randn(1, 3).astype(np.float32)
    bg = np.asarray(sigmoid_focal_loss_elementwise(jnp.asarray(logits), jnp.asarray([3])))
    p = 1 / (1 + np.exp(-logits))
    want = -(1 - 0.25) * p**2 * np.log(1 - p)
    np.testing.assert_allclose(bg, want, rtol=1e-3)


def test_focal_reduction_avg_factor(rng):
    logits = rng.randn(8, 4).astype(np.float32)
    labels = rng.randint(0, 5, 8)
    w = rng.uniform(0, 1, 8).astype(np.float32)
    got = float(
        sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w), avg_factor=3.0)
    )
    want = (_focal_np(logits, labels) * w[:, None]).sum() / 3.0
    assert got == pytest.approx(want, rel=1e-3)


def test_edl_softmax_focal_matches_composition(rng):
    """EDL loss == focal loss applied to the softmax pseudo-logits."""
    logits = rng.randn(5, 20).astype(np.float32)
    labels = rng.randint(0, 21, 5)
    eps = 1e-9
    prob = np.exp(logits - logits.max(-1, keepdims=True))
    prob = prob / prob.sum(-1, keepdims=True)
    pseudo = np.log(prob / (1 - prob + eps) + eps)
    want = _focal_np(pseudo, labels).sum()
    got = float(
        edl_softmax_focal_loss(jnp.asarray(logits), jnp.asarray(labels), reduction="sum")
    )
    assert got == pytest.approx(want, rel=1e-3)


def test_edl_relu_loss_formula(rng):
    logits = rng.randn(4, 3).astype(np.float32)
    labels = np.array([0, 1, 2, 3])
    conc = np.maximum(logits, 0) + 1
    s = conc.sum(-1, keepdims=True)
    want = np.zeros(4)
    for i, l in enumerate(labels):
        if l < 3:
            want[i] = np.log(s[i, 0]) - np.log(conc[i, l])
    got = np.asarray(edl_relu_loss(jnp.asarray(logits), jnp.asarray(labels), reduction="none"))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_l1_and_smooth_l1(rng):
    p = rng.randn(6, 4).astype(np.float32)
    t = rng.randn(6, 4).astype(np.float32)
    w = (rng.uniform(0, 1, (6, 4)) > 0.5).astype(np.float32)
    got = float(l1_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w), avg_factor=5.0))
    want = (np.abs(p - t) * w).sum() / 5.0
    assert got == pytest.approx(want, rel=1e-3)

    beta = 1.0
    d = np.abs(p - t)
    sm = np.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    got2 = float(smooth_l1_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w), beta=beta, avg_factor=5.0))
    assert got2 == pytest.approx((sm * w).sum() / 5.0, rel=1e-3)


def test_softmax_ce(rng):
    logits = rng.randn(5, 21).astype(np.float32)
    labels = rng.randint(0, 21, 5)
    got = np.asarray(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), reduction="none"))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    want = -np.log(p[np.arange(5), labels])
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_weight_reduce_broadcast(rng):
    loss = jnp.asarray(rng.rand(4, 3).astype(np.float32))
    w = jnp.asarray(rng.rand(4).astype(np.float32))
    got = float(weight_reduce_loss(loss, w, "mean", avg_factor=2.0))
    want = (np.asarray(loss) * np.asarray(w)[:, None]).sum() / 2.0
    assert got == pytest.approx(want, rel=1e-5)
