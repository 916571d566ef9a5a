"""Dirichlet uncertainty: mutual information (epistemic), aleatoric, total.

Behavioral parity target (reference, /root/reference):
* mmdet/models/dense_heads/Lambda_L2.py:519-525 — draw 500 samples from
  Dirichlet(alpha), total = H(mean(samples)), aleatoric = mean(H(samples)),
  epistemic = total - aleatoric (mutual information).

TPU redesign: the reference's 500-sample Monte-Carlo estimate converges to
a closed form. For a Dirichlet with concentrations a (S = sum a, p = a/S):

  E[H(sample)]  = -sum_i p_i * (digamma(a_i + 1) - digamma(S + 1))
  H(E[sample])  = -sum_i p_i * log(p_i)
  MI            = H(E[sample]) - E[H(sample)]

`dirichlet_mutual_information` computes this exactly in a handful of fused
VPU ops — it is both the fast path (no 500x sampling work, no RNG) and the
more accurate estimator (zero MC variance), which is what acquisition
ranking actually needs. `dirichlet_mi_sampled` keeps a seeded, chunked
Monte-Carlo mode for apples-to-apples parity experiments against the
reference's noisy estimates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma


class DirichletUncertainty(NamedTuple):
    epistemic: jnp.ndarray  # mutual information
    aleatoric: jnp.ndarray  # expected entropy
    total: jnp.ndarray      # entropy of the expected distribution


def _xlogx(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-38)), 0.0)


def dirichlet_mutual_information(alpha: jnp.ndarray, eps: float = 1e-20) -> DirichletUncertainty:
    """Closed-form Dirichlet uncertainty decomposition over the last axis.

    alpha [..., C] strictly positive concentrations. Returns per-[...] terms.
    """
    alpha = jnp.maximum(alpha, eps)
    s = alpha.sum(axis=-1, keepdims=True)
    p = alpha / s
    total = -_xlogx(p).sum(axis=-1)
    aleatoric = -(p * (digamma(alpha + 1.0) - digamma(s + 1.0))).sum(axis=-1)
    return DirichletUncertainty(total - aleatoric, aleatoric, total)


def dirichlet_mi_sampled(
    key: jax.Array,
    alpha: jnp.ndarray,
    num_samples: int = 500,
    chunk: int = 50,
    eps: float = 1e-20,
) -> DirichletUncertainty:
    """Monte-Carlo estimate matching the reference's sampling scheme.

    Scans over sample chunks to bound memory (chunk x batch x C live at a
    time), accumulating the sample-mean distribution and the mean sample
    entropy — exactly the two statistics the reference reduces to.
    """
    assert num_samples % chunk == 0, "num_samples must be divisible by chunk"
    alpha = jnp.maximum(alpha, eps)
    n_chunks = num_samples // chunk
    keys = jax.random.split(key, n_chunks)

    def step(carry, k):
        sum_p, sum_h = carry
        samples = jax.random.dirichlet(k, alpha, shape=(chunk,) + alpha.shape[:-1])
        sum_p = sum_p + samples.sum(axis=0)
        sum_h = sum_h + (-_xlogx(samples).sum(axis=-1)).sum(axis=0)
        return (sum_p, sum_h), None

    init = (jnp.zeros_like(alpha), jnp.zeros(alpha.shape[:-1], alpha.dtype))
    (sum_p, sum_h), _ = jax.lax.scan(step, init, keys)
    avg = sum_p / num_samples
    total = -_xlogx(avg).sum(axis=-1)
    aleatoric = sum_h / num_samples
    return DirichletUncertainty(total - aleatoric, aleatoric, total)
