"""Baseline uncertainty scorers: deep-ensemble MI and MC-dropout MI.

Behavioral parity targets (reference, /root/reference):
* mmdet/apis/CalEnsembleUnc.py:137-180 — 3 independently trained models;
  per-scale raw class logits -> sigmoid; "entropy" computed directly on
  the (unnormalized) sigmoid vector: H = -sum_c s_c log s_c; epistemic =
  H(mean over members) - mean member H; per-image score = mean over
  anchors per scale, then mean over scales. The sigmoid outputs do not
  form a distribution — the reference's formula is reproduced verbatim.
* mmdet/apis/CalMCDropoutUnc.py:137-199 — 25 stochastic passes of a
  model with Dropout2d(0.1) after every ReLU (functions.py:492-505),
  same MI formula across passes.

TPU redesign: passes/members stack into one batched axis; the MI and the
per-scale means are fused reductions on-device; MC passes loop via
lax.scan accumulating the two sufficient statistics (sum of sigmoids,
sum of entropies) so 25 passes never materialize together.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.batch import EvalBatch, prepare_images


def _sig_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """The reference's -sum s*log(s) over sigmoid outputs (unnormalized)."""
    s = jax.nn.sigmoid(logits)
    return -(s * jnp.log(jnp.maximum(s, 1e-38))).sum(axis=-1)


def _scale_mean_epistemic(sum_sig, sum_h, n, bounds):
    """epistemic per anchor -> mean per scale -> mean over scales [B]."""
    avg = sum_sig / n
    total = -(avg * jnp.log(jnp.maximum(avg, 1e-38))).sum(axis=-1)  # [B, A]
    ale = sum_h / n
    epi = total - ale
    per_scale = [epi[:, s0:s1].mean(axis=1) for (s0, s1) in bounds]
    return jnp.stack(per_scale, axis=1).mean(axis=1)


def make_ensemble_score_step(model, cfg):
    """score(variables_list, batch) -> [B]; 3+ member ensembles."""
    bounds = cfg.level_bounds()

    def step(variables_list: Sequence, batch: EvalBatch):
        sum_sig = None
        sum_h = None
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        for variables in variables_list:
            cls, _, _ = model.apply(variables, images, with_meh=False)
            sig = jax.nn.sigmoid(cls)
            h = _sig_entropy(cls)
            sum_sig = sig if sum_sig is None else sum_sig + sig
            sum_h = h if sum_h is None else sum_h + h
        return _scale_mean_epistemic(sum_sig, sum_h, len(variables_list), bounds)

    return jax.jit(step)


def make_mc_dropout_score_step(model, cfg, num_passes: int = 25):
    """score(variables, batch, key) -> [B].

    `model` must be built with cfg.mc_dropout > 0 (dropout active); the
    trained parameters are structure-compatible (dropout has no params).
    """
    bounds = cfg.level_bounds()

    def step(variables, batch: EvalBatch, key: jax.Array):
        keys = jax.random.split(key, num_passes)

        def one_pass(carry, k):
            sum_sig, sum_h = carry
            cls, _, _ = model.apply(variables,
                                    prepare_images(batch.images, batch.img_shapes, cfg),
                                    with_meh=False,
                                    rngs={"dropout": k})
            return (sum_sig + jax.nn.sigmoid(cls), sum_h + _sig_entropy(cls)), None

        a_tot = bounds[-1][1]
        b = batch.images.shape[0]
        init = (jnp.zeros((b, a_tot, cfg.cls_out_channels)), jnp.zeros((b, a_tot)))
        (sum_sig, sum_h), _ = jax.lax.scan(one_pass, init, keys)
        return _scale_mean_epistemic(sum_sig, sum_h, num_passes, bounds)

    return jax.jit(step)


def score_pool_ensemble(model, variables_list, cfg, loader, num_images) -> np.ndarray:
    steps = {}
    out = np.zeros(num_images)
    for orientation, batch, idx in loader:
        if orientation not in steps:
            steps[orientation] = make_ensemble_score_step(model, cfg.for_orientation(orientation))
        u = np.asarray(steps[orientation](variables_list, batch))
        valid = np.asarray(batch.valid)[: len(idx)]
        out[idx[valid]] = u[: len(idx)][valid]
    return out


def score_pool_mc_dropout(model, variables, cfg, loader, num_images, key,
                          num_passes: int = 25) -> np.ndarray:
    steps = {}
    out = np.zeros(num_images)
    for orientation, batch, idx in loader:
        if orientation not in steps:
            steps[orientation] = make_mc_dropout_score_step(
                model, cfg.for_orientation(orientation), num_passes)
        key, sub = jax.random.split(key)
        u = np.asarray(steps[orientation](variables, batch, sub))
        valid = np.asarray(batch.valid)[: len(idx)]
        out[idx[valid]] = u[: len(idx)][valid]
    return out
