"""Fused Pallas bottleneck (ops/fused_block.py) vs the unfused flax
Bottleneck (models/resnet.py) — exact math, verified in interpret mode
on CPU; the on-chip timing lives in tools/analysis/pallas_probe.py
--block."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aod_meh_hua_tpu.models.resnet import Bottleneck
from aod_meh_hua_tpu.ops.fused_block import (
    FoldedBlock, fold_bottleneck, fused_bottleneck, pick_tile_h)


def _random_variables(key, model, x):
    variables = model.init(key, x)
    # randomize BN stats so folding is actually exercised
    rng = np.random.RandomState(3)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.uniform(0.2, 1.5, a.shape).astype(a.dtype)),
        variables["batch_stats"])
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(a.dtype) * 0.1),
        variables["params"])
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("downsample", [False, True])
@pytest.mark.parametrize("shape", [(2, 16, 24, 32), (1, 19, 8, 16)])
def test_fused_matches_unfused_f32(downsample, shape):
    b, h, w, cin = shape
    planes = cin // 4 if not downsample else cin // 2
    model = Bottleneck(planes=planes, stride=1, downsample=downsample)
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    if not downsample:
        # identity residual requires cout == cin
        model = Bottleneck(planes=cin // 4, stride=1, downsample=False)
    variables = _random_variables(jax.random.PRNGKey(0), model, x)
    want = model.apply(variables, x)

    fb = fold_bottleneck(variables["params"], variables["batch_stats"])
    got = fused_bottleneck(x, fb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_single_tile_and_multi_tile_agree():
    """nt=1 (both halo rows zeroed in one program) equals nt>1 tiling."""
    b, h, w, cin = 1, 12, 8, 16
    model = Bottleneck(planes=4, stride=1, downsample=False)
    x = jnp.asarray(np.random.RandomState(1).randn(b, h, w, cin).astype(np.float32))
    variables = _random_variables(jax.random.PRNGKey(1), model, x)
    fb = fold_bottleneck(variables["params"], variables["batch_stats"])
    a = fused_bottleneck(x, fb, tile_h=12, interpret=True)
    c = fused_bottleneck(x, fb, tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_fused_bf16_close():
    b, h, w, cin = 1, 16, 16, 32
    model = Bottleneck(planes=8, stride=1, downsample=False, dtype=jnp.bfloat16)
    x32 = np.random.RandomState(2).randn(b, h, w, cin).astype(np.float32) * 0.5
    x = jnp.asarray(x32, jnp.bfloat16)
    variables = _random_variables(jax.random.PRNGKey(2), model, x)
    want = np.asarray(model.apply(variables, x)).astype(np.float32)
    fb = fold_bottleneck(variables["params"], variables["batch_stats"])
    got = np.asarray(fused_bottleneck(x, fb, interpret=True)).astype(np.float32)
    # bf16 rounding + f32-accumulate differences only
    scale = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() / scale < 0.06


def test_pick_tile_h():
    assert pick_tile_h(152) == 8
    assert pick_tile_h(76) == 4
    assert pick_tile_h(256) == 8
    assert pick_tile_h(7) == 7
    assert pick_tile_h(1) == 1


def test_unaligned_channels_fall_back_exactly():
    """Mosaic requires HBM lane-dim slices to be 128-aligned (measured
    on v5e: the 64-channel stem output crashed the halo DMA), so
    Bottleneck(fused=True) with cin % 128 != 0 must take the unfused
    path — same variable tree, identical output."""
    import jax

    from aod_meh_hua_tpu.models.resnet import Bottleneck

    x = jnp.asarray(
        np.random.RandomState(3).randn(1, 8, 8, 64).astype(np.float32))
    m_f = Bottleneck(planes=16, stride=1, downsample=True, fused=True)
    m_u = Bottleneck(planes=16, stride=1, downsample=True, fused=False)
    v = m_u.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(m_f.apply(v, x)), np.asarray(m_u.apply(v, x)))
