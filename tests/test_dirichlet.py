import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aod_meh_hua_tpu.ops import dirichlet_mutual_information, dirichlet_mi_sampled


def test_closed_form_symmetric_dirichlet():
    # Dirichlet(1,...,1) over C classes: p = uniform, total = log C
    c = 8
    alpha = jnp.ones((1, c))
    u = dirichlet_mutual_information(alpha)
    assert float(u.total[0]) == pytest.approx(np.log(c), rel=1e-5)
    # aleatoric = -(1/C) * C * (psi(2) - psi(C+1)) = psi(C+1) - psi(2)
    from scipy.special import digamma as dg  # scipy ships with jax deps? fall back below

    want_ale = dg(c + 1) - dg(2)
    assert float(u.aleatoric[0]) == pytest.approx(want_ale, rel=1e-5)
    assert float(u.epistemic[0]) == pytest.approx(np.log(c) - want_ale, rel=1e-4)


def test_large_alpha_mi_goes_to_zero():
    alpha = jnp.asarray([[1000.0, 2000.0, 500.0]])
    u = dirichlet_mutual_information(alpha)
    assert float(u.epistemic[0]) < 1e-3
    assert float(u.epistemic[0]) >= 0


def test_small_alpha_high_mi():
    u_small = dirichlet_mutual_information(jnp.asarray([[0.1, 0.1, 0.1]]))
    u_big = dirichlet_mutual_information(jnp.asarray([[10.0, 10.0, 10.0]]))
    assert float(u_small.epistemic[0]) > float(u_big.epistemic[0])


def test_sampled_converges_to_closed_form(rng):
    alpha = jnp.asarray(rng.uniform(0.3, 20.0, (16, 20)).astype(np.float32))
    exact = dirichlet_mutual_information(alpha)
    mc = dirichlet_mi_sampled(jax.random.PRNGKey(0), alpha, num_samples=4000, chunk=200)
    np.testing.assert_allclose(np.asarray(mc.total), np.asarray(exact.total), atol=0.02)
    np.testing.assert_allclose(np.asarray(mc.aleatoric), np.asarray(exact.aleatoric), atol=0.02)
    np.testing.assert_allclose(np.asarray(mc.epistemic), np.asarray(exact.epistemic), atol=0.03)


def test_mi_nonnegative_random(rng):
    alpha = jnp.asarray(rng.uniform(1e-4, 50.0, (128, 20)).astype(np.float32))
    u = dirichlet_mutual_information(alpha)
    assert np.isfinite(np.asarray(u.epistemic)).all()
    assert (np.asarray(u.epistemic) >= -1e-5).all()
