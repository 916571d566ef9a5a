"""Semi-supervised pseudo-label branch tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aod_meh_hua_tpu.utils.config import tiny_test_config, TrainConfig
from aod_meh_hua_tpu.models import init_retinanet
from aod_meh_hua_tpu.engine import create_train_state
from aod_meh_hua_tpu.engine.ssl import make_pseudo_loss_fn, make_pseudo_train_step

from test_engine import _make_batch  # reuse the synthetic batch builder

CFG = tiny_test_config()


@pytest.fixture(scope="module")
def setup():
    model, variables = init_retinanet(CFG, jax.random.PRNGKey(0))
    state, tx = create_train_state(model, variables, TrainConfig(batch_size=2))
    return model, variables, tx


def test_pseudo_loss_finite(setup, rng):
    model, variables, _ = setup
    loss_fn, anchors = make_pseudo_loss_fn(model, CFG)
    batch = _make_batch(rng)
    total, aux = jax.jit(loss_fn)(variables["params"], variables["batch_stats"], batch, anchors)
    assert np.isfinite(float(total))
    assert float(aux["loss_bbox"]) >= 0
    assert float(aux["loss_meh"]) >= 0


def test_pseudo_cls_magnitude_pinned_to_bbox(setup, rng):
    """cR1: when both losses are active, total cls value == total bbox
    value per level; with untrained nets both are usually 0 (no
    confident anchors) — force confidence via a scaled logit model."""
    model, variables, _ = setup
    loss_fn, anchors = make_pseudo_loss_fn(model, CFG, prob_threshold=0.0)
    batch = _make_batch(rng)
    _, aux = jax.jit(loss_fn)(variables["params"], variables["batch_stats"], batch, anchors)
    # with threshold 0 every anchor proposes; both terms active
    assert float(aux["loss_bbox"]) > 0
    assert float(aux["loss_cls"]) == pytest.approx(float(aux["loss_bbox"]), rel=1e-3)


def test_pseudo_train_step_updates(setup, rng):
    model, variables, tx = setup
    fresh = jax.tree.map(jnp.array, variables)
    state, _ = create_train_state(model, fresh, TrainConfig(batch_size=2))
    step = make_pseudo_train_step(model, CFG, tx)
    p0 = jax.tree.map(lambda x: x.copy(), state.params)
    state, aux = step(state, _make_batch(rng))
    assert np.isfinite(float(aux["loss"]))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, state.params)
    assert max(jax.tree.leaves(moved)) >= 0  # step executed and returned new state
