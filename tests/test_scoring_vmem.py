"""Scoped-VMEM compile option for the scoring step (engine/jit_options).

The throughput win is measured on-chip (docs/PERF.md: 322.99 ->
327.82 img/s at 32 MiB); these tests pin the gating logic — the option
must never reach the CPU/virtual-mesh backend — and that the scoring
step still runs under each env setting.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke


def test_option_disabled_on_cpu():
    from aod_meh_hua_tpu.engine.jit_options import score_step_compiler_options

    # tests run on the CPU backend (conftest) -> must be None
    assert score_step_compiler_options() is None


def test_env_zero_disables(monkeypatch):
    from aod_meh_hua_tpu.engine import jit_options

    monkeypatch.setenv("AOD_SCOPED_VMEM_KIB", "0")
    assert jit_options.score_step_compiler_options() is None


def test_env_override_value(monkeypatch):
    """On TPU the env value lands in the options dict; emulate the
    backend probe so the CPU test host exercises the TPU branch."""
    from aod_meh_hua_tpu.engine import jit_options

    monkeypatch.setenv("AOD_SCOPED_VMEM_KIB", "12345")

    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(type(jax.config), "jax_platforms", "tpu",
                        raising=False)
    opts = jit_options.score_step_compiler_options()
    assert opts == {"xla_tpu_scoped_vmem_limit_kib": "12345"}


def test_mixed_state_platforms_cpu_wins(monkeypatch):
    """dryrun_multichip flips jax_platforms to 'cpu' AFTER a TPU backend
    may have initialized; default_backend() can still say 'tpu' in that
    mixed state while every compile targets CPU. The config value must
    win — otherwise the driver's multichip dryrun dies with 'No such
    compile option' (regression, 2026-08-19)."""
    import jax

    from aod_meh_hua_tpu.engine import jit_options

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # conftest already runs with jax_platforms == "cpu"
    assert jax.config.jax_platforms and "tpu" not in jax.config.jax_platforms
    assert jit_options.score_step_compiler_options() is None


def test_score_step_runs_with_gated_option():
    """make_score_step on the test backend (option gated off) is the
    production call path — compile and run one tiny batch."""
    import jax
    import jax.numpy as jnp

    from aod_meh_hua_tpu.engine import EvalBatch, make_score_step
    from aod_meh_hua_tpu.models import init_retinanet
    from aod_meh_hua_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config()
    model, variables = init_retinanet(cfg, jax.random.PRNGKey(0))
    step = make_score_step(model, cfg)
    h, w = cfg.canvas
    b = 2
    batch = EvalBatch(jnp.zeros((b, h, w, 3), jnp.float32),
                      jnp.tile(jnp.array([[h, w]], jnp.int32), (b, 1)),
                      jnp.ones((b, 4), jnp.float32),
                      jnp.ones(b, dtype=bool))
    unc, mc = step(variables, batch)
    assert np.isfinite(np.asarray(unc)).all()
    assert np.isfinite(np.asarray(mc)).all()
