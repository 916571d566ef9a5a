"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes (SURVEY.md section 4: the
reference has no multi-device tests at all; we simulate an 8-chip TPU
slice on CPU so sharding logic is exercised in CI).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# A TPU plugin (if preloaded via sitecustomize) overrides JAX_PLATFORMS
# programmatically; force the selection back to CPU before first use so
# tests run on the virtual 8-device CPU mesh, not the real chip.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: fast core-correctness tier (`pytest -m smoke` "
        "finishes in <10 min on a 1-core host; see docs/TESTING.md)")
    config.addinivalue_line(
        "markers", "full: heavy tests excluded from the smoke tier")


# The <10-min smoke tier (VERDICT r3 directive #4): core numerics, the
# live-pair config loaders, one REAL mini AL CLI run, and one mesh
# test. Everything else is the `full` tier. Module-level selection so
# the split is maintained in ONE place; a test inside a smoke module
# can still opt out with an explicit @pytest.mark.full.
SMOKE_MODULES = {
    "test_anchors", "test_bbox", "test_assigner", "test_nms", "test_hua",
    "test_dirichlet", "test_losses", "test_voc_eval", "test_config",
    # plus individually-marked tests: test_al_loop.test_al_two_cycles
    # (one real end-to-end CLI drive) and test_parallel's mesh/launch
    # quartet (explicit @pytest.mark.smoke markers in those modules)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SMOKE_MODULES and item.get_closest_marker("full") is None:
            item.add_marker(pytest.mark.smoke)
        elif item.get_closest_marker("smoke") is None:
            item.add_marker(pytest.mark.full)


@pytest.fixture
def rng():
    return np.random.RandomState(20)
