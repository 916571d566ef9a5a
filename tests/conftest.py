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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(20)
