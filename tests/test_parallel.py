"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_mesh_helpers():
    from aod_meh_hua_tpu.parallel import make_mesh, shard_batch, replicate

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    x = jnp.zeros((16, 4))
    sx = shard_batch(x, mesh)
    assert len(sx.sharding.device_set) == 8
    r = replicate({"w": jnp.ones((3, 3))}, mesh)
    assert r["w"].sharding.is_fully_replicated


def test_dryrun_multichip_full_path():
    """The driver's multichip dryrun: sharded train + score on 8 devices."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally


def test_init_distributed_single_process():
    from aod_meh_hua_tpu.parallel.launch import init_distributed

    info = init_distributed(num_processes=1, process_id=0)
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1
