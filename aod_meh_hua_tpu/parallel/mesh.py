"""Mesh construction + batch/param sharding helpers.

Replaces (reference, /root/reference): mmcv MMDataParallel /
MMDistributedDataParallel (apis/train_Lambda.py:40, apis/train.py:75-85),
init_dist launchers (tools/train_RetinaNet.py:68,117-123), and
core/utils/dist_utils.py collectives.

Two strategies: data-parallel (the reference implements exactly DP,
SURVEY.md section 2.10 — scale-out axes are the train batch and the
unlabeled pool, sharded on 'data') and, beyond the reference, ZeRO-3
parameter sharding on a second 'fsdp' mesh axis (shard_params_fsdp below)
for families whose params + momentum outgrow one chip's HBM. TP/PP are
deliberately absent: these models are far below the scale where they
pay off.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_local_mesh(axis: str = "data") -> Optional[Mesh]:
    """Mesh over THIS process's devices only, for per-rank work (the
    rank-sliced pool/eval sweeps in multi-host mode). None when the
    process has a single device (plain jit is enough)."""
    devices = jax.local_devices()
    if len(devices) < 2:
        return None
    return Mesh(np.asarray(devices), (axis,))


def mesh_is_multiprocess(mesh: Mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(axis))


def _put(x: Any, sh: NamedSharding, multiprocess: bool):
    if not multiprocess:
        return jax.device_put(x, sh)
    # multi-host: device_put cannot target non-addressable devices; every
    # process holds the identical host value (same-seed loaders /
    # identical init), so each contributes its addressable shards
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place every leaf with its leading axis split over the mesh."""
    sh = data_sharding(mesh, axis)
    mp = mesh_is_multiprocess(mesh)
    return jax.tree.map(lambda x: _put(x, sh, mp), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / optimizer state)."""
    sh = NamedSharding(mesh, P())
    mp = mesh_is_multiprocess(mesh)
    return jax.tree.map(lambda x: _put(x, sh, mp), tree)


# ----- FSDP (ZeRO-3-style parameter sharding) -----
#
# Beyond the reference's DDP (its only strategy): shard every large
# parameter / optimizer-state tensor over an 'fsdp' mesh axis and let
# GSPMD insert the all-gathers at use and reduce-scatters on the grads.
# Expressed purely as NamedSharding placement — the train step itself
# (engine/train.py make_train_step, a plain jit) is unchanged; XLA's
# sharding propagation does the collective scheduling. Composes with
# the 'data' axis on a 2D mesh: batch on P('data'), params on 'fsdp'.


def make_mesh_2d(n_data: int, n_fsdp: int,
                 axes: tuple = ("data", "fsdp"),
                 devices: Optional[list] = None) -> Mesh:
    """devices: explicit device list — needed when the process holds
    more than one backend (e.g. a TPU plugin plus the forced-CPU
    virtual mesh in __graft_entry__.dryrun_multichip), where
    jax.devices() returns the default platform's devices only."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_fsdp
    if len(devices) < need:
        raise ValueError(f"need {need} devices ({n_data} data x {n_fsdp} "
                         f"fsdp), have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_fsdp), axes)


def fsdp_spec(shape, n_fsdp: int, min_size: int = 2 ** 15) -> P:
    """PartitionSpec sharding the LARGEST dim divisible by n_fsdp;
    replicated when the tensor is small (< min_size elements) or no dim
    divides — scalars, biases, and BN stats stay whole, conv kernels
    and momentum split. Ties go to the trailing dim (the channel dim in
    HWIO conv kernels: all-gathers then ride the lane axis)."""
    size = 1
    for d in shape:
        size *= int(d)
    if not shape or size < min_size:
        return P()
    best = -1
    for i, d in enumerate(shape):  # trailing dim wins ties
        if int(d) % n_fsdp == 0 and (best < 0 or int(d) >= int(shape[best])):
            best = i
    if best < 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = "fsdp"
    return P(*spec)


def gather_to_host(tree: Any, mesh: Mesh) -> Any:
    """Full host-numpy copy of a sharded pytree: gather-on-save for
    checkpointing fsdp-sharded state (the reference's DDP save path runs
    on rank 0 against replicated weights, mmdet/utils/
    Epoch_Based_Runner_Lambda.py:144-169; under ZeRO-3 the gather is the
    step that recreates that view).

    COLLECTIVE when shards span processes: EVERY process must call it
    (the jitted identity below compiles to cross-process all-gathers),
    then each host reads its now-replicated local copy. Call it outside
    any `is_main` guard."""
    rep = NamedSharding(mesh, P())
    gathered = jax.jit(lambda t: t, out_shardings=rep)(tree)
    return jax.tree.map(lambda x: np.asarray(x.addressable_data(0)), gathered)


def shard_params_fsdp(tree: Any, mesh: Mesh, min_size: int = 2 ** 15) -> Any:
    """Place every array leaf of a train-state/params pytree with its
    fsdp_spec over `mesh` (which must carry an 'fsdp' axis). Applied
    uniformly to params, optimizer state, and batch_stats: momentum
    tensors share their param's shape so they land on the same shard
    layout; small leaves replicate."""
    n_fsdp = mesh.shape["fsdp"]
    mp = mesh_is_multiprocess(mesh)

    def place(x):
        shape = np.shape(x)
        sh = NamedSharding(mesh, fsdp_spec(shape, n_fsdp, min_size))
        return _put(x, sh, mp)

    return jax.tree.map(place, tree)
