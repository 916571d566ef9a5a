"""Mesh construction + batch/param sharding helpers.

Replaces (reference, /root/reference): mmcv MMDataParallel /
MMDistributedDataParallel (apis/train_Lambda.py:40, apis/train.py:75-85),
init_dist launchers (tools/train_RetinaNet.py:68,117-123), and
core/utils/dist_utils.py collectives.

Data-parallel only — the reference implements exactly DP (SURVEY.md
section 2.10); the models are far below the scale where TP/PP pay off.
Scale-out axes: the train batch and the unlabeled pool (score batches),
both sharded on the single 'data' axis.
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
