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


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place every leaf with its leading axis split over the mesh."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / optimizer state)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
