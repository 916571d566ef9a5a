"""Multi-host launch helper.

Behavioral parity target (reference, /root/reference):
* mmcv init_dist with pytorch/slurm/mpi launchers
  (tools/train_RetinaNet.py:68,117-123; dist_params backend='nccl',
  configs/_base_/Config_RetinaNet.py:9).

On TPU pods the runtime provides coordination:
jax.distributed.initialize() discovers peers from the environment; the
global mesh then spans every chip of every host and the same sharding
annotations scale from 1 chip to a pod — no backend code.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host jax. On Cloud TPU the arguments are
    auto-discovered; pass them explicitly for manual launches (the
    'pytorch launcher env vars' analog). Returns a summary dict.

    An EXPLICITLY requested multi-host launch that fails to initialize
    raises instead of degrading silently to single-process (a
    misconfigured coordinator must not train on 1/N of the data). Only
    the no-argument auto-discovery path may fall through, since that is
    how single-process runs look."""
    explicit = (
        coordinator_address is not None
        or process_id is not None
        or (num_processes or 0) > 1
    )
    if num_processes is None or num_processes > 1 or coordinator_address:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except (ValueError, RuntimeError) as e:
            if "already initialized" in str(e).lower():
                pass
            elif explicit:
                raise RuntimeError(
                    f"multi-host initialize(coordinator={coordinator_address!r}, "
                    f"num_processes={num_processes}, process_id={process_id}) "
                    f"failed: {e}"
                ) from e
            # else: bare auto-discovery on a single-process environment
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
