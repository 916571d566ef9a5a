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

import os
import re
from typing import Optional

import jax


def _first_slurm_host(nodelist: str) -> str:
    """First hostname of a slurm nodelist without shelling to scontrol:
    'nid[0012-0015,0020],other' -> 'nid0012'; 'host1,host2' -> 'host1'."""
    head = nodelist.split(",")[0]
    m = re.match(r"([^\[]+)\[([^\]\-,]+)", nodelist)
    if m:
        return m.group(1) + m.group(2)
    return head


def detect_launch_env(environ=None) -> dict:
    """Derive (coordinator_address, num_processes, process_id) from the
    cluster launcher's environment, the analog of mmcv init_dist's
    'pytorch'/'slurm'/'mpi' launchers the reference selects via
    --launcher (tools/train_RetinaNet.py:117-123 -> mmcv
    runner/dist_utils.py). Checked in order:

    * slurm:   SLURM_PROCID / SLURM_NTASKS / SLURM_NODELIST (coordinator
               = first host; port from MASTER_PORT or 29500 — mmcv's
               _init_dist_slurm default)
    * OpenMPI: OMPI_COMM_WORLD_RANK / OMPI_COMM_WORLD_SIZE + MASTER_ADDR
    * pytorch: RANK / WORLD_SIZE / MASTER_ADDR / MASTER_PORT

    Returns {} when no launcher environment is present (single-process /
    Cloud-TPU auto-discovery). Explicit CLI flags always win over this."""
    env = os.environ if environ is None else environ
    port = env.get("MASTER_PORT", "29500")
    if "SLURM_PROCID" in env and "SLURM_NTASKS" in env:
        nodelist = env.get("SLURM_STEP_NODELIST") or env.get("SLURM_NODELIST")
        host = env.get("MASTER_ADDR") or (
            _first_slurm_host(nodelist) if nodelist else None)
        out = {
            "num_processes": int(env["SLURM_NTASKS"]),
            "process_id": int(env["SLURM_PROCID"]),
        }
        if host:
            out["coordinator_address"] = f"{host}:{port}"
        return out
    if "OMPI_COMM_WORLD_RANK" in env and "OMPI_COMM_WORLD_SIZE" in env:
        out = {
            "num_processes": int(env["OMPI_COMM_WORLD_SIZE"]),
            "process_id": int(env["OMPI_COMM_WORLD_RANK"]),
        }
        if env.get("MASTER_ADDR"):
            out["coordinator_address"] = f"{env['MASTER_ADDR']}:{port}"
        return out
    if "RANK" in env and "WORLD_SIZE" in env:
        out = {
            "num_processes": int(env["WORLD_SIZE"]),
            "process_id": int(env["RANK"]),
        }
        if env.get("MASTER_ADDR"):
            out["coordinator_address"] = f"{env['MASTER_ADDR']}:{port}"
        return out
    return {}


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
    how single-process runs look.

    Fields not passed explicitly are filled from the cluster launcher's
    environment (slurm / OpenMPI / torch-launcher vars; see
    detect_launch_env) — the reference's `--launcher slurm|mpi|pytorch`
    ergonomics without a flag."""
    auto = detect_launch_env()
    if auto:
        if coordinator_address is None:
            coordinator_address = auto.get("coordinator_address")
        if num_processes is None:
            num_processes = auto.get("num_processes")
        if process_id is None:
            process_id = auto.get("process_id")
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
