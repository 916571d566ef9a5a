"""Cross-process collection utilities for multi-host runs.

Behavioral parity targets (reference, /root/reference):
* mmdet/apis/test.py:197-315 — multi_gpu_test: rank-sliced loader
  (DistributedSampler), then result collection either via a shared-fs
  pickle tmpdir (collect_results_cpu, :242) or an all_gather of pickled
  byte tensors (collect_results_gpu, :285-315).

TPU-native shape: the pool/eval sweep is embarrassingly parallel per
rank (each process scores its strided slice on its LOCAL devices); the
only cross-process traffic is one gather at the end — dense score
vectors ride `process_allgather` (the all_gather path), ragged
detection lists ride a shared-filesystem pickle exchange with a device
barrier (the tmpdir path).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List

import jax
import numpy as np


def rank_indices(n: int, process_id: int, process_count: int) -> np.ndarray:
    """Strided rank slice of [0, n): keeps the orientation mix balanced
    across ranks (the DistributedSampler analog, shuffle=False)."""
    return np.arange(process_id, n, process_count, dtype=np.int64)


def allgather_sum(x: np.ndarray) -> np.ndarray:
    """Sum a dense per-image vector across processes. Each rank fills
    only its slice (zeros elsewhere), so the sum is the concatenation
    in dataset order."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    # align ranks first: the gather's Gloo rendezvous window is ~30 s
    # and the ranks arrive with whatever skew their slices left them
    barrier("allgather")
    return np.asarray(multihost_utils.process_allgather(x)).sum(axis=0)


_BARRIER_SEQ = {}


def barrier(tag: str = "barrier", timeout_ms: int = 1_200_000) -> None:
    """Coordination-service barrier (gRPC, long timeout). Used to align
    ranks BEFORE compile-heavy sections: XLA's CPU Gloo collectives have
    a fixed ~30 s rendezvous window, so ranks must enter their first
    collective execution roughly together; on TPU pods the same barriers
    are harmless belt-and-braces. (sync_global_devices is itself a Gloo
    collective, so it cannot serve this purpose on CPU.)"""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    seq = _BARRIER_SEQ.get(tag, 0)
    _BARRIER_SEQ[tag] = seq + 1
    if client is not None:
        client.wait_at_barrier(f"aod_{tag}_{seq}", timeout_ms)
    else:  # pragma: no cover - initialize() always sets the client
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"{tag}_{seq}")


def collect_objects(work_dir: str, tag: str, obj: Any) -> List[Any]:
    """Shared-filesystem pickle exchange (collect_results_cpu analog):
    every rank writes its part, barriers, reads all parts. Returns the
    per-rank objects in rank order on EVERY process."""
    pc = jax.process_count()
    if pc == 1:
        return [obj]
    d = os.path.join(work_dir, f".collect_{tag}")
    os.makedirs(d, exist_ok=True)
    pid = jax.process_index()
    tmp = os.path.join(d, f"part_{pid}.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(obj, f)
    os.replace(tmp, os.path.join(d, f"part_{pid}.pkl"))
    barrier(f"collect_{tag}_write")
    out = []
    for r in range(pc):
        with open(os.path.join(d, f"part_{r}.pkl"), "rb") as f:
            out.append(pickle.load(f))
    # a second barrier before anyone deletes: slow readers must finish
    barrier(f"collect_{tag}_read")
    if pid == 0:
        for r in range(pc):
            try:
                os.unlink(os.path.join(d, f"part_{r}.pkl"))
            except OSError:
                pass
    return out
