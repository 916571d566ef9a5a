"""Profiling utilities.

Behavioral parity target (reference, /root/reference):
* mmdet/utils/profiling.py:10-39 — profile_time contextmanager printing
  per-region wall/device time (CUDA events there; block_until_ready +
  perf_counter here).
* tools/analysis_tools/benchmark.py:51-123 — FPS harness (tools/
  analysis/benchmark.py builds on these helpers).

Plus the TPU-native additions: jax.profiler trace capture (Perfetto) and
a compiled-program cost readout.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_time(name: str, stream=None, enabled: bool = True, sync=None):
    """Time a region; `sync` is an optional array/pytree to
    block_until_ready before stopping the clock (the CUDA-event analog)."""
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        dt = (time.perf_counter() - t0) * 1000
        msg = f"{name}: {dt:.2f} ms"
        print(msg, file=stream) if stream else print(msg)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn, *args) -> dict:
    """FLOPs / bytes for a jittable function at the given example args
    (the reference's get_flops analog, via XLA cost analysis)."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": cost.get("flops", float("nan")),
        "bytes_accessed": cost.get("bytes accessed", float("nan")),
    }
