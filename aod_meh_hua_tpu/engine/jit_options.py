"""TPU compile options for the hot jitted steps.

Measured on a real v5e (2026-08-19, docs/PERF.md "compiler options"):
capping XLA's scoped-VMEM budget at 32 MiB buys +1.5% scoring
throughput (322.99 -> 327.82 img/s, b128 bf16; 64 MiB -> 326.26) — a
smaller scratch reservation leaves more VMEM for the conv pipeliner's
double buffers. Applied where the A/B ran: the pool-scoring step (the
framework's headline path). Other steps keep compiler defaults until
they get their own on-chip A/B; numerics are tolerance-checked in
tests/test_scoring_vmem.py.

Override with AOD_SCOPED_VMEM_KIB (integer KiB; "0" disables the
option entirely).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

DEFAULT_SCOPED_VMEM_KIB = 32768


def score_step_compiler_options() -> Optional[Dict[str, str]]:
    """Options for make_score_step's jit; None off-TPU (the option is a
    TPU-backend flag — the CPU/virtual-mesh test path must not see it)."""
    import jax

    kib = os.environ.get("AOD_SCOPED_VMEM_KIB",
                         str(DEFAULT_SCOPED_VMEM_KIB))
    if kib == "0":
        return None
    try:
        # jax_platforms can be flipped to "cpu" AFTER the TPU backend
        # initialized (dryrun_multichip does exactly this to build a
        # virtual CPU mesh inside a TPU-attached process); in that mixed
        # state default_backend() still says "tpu" while every compile
        # targets CPU — honour the config value first.
        platforms = jax.config.jax_platforms
        if platforms and "tpu" not in platforms:
            return None
        if jax.default_backend() != "tpu":
            return None
    except Exception:  # pragma: no cover - backend probing failed
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}
