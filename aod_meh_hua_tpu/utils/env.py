"""Environment capture (reference mmdet/utils/collect_env.py +
tools/train_RetinaNet.py:134-138 meta recording)."""

from __future__ import annotations

import platform
import sys


def collect_env() -> dict:
    import jax

    info = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    try:
        import flax

        info["flax"] = flax.__version__
    except Exception:
        pass
    try:
        import cv2

        info["opencv"] = cv2.__version__
    except Exception:
        pass
    import aod_meh_hua_tpu

    info["aod_meh_hua_tpu"] = aod_meh_hua_tpu.__version__
    return info


def save_code(work_dir: str) -> str:
    """Snapshot the framework source into the run directory (the
    reference's SaveCode, mmdet/utils/functions.py:103-116, which copies
    the tree into the wandb run dir). One tar.gz instead of a file walk;
    returns the archive path."""
    import os
    import tarfile

    import aod_meh_hua_tpu

    pkg_dir = os.path.dirname(os.path.abspath(aod_meh_hua_tpu.__file__))
    os.makedirs(work_dir, exist_ok=True)
    out = os.path.join(work_dir, "code_snapshot.tar.gz")
    with tarfile.open(out, "w:gz") as tar:
        tar.add(pkg_dir, arcname="aod_meh_hua_tpu",
                filter=lambda ti: None if "__pycache__" in ti.name else ti)
        tools = os.path.join(os.path.dirname(pkg_dir), "tools")
        if os.path.isdir(tools):
            tar.add(tools, arcname="tools",
                    filter=lambda ti: None if "__pycache__" in ti.name else ti)
    return out
