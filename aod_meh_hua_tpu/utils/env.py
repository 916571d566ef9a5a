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
