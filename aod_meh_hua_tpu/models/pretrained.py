"""Pretrained weight porting (host-side, torch -> Flax pytrees).

Behavioral parity target (reference, /root/reference):
* configs/_base_/Config_RetinaNet.py:33 — backbone init from
  'torchvision://resnet50' (the detector head is always random-init +
  the driver's uniform bias re-init).

Zero-egress environments won't have the weight file; callers gate on
its presence and fall back to random init (the AL algorithm itself is
init-agnostic; pretrained weights matter for absolute mAP).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from .resnet import convert_torchvision_resnet


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def attach_pretrained_backbone(variables: Any, path: str, block_counts=(3, 4, 6, 3)) -> Any:
    """Replace variables' backbone params/stats with torchvision weights."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    sd = load_torch_state_dict(path)
    params, stats = convert_torchvision_resnet(sd, block_counts)

    import jax.numpy as jnp

    def _to_jnp(tree):
        return {k: _to_jnp(v) if isinstance(v, dict) else jnp.asarray(v) for k, v in tree.items()}

    new_vars = dict(variables)
    new_params = dict(new_vars["params"])
    new_stats = dict(new_vars.get("batch_stats", {}))
    new_params["backbone"] = _to_jnp(params)
    new_stats["backbone"] = _to_jnp(stats)
    new_vars["params"] = new_params
    new_vars["batch_stats"] = new_stats
    return new_vars
