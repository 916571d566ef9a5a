"""Model FLOPs/params report (reference tools/analysis_tools/get_flops.py).

Uses XLA's compiled cost analysis instead of layer-hook counting.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    from aod_meh_hua_tpu.utils.config import ALL_FAMILIES

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="retinanet",
                    choices=sorted(ALL_FAMILIES))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.utils.config import (RetinaNetConfig, SSDConfig,
                                              ZOO_FAMILIES)
    from aod_meh_hua_tpu.utils.profiling import compiled_cost

    if args.family == "retinanet":
        cfg = RetinaNetConfig()
    elif args.family == "ssd":
        cfg = SSDConfig()
    else:
        cfg = ZOO_FAMILIES[args.family][0]()
    model, variables = init_detector(cfg)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    h, w = cfg.canvas
    img = jnp.zeros((1, h, w, 3))
    if args.family in ("detr", "deformable_detr"):
        shapes = jnp.asarray([[h, w]], jnp.int32)
        fwd = lambda im: model.apply(variables, im, shapes)
    else:
        fwd = lambda im: model.apply(variables, im)
    cost = compiled_cost(fwd, img)
    print(f"family={args.family} input={h}x{w}")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"forward flops: {cost['flops'] / 1e9:.2f} GFLOPs")
    print(f"bytes accessed: {cost['bytes_accessed'] / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
