"""Serving export (reference tools/deployment/pytorch2onnx.py analog).

The TPU-native deployment path is jax.export: serialize the jitted
eval step (forward -> decode -> NMS) as a StableHLO artifact loadable
from any jax process without the framework installed.
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
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="detector_export.bin")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--mini", action="store_true",
                    help="tiny model geometry (smoke/test mode)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import EvalBatch
    from aod_meh_hua_tpu.engine.mask_rcnn import MaskDetections
    from aod_meh_hua_tpu.ops.nms import NMSResult
    from aod_meh_hua_tpu.utils.config import (RetinaNetConfig, SSDConfig,
                                              ZOO_FAMILIES)

    # namedtuple pytrees must be registered for serialization
    jexport.register_namedtuple_serialization(
        EvalBatch, serialized_name="aod_meh_hua_tpu.EvalBatch")
    jexport.register_namedtuple_serialization(
        NMSResult, serialized_name="aod_meh_hua_tpu.NMSResult")
    jexport.register_namedtuple_serialization(
        MaskDetections, serialized_name="aod_meh_hua_tpu.MaskDetections")

    if args.mini:
        from aod_meh_hua_tpu.utils.config import tiny_test_config

        assert args.family == "retinanet", "--mini is the retinanet smoke mode"
        cfg = tiny_test_config()
    elif args.family == "retinanet":
        cfg = RetinaNetConfig()
    elif args.family == "ssd":
        cfg = SSDConfig()
    else:
        cfg = ZOO_FAMILIES[args.family][0]()
    model, variables = init_detector(cfg, checkpoint=args.checkpoint)
    step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    b = args.batch
    batch = EvalBatch(
        jnp.zeros((b, h, w, 3), jnp.float32),
        jnp.zeros((b, 2), jnp.int32),
        jnp.ones((b, 4), jnp.float32),
        jnp.ones(b, dtype=bool),
    )
    # close over the weights: the artifact is self-contained
    fn = jax.jit(lambda bt: step(variables, bt))
    exported = jexport.export(fn)(batch)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.family} eval step ({len(blob) / 1e6:.1f} MB) -> {args.out}")
    # round-trip sanity
    loaded = jexport.deserialize(blob)
    out = loaded.call(batch)
    print(f"round-trip OK: boxes {np.asarray(out.boxes).shape}")


if __name__ == "__main__":
    main()
