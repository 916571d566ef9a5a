"""Convert a reference-trained mmdet checkpoint into our variables tree
(the migration analog of tools/model_converters/upgrade_model_version.py
+ upgrade_ssd_version.py: those move mmdet-1.x checkpoints to 2.x; this
moves mmdet-2.13 checkpoints — the reference's own `*_mycode.pth`
cycle snapshots, tools/train_RetinaNet.py:213-219 — into this
framework).

Output is a flax-msgpack .ckpt holding {'params', 'batch_stats'} that
api.init_detector / the eval+scoring engines consume directly; see
docs/PARITY.md for the end-to-end mAP/selection-parity recipe.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser(description="Convert reference checkpoints")
    ap.add_argument("src", help="reference .pth state_dict (torch) or .npz")
    ap.add_argument("dst", help="output .ckpt path")
    ap.add_argument("--family", choices=["retinanet", "ssd"],
                    default="retinanet")
    args = ap.parse_args()

    import numpy as np

    if args.src.endswith(".npz"):
        sd = dict(np.load(args.src))
    else:
        from aod_meh_hua_tpu.models.pretrained import load_torch_state_dict
        sd = load_torch_state_dict(args.src)

    from aod_meh_hua_tpu.engine.checkpoint import save_checkpoint
    from aod_meh_hua_tpu.models.reference_convert import (
        convert_reference_retinanet, convert_reference_ssd)

    if args.family == "retinanet":
        variables, leftover = convert_reference_retinanet(sd)
    else:
        variables, leftover = convert_reference_ssd(sd)
    for k in leftover:
        print(f"Not Convert: {k}")
    save_checkpoint(args.dst, variables)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(variables))
    print(f"{args.dst}: {n} parameters, {len(leftover)} unconverted keys")


if __name__ == "__main__":
    main()
