#!/usr/bin/env python
"""Upgrade legacy mmdet-1.x checkpoints to 2.x key/channel layout
(reference tools/model_converters/upgrade_model_version.py +
upgrade_ssd_version.py analogs, torch-free on the array side).

The output .npz (or .pth passthrough form) is 2.13-layout and feeds
straight into tools/model_converters/reference2jax.py. Where the
reference sniffs is_two_stage/is_ssd/is_retina from the checkpoint's
embedded config (upgrade_model_version.py:18-41), this CLI takes them
as flags — legacy checkpoints reaching this environment arrive without
mmcv to parse that config text.

Usage:
  python tools/model_converters/upgrade_checkpoint.py in.pth out.npz \
      [--num-classes 81] [--two-stage] [--ssd] [--ssd-layout] \
      [--reg-class-agnostic] [--retina-legacy] [--no-rpn-upgrade]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="Upgrade model version")
    ap.add_argument("in_file", help="input checkpoint (.pth or .npz)")
    ap.add_argument("out_file", help="output .npz state dict")
    ap.add_argument("--num-classes", type=int, default=81,
                    help="classes of the ORIGINAL (1.x, bg-first) model")
    ap.add_argument("--two-stage", action="store_true",
                    help="prefix head keys with roi_head. (:143-145)")
    ap.add_argument("--ssd", action="store_true",
                    help="reorder SSD cls_convs channels (:181-184)")
    ap.add_argument("--ssd-layout", action="store_true",
                    help="also apply upgrade_ssd_version.py's VGG-SSD "
                         "extra/l2_norm/bbox_head renames")
    ap.add_argument("--reg-class-agnostic", action="store_true")
    ap.add_argument("--retina-legacy", action="store_true",
                    help="mmdet<=0.5.3 RetinaNet ConvModule rename")
    ap.add_argument("--no-rpn-upgrade", action="store_true",
                    help="checkpoint already >=2.5.0 RPN class order")
    args = ap.parse_args()

    from aod_meh_hua_tpu.models.upgrade import (upgrade_ssd_state_dict,
                                                upgrade_state_dict)

    if args.in_file.endswith(".npz"):
        sd = dict(np.load(args.in_file))
    else:
        from aod_meh_hua_tpu.models.pretrained import load_torch_state_dict
        sd = load_torch_state_dict(args.in_file)

    if args.ssd_layout:
        sd = upgrade_ssd_state_dict(sd)
    out = upgrade_state_dict(sd, num_classes=args.num_classes,
                             is_two_stage=args.two_stage, is_ssd=args.ssd,
                             reg_cls_agnostic=args.reg_class_agnostic,
                             upgrade_retina=args.retina_legacy,
                             upgrade_rpn=not args.no_rpn_upgrade,
                             verbose=True)
    np.savez(args.out_file, **out)
    print(f"{args.out_file}: {len(out)} tensors")


if __name__ == "__main__":
    main()
