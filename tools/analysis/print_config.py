"""Print the resolved config (reference tools/misc/print_config.py)."""

import argparse
import dataclasses
import os
import pprint
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="retinanet", choices=["retinanet", "ssd"])
    ap.add_argument("--config", default=None, help="reference-style config file")
    args = ap.parse_args()

    from aod_meh_hua_tpu.utils.config import (
        RetinaNetConfig, SSDConfig, load_reference_config,
    )

    if args.config:
        model_cfg, train_cfg, al_cfg, _ = load_reference_config(args.config)
        print("== model =="); pprint.pprint(dataclasses.asdict(model_cfg))
        print("== train =="); pprint.pprint(dataclasses.asdict(train_cfg))
        print("== al =="); pprint.pprint(dataclasses.asdict(al_cfg))
    else:
        cfg = SSDConfig() if args.family == "ssd" else RetinaNetConfig()
        pprint.pprint(dataclasses.asdict(cfg))


if __name__ == "__main__":
    main()
