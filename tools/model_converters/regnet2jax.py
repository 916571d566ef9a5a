"""Convert pycls RegNet checkpoints to the standard (mmdet/torchvision)
key layout (reference tools/model_converters/regnet2mmdet.py analog,
same key grammar: stem.conv->conv1, s{S}.b{B}.{proj,bn,f.*} ->
layer{S}.{B-1}.{downsample,conv1..3,bn1..3}, regnet2mmdet.py:7-52).

Our RegNet backbone (models/backbones.py) is trained from scratch in
this environment (zero egress); this converter keeps the external
pycls-zoo path ready: its output is the canonical layout any of our
attach/convert helpers key off.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

_F_MAP = {"a": "conv1", "b": "conv2", "c": "conv3",
          "a_bn": "bn1", "b_bn": "bn2", "c_bn": "bn3"}


def convert_key(key: str) -> str:
    """pycls model_state key -> mmdet/torchvision-style key."""
    if "stem" in key:
        return key.replace("stem.conv", "conv1").replace("stem.bn", "bn1")
    if "head" in key:
        return key.replace("head.fc", "fc")
    parts = key.split(".")
    layer, block, module = parts[:3]
    layer_name = f"layer{int(layer[1:])}"
    block_name = str(int(block[1:]) - 1)
    leaf = parts[-1]
    if int(block[1:]) == 1 and module == "bn":
        return f"{layer_name}.{block_name}.downsample.1.{leaf}"
    if int(block[1:]) == 1 and module == "proj":
        return f"{layer_name}.{block_name}.downsample.0.{leaf}"
    if module == "f":
        return f"{layer_name}.{block_name}.{_F_MAP[parts[3]]}.{leaf}"
    raise ValueError(f"Unsupported conversion of key {key}")


def main():
    ap = argparse.ArgumentParser(description="Convert model keys")
    ap.add_argument("src", help="src pycls model path (torch)")
    ap.add_argument("dst", help="save path (.pth)")
    args = ap.parse_args()

    import torch

    blobs = torch.load(args.src, map_location="cpu")["model_state"]
    state_dict, converted = {}, set()
    for key, weight in blobs.items():
        if "stem" in key or "head" in key or key.startswith("s"):
            new_key = convert_key(key)
            print(f"Convert {key} to {new_key}")
            state_dict[new_key] = weight
            converted.add(key)
    for key in blobs:
        if key not in converted:
            print(f"not converted: {key}")
    torch.save({"state_dict": state_dict}, args.dst)


if __name__ == "__main__":
    main()
