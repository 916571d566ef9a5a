"""Convert Detectron caffe2 ResNet pickles into our backbone pytree
(reference tools/model_converters/detectron2pytorch.py analog).

Detectron replaces BatchNorm with affine channel scaling: blobs carry
`<name>_s` / `<name>_b` only, so running stats are synthesized as
mean=0 / var=1 exactly like the reference (detectron2pytorch.py:10-20).
Blob naming: conv1 / res_conv1_bn, then res{stage+1}_{block}_branch1
(downsample) and branch2{a,b,c} (detectron2pytorch.py:46-63).

Output: flax-msgpack .ckpt of {'params': ..., 'batch_stats': ...} in
our ResNet naming (layer{s}_{b}), attachable to any R50/R101 family.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

ARCH_SETTINGS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def convert(blobs, depth=None, block_counts=None):
    if block_counts is None:
        if depth not in ARCH_SETTINGS:
            raise ValueError("Only ResNet-50 and ResNet-101 are supported")
        block_counts = ARCH_SETTINGS[depth]
    converted = set()

    def conv(name):
        converted.add(name + "_w")
        out = {"kernel": np.transpose(np.asarray(blobs[name + "_w"]), (2, 3, 1, 0))}
        if name + "_b" in blobs:
            out["bias"] = np.asarray(blobs[name + "_b"])
            converted.add(name + "_b")
        return out

    def affine_bn(name):
        converted.update((name + "_s", name + "_b"))
        scale = np.asarray(blobs[name + "_s"])
        return ({"scale": scale, "bias": np.asarray(blobs[name + "_b"])},
                {"mean": np.zeros_like(scale), "var": np.ones_like(scale)})

    params, stats = {}, {}
    params["conv1"] = conv("conv1")
    params["bn1"], stats["bn1"] = affine_bn("res_conv1_bn")
    for stage, n_blocks in enumerate(block_counts):
        for b in range(n_blocks):
            src = f"res{stage + 2}_{b}"
            dst = f"layer{stage + 1}_{b}"
            blk_p, blk_s = {}, {}
            if b == 0:
                blk_p["downsample_conv"] = conv(f"{src}_branch1")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = \
                    affine_bn(f"{src}_branch1_bn")
            for k, letter in enumerate("abc"):
                blk_p[f"conv{k + 1}"] = conv(f"{src}_branch2{letter}")
                blk_p[f"bn{k + 1}"], blk_s[f"bn{k + 1}"] = \
                    affine_bn(f"{src}_branch2{letter}_bn")
            params[dst], stats[dst] = blk_p, blk_s
    for key in blobs:
        if key not in converted:
            print(f"Not Convert: {key}")
    return {"params": params, "batch_stats": stats}


def main():
    ap = argparse.ArgumentParser(description="Convert model keys")
    ap.add_argument("src", help="src detectron model path (.pkl)")
    ap.add_argument("dst", help="save path (.ckpt)")
    ap.add_argument("depth", type=int, help="ResNet model depth (50|101)")
    args = ap.parse_args()

    with open(args.src, "rb") as f:
        caffe_model = pickle.load(f, encoding="latin1")
    blobs = caffe_model.get("blobs", caffe_model)
    tree = convert(blobs, args.depth)

    from aod_meh_hua_tpu.engine.checkpoint import save_checkpoint
    save_checkpoint(args.dst, tree)
    print(args.dst)


if __name__ == "__main__":
    main()
