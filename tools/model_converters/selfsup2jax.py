"""Convert self-supervised pretraining checkpoints (MoCo / SwAV) into
the torchvision-layout state dict our backbone loader consumes
(reference tools/model_converters/selfsup2mmdet.py analog).

MoCo: keep only `module.encoder_q.*` keys with the prefix stripped
(selfsup2mmdet.py:14-20). SwAV: keys already match — passthrough
(selfsup2mmdet.py:37-38). The result feeds
models/pretrained.py:attach_pretrained_backbone, covering the
reference's configs/selfsup_pretrain/ family.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def moco_convert(sd):
    out = {}
    for k, v in sd.items():
        if not k.startswith("module.encoder_q."):
            continue
        new_k = k[len("module.encoder_q."):]
        print(k, "->", new_k)
        out[new_k] = v
    return out


def main():
    ap = argparse.ArgumentParser(description="Convert model keys")
    ap.add_argument("src", help="src selfsup model path (torch)")
    ap.add_argument("dst", help="save path (.pth, torchvision layout)")
    ap.add_argument("--selfsup", choices=["moco", "swav"], required=True)
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.src, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    if args.selfsup == "moco":
        sd = moco_convert(sd)
    else:
        print("SWAV does not need to convert the keys")
    torch.save({"state_dict": sd}, args.dst)
    print(f"{args.dst}: {len(sd)} keys")


if __name__ == "__main__":
    main()
