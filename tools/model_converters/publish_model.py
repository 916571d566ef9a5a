"""Prepare a checkpoint for publishing (reference
tools/model_converters/publish_model.py analog).

Strips training-only state (optimizer momentum / step / loader progress)
from a train_state.ckpt or cycle checkpoint so only the model variables
ship, then renames the output with the first 8 hex chars of its sha256
(`publish_model.py:26-33` behavior: smaller file + content-addressed
name).
"""

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# Keys that hold model variables in our checkpoint trees; everything
# else (opt_state, momentum, step, rng, progress) is training-only.
_MODEL_KEYS = ("params", "batch_stats", "variables")


def process_checkpoint(in_file: str, out_file: str) -> str:
    import flax.serialization as fser

    with open(in_file, "rb") as f:
        tree = fser.msgpack_restore(f.read())
    if isinstance(tree, dict):
        model = {k: v for k, v in tree.items() if k in _MODEL_KEYS}
        if model:
            dropped = sorted(set(tree) - set(model))
            if dropped:
                print(f"dropped training state: {dropped}")
            tree = model
    with open(out_file, "wb") as f:
        f.write(fser.msgpack_serialize(tree))
    sha = hashlib.sha256(open(out_file, "rb").read()).hexdigest()
    stem, ext = os.path.splitext(out_file)
    final = f"{stem}-{sha[:8]}{ext or '.ckpt'}"
    os.replace(out_file, final)
    print(final)
    return final


def main():
    ap = argparse.ArgumentParser(
        description="Process a checkpoint to be published")
    ap.add_argument("in_file", help="input checkpoint filename")
    ap.add_argument("out_file", help="output checkpoint filename")
    args = ap.parse_args()
    process_checkpoint(args.in_file, args.out_file)


if __name__ == "__main__":
    main()
