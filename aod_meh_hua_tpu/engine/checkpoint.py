"""Checkpointing: msgpack-serialized pytrees + per-cycle AL state.

Behavioral parity target (reference, /root/reference):
* tools/train_RetinaNet.py:213-219 — per-cycle model snapshot
  '{cfg}_Cycle{c}_Epoch{e}_mycode.pth' with GC of stale snapshots
* mmdet/utils/Epoch_Based_Runner_Lambda.py:144-169 — epoch checkpoints +
  'latest' pointer
* mmdet/utils/functions.py:364-367 (DelJunkSave)

Two-level recovery like the reference: AL-cycle state lives in npy files
(data/splits.py), model/optimizer state here.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.serialization as fser


def save_checkpoint(path: str, tree: Any) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(fser.to_bytes(tree))
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return fser.from_bytes(target, f.read())


def train_state_path(save_dir: str) -> str:
    return os.path.join(save_dir, "train_state.ckpt")


def save_train_state(save_dir: str, state: Any, progress: dict) -> str:
    """Epoch-granular full-state snapshot (params + optimizer momentum +
    step) for mid-cycle preemption recovery — the reference's
    cfg.resume_from -> runner.resume path
    (/root/reference/mmdet/apis/train_Lambda.py:72-75). Overwrites in
    place (only the latest snapshot is ever resumable: the AL schedule is
    deterministic from it). `progress` records (cycle, run, epoch,
    run_iter) so the driver can replay the loader RNG to the exact
    batch stream."""
    import json

    os.makedirs(save_dir, exist_ok=True)
    path = train_state_path(save_dir)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(fser.to_bytes(state))
    os.replace(tmp, path)  # atomic: a preemption mid-write keeps the old one
    with open(os.path.join(save_dir, "train_state.json"), "w") as f:
        json.dump(progress, f)
    return path


def load_train_state(path_or_dir: str, target: Any):
    """Returns (state, progress dict). Accepts the save_dir or the .ckpt."""
    import json

    d = path_or_dir if os.path.isdir(path_or_dir) else os.path.dirname(path_or_dir)
    path = path_or_dir if path_or_dir.endswith(".ckpt") else train_state_path(d)
    with open(path, "rb") as f:
        state = fser.from_bytes(target, f.read())
    with open(os.path.join(d, "train_state.json")) as f:
        progress = json.load(f)
    return state, progress


def cycle_ckpt_path(save_dir: str, name: str, cycle: int, epoch: int) -> str:
    return os.path.join(save_dir, f"{name}_Cycle{cycle}_Epoch{epoch}_mycode.ckpt")


def latest_path(save_dir: str) -> str:
    return os.path.join(save_dir, "latest.ckpt")


def save_cycle_checkpoint(save_dir: str, name: str, cycle: int, epoch: int, tree: Any,
                          keep_only_cycle: bool = True, meta: Optional[dict] = None) -> str:
    """Save the per-cycle snapshot; GC non-cycle checkpoints (the
    reference deletes every file without '_mycode', :214-216). `meta`
    (version, CLASSES, config — the reference's checkpoint_config.meta,
    tools/train_RetinaNet.py:174-175) lands beside it as json."""
    os.makedirs(save_dir, exist_ok=True)
    if meta is not None:
        import json

        with open(os.path.join(save_dir, f"{name}_Cycle{cycle}_meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    if keep_only_cycle:
        for f in os.listdir(save_dir):
            if f.endswith(".ckpt") and "_mycode" not in f \
                    and not f.startswith("train_state"):
                os.remove(os.path.join(save_dir, f))
    path = cycle_ckpt_path(save_dir, name, cycle, epoch)
    save_checkpoint(path, tree)
    # 'latest' pointer (the runner's latest.pth symlink equivalent)
    lp = latest_path(save_dir)
    if os.path.islink(lp) or os.path.exists(lp):
        os.remove(lp)
    try:
        os.symlink(os.path.basename(path), lp)
    except OSError:
        save_checkpoint(lp, tree)
    return path
