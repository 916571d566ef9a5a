"""Pool scoring dispatch: run the jitted score step over the whole pool.

Behavioral parity targets (reference, /root/reference):
* mmdet/apis/test.py:19-63 (Uncertainty_fns: Random = randperm;
  Entropy_* = full-pool sweep), :65-70 (calculate_uncertainty dispatch),
  :90-135 (single_gpu_uncertainty).

The sweep is sharded by orientation-grouped batches; scores scatter back
to dataset order, so the returned array indexes identically to the
reference's uncertainty vector (dataset order == X_all index space).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ..data.loader import EvalLoader
from ..engine.score import make_score_step
from ..utils.config import RetinaNetConfig


def score_num_objects(dataset, indices) -> np.ndarray:
    """cal_numObj (reference apis/test.py:73-88): per-image GT object
    count as the acquisition signal (an oracle/debug scorer)."""
    return np.array([len(dataset.get_ann_info(int(i))["labels"]) for i in indices],
                    dtype=np.float64)


def score_pool(
    model,
    variables,
    cfg: RetinaNetConfig,
    loader: EvalLoader,
    num_images: int,
    rng: Optional[np.random.RandomState] = None,
    key: Optional[jax.Array] = None,
    progress: bool = False,
    steps: Optional[Dict[str, object]] = None,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Score every pool image; one compiled step per orientation (the
    module is shape-polymorphic, the jitted programs are not). Returns
    (uncertainty [N], max_conf [N]) in dataset order.

    mesh: optional jax.sharding.Mesh — batches are split on the batch
    axis across its devices (the pool scale-out axis, the TPU analog of
    the reference's rank-sharded multi_gpu scoring, apis/test.py:197-315)."""
    if cfg.hua.pool == "Random":
        assert rng is not None
        return rng.permutation(num_images).astype(np.float64), np.zeros(num_images)

    if steps is None:
        steps = {
            o: make_score_step(model, cfg.for_orientation(o))
            for o in ("landscape", "portrait")
        }
    if mesh is not None:
        from ..parallel import shard_batch

        shard = lambda b: shard_batch(b, mesh)
    else:
        # explicit async upload: device_put returns while the transfer
        # streams, so issuing batch k+1's H2D before blocking on batch
        # k's scores overlaps the wire with the compute (the sweep ships
        # ~1.9 MB/image of uint8 canvas; leaving the upload implicit in
        # the step dispatch serializes it behind the previous fetch).
        # HBM cost: the lookahead keeps TWO batches resident (~119 MB
        # extra at score_batch_size=64) on top of the step's working
        # set — shrink score_batch_size first if a larger canvas or TTA
        # config ever approaches the HBM limit. (The eval sweep in
        # al/loop.py uses the same structure and carries the same cost.)
        shard = jax.device_put
    unc = np.zeros(num_images, np.float64)
    mconf = np.zeros(num_images, np.float64)
    t0 = time.time()
    n_done = 0

    def stage(item):
        if item is None:
            return None
        orientation, batch, idx = item
        return orientation, shard(batch), idx

    it = iter(loader)
    cur = stage(next(it, None))
    while cur is not None:
        orientation, batch, idx = cur
        u, mc = steps[orientation](variables, batch, key) if key is not None else \
            steps[orientation](variables, batch)
        cur = stage(next(it, None))  # upload k+1 while k computes
        u = np.asarray(u)[: len(idx)]
        mc = np.asarray(mc)[: len(idx)]
        valid = np.asarray(batch.valid)[: len(idx)]
        unc[idx[valid]] = u[valid]
        mconf[idx[valid]] = mc[valid]
        n_done += int(valid.sum())
        if progress and n_done % 512 < len(idx):
            rate = n_done / max(time.time() - t0, 1e-9)
            print(f"  scored {n_done}/{num_images} ({rate:.1f} img/s)")
    return unc, mconf
