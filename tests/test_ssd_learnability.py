"""SSD end-to-end learnability: single-image overfit to an exact box.

Drives the full SSD chain — targets (neg_thr 0.5, single-anchor
low-quality match), OHEM CE, smooth-L1 on 0.1/0.2-std deltas, MEH,
decode, NMS, detection output — and requires the detector to recover
the GT box with high confidence. (From-scratch multi-image SSD training
is an optimization problem — the reference always starts from caffe-
pretrained VGG — so the correctness check is exact overfit.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from aod_meh_hua_tpu.utils.config import SSDConfig, TrainConfig
from aod_meh_hua_tpu.models import init_ssd
from aod_meh_hua_tpu.engine import Batch, EvalBatch, create_train_state, make_train_step
from aod_meh_hua_tpu.engine.eval import make_eval_step, detections_to_per_class
from aod_meh_hua_tpu.ops import anchor_valid_flags
from aod_meh_hua_tpu.utils.voc_eval import np_bbox_overlaps


def test_ssd_single_image_overfit():
    cfg = SSDConfig(width_mult=0.25, max_gt=8)
    model, variables = init_ssd(cfg, jax.random.PRNGKey(0))
    state, tx = create_train_state(model, variables, TrainConfig(batch_size=1, lr=1e-3),
                                   frozen_stages=0)
    step = make_train_step(model, cfg, tx)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 40, (300, 300, 3)).astype(np.float32)
    img[80:200, 60:220] = [40, 40, 230]
    norm = (img[..., ::-1] - np.array([123.675, 116.28, 103.53])) / 1.0
    images = jnp.asarray(norm[None].astype(np.float32))
    gt = np.array([60, 80, 220, 200], np.float32)
    boxes = np.zeros((1, 8, 4), np.float32)
    boxes[0, 0] = gt
    labels = np.zeros((1, 8), np.int32)
    valid = np.zeros((1, 8), bool)
    valid[0, 0] = True
    shapes = np.array([[300, 300]], np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(), shapes)
    batch = Batch(images, jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid),
                  jnp.asarray(av), jnp.asarray(shapes))

    for _ in range(180):
        state, aux = step(state, batch)
    assert float(aux["loss"]) < 0.5, f"failed to overfit: loss {float(aux['loss'])}"

    ev = make_eval_step(model, cfg)
    eb = EvalBatch(images, jnp.asarray(shapes), jnp.ones((1, 4), jnp.float32),
                   jnp.ones(1, dtype=bool))
    dets = ev({"params": state.params, "batch_stats": state.batch_stats}, eb)
    pc = detections_to_per_class(dets, 20)[0]
    top = pc[0][pc[0][:, 4] > 0.5]
    assert len(top) >= 1, "no confident detection after overfit"
    iou = np_bbox_overlaps(top[:1, :4], gt[None])[0, 0]
    assert iou > 0.8, f"detection IoU {iou} too low (box {top[0][:4]} vs {gt})"
