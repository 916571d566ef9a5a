"""SABL: bucketing coder parity vs a transcription of the reference,
decode round-trip, and family learnability.

Reference: /root/reference/mmdet/core/bbox/coder/bucketing_bbox_coder.py
+ mmdet/models/dense_heads/sabl_retina_head.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.ops.bucketing import bbox2bucket, bbox_rescale, bucket2bbox
from aod_meh_hua_tpu.utils.config import tiny_sabl_config


def _np_bbox2bucket(props, gt, nb, sf, topk=2, ub=1.0, ign=True):
    """Transcription of bucketing_bbox_coder.py:146-265."""
    side = int(np.ceil(nb / 2.0))
    p = np.asarray(bbox_rescale(jnp.asarray(props), sf))
    pw = p[:, 2] - p[:, 0]
    ph = p[:, 3] - p[:, 1]
    bw, bh = pw / nb, ph / nb
    steps = 0.5 + np.arange(side)
    l = p[:, 0, None] + steps * bw[:, None]
    r = p[:, 2, None] - steps * bw[:, None]
    t = p[:, 1, None] + steps * bh[:, None]
    d = p[:, 3, None] - steps * bh[:, None]
    offs = {"l": (l - gt[:, 0, None]) / bw[:, None],
            "r": (r - gt[:, 2, None]) / bw[:, None],
            "t": (t - gt[:, 1, None]) / bh[:, None],
            "d": (d - gt[:, 3, None]) / bh[:, None]}
    n = props.shape[0]
    w_all, lab_all, clsw_all, off_all = [], [], [], []
    for key in ("l", "r", "t", "d"):
        o = offs[key]
        order = np.argsort(np.abs(o), axis=1, kind="stable")
        w = np.zeros_like(o)
        for i in range(n):
            w[i, order[i, 0]] = 1.0
            for kk in range(1, topk):
                w[i, order[i, kk]] = float(
                    np.abs(o[i, order[i, kk]]) < ub)
        lab = np.zeros_like(o)
        lab[np.arange(n), order[:, 0]] = 1.0
        cw = (np.abs(o) < 1).astype(np.float32)
        if ign:
            cw = (~((cw == 1) & (lab == 0))).astype(np.float32)
        else:
            cw = np.ones_like(cw)
        off_all.append(o)
        w_all.append(w)
        lab_all.append(lab)
        clsw_all.append(cw)
    return (np.concatenate(off_all, 1), np.concatenate(w_all, 1),
            np.concatenate(lab_all, 1), np.concatenate(clsw_all, 1))


def test_bbox2bucket_matches_reference():
    rng = np.random.RandomState(0)
    n = 30
    props = np.zeros((n, 4), np.float32)
    props[:, 0] = rng.uniform(0, 50, n)
    props[:, 1] = rng.uniform(0, 50, n)
    props[:, 2] = props[:, 0] + rng.uniform(10, 60, n)
    props[:, 3] = props[:, 1] + rng.uniform(10, 60, n)
    gt = props + rng.uniform(-8, 8, (n, 4)).astype(np.float32)

    want = _np_bbox2bucket(props, gt, 14, 3.0)
    got = bbox2bucket(jnp.asarray(props), jnp.asarray(gt), 14, 3.0)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-4, atol=1e-5)


def test_bucket_decode_recovers_gt_from_targets():
    """Feeding the encoder's own targets (one-hot labels as logits,
    exact offsets) back through bucket2bbox reproduces the gt box."""
    rng = np.random.RandomState(1)
    n = 12
    props = np.zeros((n, 4), np.float32)
    props[:, 0] = rng.uniform(0, 40, n)
    props[:, 1] = rng.uniform(0, 40, n)
    props[:, 2] = props[:, 0] + rng.uniform(20, 50, n)
    props[:, 3] = props[:, 1] + rng.uniform(20, 50, n)
    gt = props + rng.uniform(-5, 5, (n, 4)).astype(np.float32)

    off, _, lab, _ = bbox2bucket(jnp.asarray(props), jnp.asarray(gt), 14, 3.0)
    # one-hot labels as very confident logits; offsets exact
    boxes, conf = bucket2bbox(jnp.asarray(props), lab * 50.0, off, 14, 3.0)
    np.testing.assert_allclose(np.asarray(boxes), gt, rtol=1e-3, atol=1e-2)
    assert (np.asarray(conf) > 0.5).all()


def test_sabl_overfits_and_detects():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, EvalBatch, create_train_state
    from aod_meh_hua_tpu.engine.sabl import make_sabl_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_sabl_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_sabl_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 10:34, 20:44] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [20, 10, 44, 34]
    labels[0, 0] = 2
    images[1, 20:52, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [60, 20, 92, 52]
    labels[1, 0] = 4
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    state = jax.tree.map(jnp.array, state)
    losses = []
    for _ in range(150):
        state, aux = train_step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step(variables, eb)
    scores = np.asarray(dets.scores)
    valid = np.asarray(dets.valid)
    lab = np.asarray(dets.labels)
    bx = np.asarray(dets.boxes)
    for i, want in enumerate([2, 4]):
        m = valid[i] & (scores[i] > 0.1)
        assert m.any(), f"image {i}: no detection"
        top = np.argmax(np.where(m, scores[i], -1))
        assert lab[i][top] == want
        gt = batch.gt_boxes[i, 0]
        b = bx[i][top]
        x1 = max(b[0], gt[0]); y1 = max(b[1], gt[1])
        x2 = min(b[2], gt[2]); y2 = min(b[3], gt[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        union = ((b[2] - b[0]) * (b[3] - b[1])
                 + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
        assert inter / union > 0.4, f"image {i}: IoU {inter / union}"
