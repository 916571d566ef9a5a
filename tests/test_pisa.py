"""PISA: ISR-P / CARL parity vs numpy transcriptions of the reference's
loop-based implementations, group ranking, and family learnability.

Reference: /root/reference/mmdet/models/losses/pisa_loss.py +
dense_heads/pisa_retinanet_head.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.engine.pisa import (carl_loss_dense, group_rank_desc,
                                         isr_p_label_weights)
from aod_meh_hua_tpu.utils.config import tiny_pisa_config


def test_group_rank_desc():
    values = jnp.asarray([0.9, 0.1, 0.5, 0.7, 0.3, 0.2])
    group = jnp.asarray([0, 0, 0, 1, 1, 2])
    mask = jnp.asarray([True, True, True, True, True, False])
    r = np.asarray(group_rank_desc(values, group, mask, 3))
    np.testing.assert_array_equal(r[:5], [0, 2, 1, 0, 1])


def _np_focal(logits, labels, num_classes, gamma=2.0, alpha=0.25):
    p = 1 / (1 + np.exp(-logits))
    t = np.zeros_like(logits)
    for i, l in enumerate(labels):
        if l < num_classes:
            t[i, l] = 1
    pos = -alpha * (1 - p) ** gamma * np.log(np.clip(p, 1e-12, None))
    neg = -(1 - alpha) * p ** gamma * np.log(np.clip(1 - p, 1e-12, None))
    return t * pos + (1 - t) * neg


def _np_decode(anchors, deltas, stds):
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    d = deltas * np.asarray(stds)
    dw = np.clip(d[:, 2], -np.abs(np.log(16 / 1000)), np.abs(np.log(16 / 1000)))
    dh = np.clip(d[:, 3], -np.abs(np.log(16 / 1000)), np.abs(np.log(16 / 1000)))
    ncx = cx + d[:, 0] * w
    ncy = cy + d[:, 1] * h
    nw = w * np.exp(dw)
    nh = h * np.exp(dh)
    return np.stack([ncx - nw / 2, ncy - nh / 2, ncx + nw / 2, ncy + nh / 2], 1)


def _np_isr_p(cls, deltas, labels, lw, bt, anchors, gts, C, stds, k, bias):
    """Transcription of pisa_loss.py:8-122 (the two nested rank loops)."""
    pos = np.nonzero(labels < C)[0]
    if len(pos) == 0:
        return lw
    pos_labels = labels[pos]
    pb = _np_decode(anchors[pos], deltas[pos], stds)
    tb = _np_decode(anchors[pos], bt[pos], stds)
    x1 = np.maximum(pb[:, 0], tb[:, 0]); y1 = np.maximum(pb[:, 1], tb[:, 1])
    x2 = np.minimum(pb[:, 2], tb[:, 2]); y2 = np.minimum(pb[:, 3], tb[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    ap = (pb[:, 2] - pb[:, 0]) * (pb[:, 3] - pb[:, 1])
    at = (tb[:, 2] - tb[:, 0]) * (tb[:, 3] - tb[:, 1])
    ious = inter / np.maximum(ap + at - inter, 1e-6)
    w = lw[pos].copy()
    max_l_num = np.bincount(pos_labels).max()
    pg = gts[pos]
    for label in np.unique(pos_labels):
        l_inds = np.nonzero(pos_labels == label)[0]
        for t in np.unique(pg[l_inds]):
            t_inds = l_inds[pg[l_inds] == t]
            order = np.argsort(-ious[t_inds], kind="stable")
            rank = np.empty_like(order)
            rank[order] = np.arange(len(order))
            ious[t_inds] += max_l_num - rank
        order = np.argsort(-ious[l_inds], kind="stable")
        l_rank = np.empty_like(order)
        l_rank[order] = np.arange(len(order))
        w[np.arange(len(pos_labels))[l_inds]] *= (max_l_num - l_rank) / max_l_num
    w = (bias + w * (1 - bias)) ** k
    fl = _np_focal(cls[pos], pos_labels, C)
    ratio = (fl * lw[pos][:, None]).sum() / max((fl * w[:, None]).sum(), 1e-12)
    out = lw.copy()
    out[pos] = w * ratio
    return out


def test_isr_p_matches_reference():
    rng = np.random.RandomState(0)
    n, C = 60, 5
    cls = rng.randn(n, C).astype(np.float32)
    deltas = (rng.randn(n, 4) * 0.1).astype(np.float32)
    labels = np.full(n, C, np.int32)
    pos = rng.choice(n, 14, replace=False)
    labels[pos] = rng.randint(0, C, 14)
    lw = np.ones(n, np.float32)
    anchors = np.stack([rng.uniform(0, 50, n), rng.uniform(0, 50, n),
                        np.zeros(n), np.zeros(n)], 1).astype(np.float32)
    anchors[:, 2] = anchors[:, 0] + rng.uniform(5, 20, n)
    anchors[:, 3] = anchors[:, 1] + rng.uniform(5, 20, n)
    bt = (rng.randn(n, 4) * 0.1).astype(np.float32)
    gts = rng.randint(0, 6, n).astype(np.int32)
    stds = (1.0, 1.0, 1.0, 1.0)

    want = _np_isr_p(cls, deltas, labels, lw.copy(), bt, anchors, gts, C,
                     stds, k=2.0, bias=0.0)
    got = np.asarray(isr_p_label_weights(
        jnp.asarray(cls), jnp.asarray(deltas), jnp.asarray(labels),
        jnp.asarray(lw), jnp.asarray(bt), jnp.asarray(anchors),
        jnp.asarray(gts), C, stds, 2.0, 0.0))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_carl_matches_reference():
    rng = np.random.RandomState(1)
    n, C = 40, 5
    cls = rng.randn(n, C).astype(np.float32)
    deltas = (rng.randn(n, 4) * 0.2).astype(np.float32)
    bt = (rng.randn(n, 4) * 0.2).astype(np.float32)
    labels = np.full(n, C, np.int32)
    pos = rng.choice(n, 9, replace=False)
    labels[pos] = rng.randint(0, C, 9)
    beta, k, bias, avg = 0.11, 1.0, 0.2, 9.0

    # transcription of carl_loss (sigmoid branch)
    s = 1 / (1 + np.exp(-cls))
    ps = s[pos, labels[pos]]
    w = (bias + (1 - bias) * ps) ** k
    w = w * (len(pos) / w.sum())
    diff = np.abs(deltas[pos] - bt[pos])
    sl1 = np.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    want = (sl1 / avg * w[:, None]).sum()

    got = float(carl_loss_dense(jnp.asarray(cls), jnp.asarray(labels),
                                jnp.asarray(deltas), jnp.asarray(bt),
                                C, beta, k, bias, avg))
    assert got == pytest.approx(want, rel=1e-4)


def test_pisa_overfits_and_detects():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, EvalBatch, create_train_state
    from aod_meh_hua_tpu.engine.pisa import make_pisa_retina_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_pisa_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_pisa_retina_train_step(model, cfg, tx)
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
    for i, want in enumerate([2, 4]):
        m = valid[i] & (scores[i] > 0.2)
        assert m.any()
        assert lab[i][np.argmax(np.where(m, scores[i], -1))] == want


def test_score_hlr_groups_and_weights():
    """ScoreHLR negative selection: leaders claim overlapping boxes in
    score order; weights decay with the two-step rank and renormalize
    against the background-CE loss (score_hlr_sampler.py:101-213)."""
    from aod_meh_hua_tpu.engine.pisa import _score_hlr_neg
    from aod_meh_hua_tpu.utils.config import tiny_pisa_rcnn_config

    cfg = tiny_pisa_rcnn_config()
    c = cfg.num_classes
    n = 12
    # three clusters of near-identical boxes + some low-score boxes
    base = np.array([[10, 10, 30, 30], [50, 10, 70, 30], [90, 10, 110, 30]],
                    np.float32)
    cands = np.concatenate([
        np.repeat(base, 3, axis=0) + np.tile(
            np.array([[0, 0, 0, 0], [1, 1, 1, 1], [2, 0, 2, 0]],
                     np.float32), (3, 1)),
        base + 200.0,
    ]).astype(np.float32)
    neg_mask = np.ones(n, bool)
    cls = np.full((n, c + 1), -4.0, np.float32)
    # scores: cluster members get distinct fg logits; last 3 stay invalid
    fg = [3.0, 2.0, 1.0, 2.8, 1.8, 0.8, 2.6, 1.6, 0.6]
    for i, s in enumerate(fg):
        cls[i, 1] = s
    deltas = np.zeros((n, c * 4), np.float32)

    sel, w = _score_hlr_neg(
        jax.random.PRNGKey(0), jnp.asarray(cands), jnp.asarray(neg_mask),
        jnp.ones(n, bool), jnp.asarray(cls), jnp.asarray(deltas),
        jnp.asarray(6), cfg)
    sel = np.asarray(sel)
    w = np.asarray(w)
    # all 9 scored boxes are valid; exactly 6 highest-HLR selected
    assert sel.sum() == 6
    # the three cluster leaders (ranks 0 in-group) have the highest
    # importance and must all be selected
    assert sel[[0, 3, 6]].all()
    # within the selected set, leader weight > follower weight
    assert w[0] > w[1] or not sel[1]
    # weights renormalize: weighted bg-CE == unweighted bg-CE over sel
    probs = np.exp(cls - cls.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    ce = -np.log(probs[:, c])
    np.testing.assert_allclose((ce * w)[sel].sum(), ce[sel].sum(), rtol=1e-4)


def test_pisa_rcnn_trains():
    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.pisa import make_pisa_rcnn_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import (TrainConfig,
                                              tiny_pisa_rcnn_config)

    cfg = tiny_pisa_rcnn_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    step = make_pisa_rcnn_train_step(model, cfg, tx)

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
    key = jax.random.PRNGKey(5)
    losses = []
    for _ in range(60):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert float(aux["num_pos"]) > 0
