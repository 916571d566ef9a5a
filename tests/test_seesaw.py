"""Seesaw-loss Mask R-CNN family (parity targets:
mmdet/models/losses/seesaw_loss.py, configs/seesaw_loss/* — cited in
engine/seesaw.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_seesaw_config


def _seesaw_ce_reference(cls_score, labels, weights, cum, p, q, eps):
    """Numpy transcription of seesaw_ce_loss (seesaw_loss.py:11-76)."""
    n, c = cls_score.shape
    onehot = np.eye(c)[labels]
    w = np.ones_like(cls_score)
    if p > 0:
        cs = np.maximum(cum, 1.0)
        ratio = cs[None, :] / cs[:, None]
        sw = np.where(ratio < 1.0, ratio ** p, 1.0)
        w = w * sw[labels]
    if q > 0:
        e = np.exp(cls_score - cls_score.max(-1, keepdims=True))
        scores = e / e.sum(-1, keepdims=True)
        self_s = scores[np.arange(n), labels]
        ratio = scores / np.maximum(self_s[:, None], eps)
        w = w * np.where(ratio > 1.0, ratio ** q, 1.0)
    adj = cls_score + np.log(w) * (1 - onehot)
    e = np.exp(adj - adj.max(-1, keepdims=True))
    logp = adj - adj.max(-1, keepdims=True) - np.log(e.sum(-1, keepdims=True))
    ce = -logp[np.arange(n), labels]
    return (ce * weights).sum()


def test_seesaw_ce_matches_transcription():
    from aod_meh_hua_tpu.engine.seesaw import seesaw_ce

    rng = np.random.RandomState(0)
    for trial in range(5):
        n, c = 12, 6
        logits = rng.randn(n, c).astype(np.float32) * 2
        labels = rng.randint(0, c, n)
        weights = (rng.rand(n) > 0.3).astype(np.float32)
        cum = rng.randint(0, 50, c).astype(np.float32)
        want = _seesaw_ce_reference(logits, labels, weights, cum,
                                    0.8, 2.0, 1e-2)
        got = seesaw_ce(jnp.asarray(logits), jnp.asarray(labels),
                        jnp.asarray(weights), jnp.asarray(cum), c,
                        0.8, 2.0, 1e-2)
        np.testing.assert_allclose(float(got), want, rtol=1e-4,
                                   err_msg=f"trial {trial}")
    # balanced counts and p only -> plain CE (all ratios == 1)
    cum = np.full(6, 10.0, np.float32)
    got = seesaw_ce(jnp.asarray(logits), jnp.asarray(labels),
                    jnp.asarray(weights), jnp.asarray(cum), 6,
                    0.8, 0.0, 1e-2)
    want = _seesaw_ce_reference(logits, labels, weights, cum, 0.0, 0.0, 1e-2)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_seesaw_trains_and_counts_accumulate():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import EvalBatch, create_train_state
    from aod_meh_hua_tpu.engine.mask_rcnn import MaskBatch
    from aod_meh_hua_tpu.engine.seesaw import (SEESAW_KEY,
                                               make_seesaw_train_step)
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg = tiny_seesaw_config()
    model, variables = init_detector(cfg, seed=0)
    # the classifier really has C+2 channels
    assert variables["params"]["bbox_head"]["fc_cls"]["kernel"].shape[-1] \
        == cfg.num_classes + 2
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    step = make_seesaw_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    rng = np.random.RandomState(0)
    h, w = cfg.canvas
    g = cfg.max_gt
    r = cfg.gt_mask_raster
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
    masks = np.zeros((2, g, r, r), np.float32)
    masks[:, 0] = 1.0
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = MaskBatch(images, boxes, labels, gt_valid, av, shapes, masks)

    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(13)
    losses = []
    for _ in range(150):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0]
    cum = np.asarray(state.batch_stats[SEESAW_KEY])
    # counts accumulated across steps: background dominates, and only
    # the two gt classes have foreground counts
    assert cum[cfg.num_classes] > cum[:cfg.num_classes].sum()
    fg = cum[:cfg.num_classes]
    assert fg[2] > 0 and fg[4] > 0
    assert fg[[0, 1, 3, 5]].sum() == 0

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eb = EvalBatch(images, shapes, np.ones((2, 4), np.float32),
                   np.ones(2, bool))
    dets = eval_step(variables, eb)
    for i in range(2):
        m = np.asarray(dets.valid[i]) & (np.asarray(dets.scores[i]) > 0.2)
        assert m.any(), f"image {i}: no detection"
        det = np.asarray(dets.boxes[i])[m]
        lab = np.asarray(dets.labels[i])[m]
        best = np.asarray(bbox_overlaps(
            jnp.asarray(boxes[i][:1]), jnp.asarray(det)))[0]
        j = best.argmax()
        assert best[j] > 0.5
        assert lab[j] == labels[i, 0]
        assert np.asarray(dets.masks[i])[m][j].mean() > 0.5