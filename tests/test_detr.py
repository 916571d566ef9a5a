"""DETR family: on-device Hungarian matching, sine positional encoding,
set criterion, and the fused train / NMS-free eval steps (parity
targets: reference hungarian_assigner.py / match_cost.py /
positional_encoding.py / detr_head.py, cited in
aod_meh_hua_tpu/models/detr.py and engine/detr.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.ops.hungarian import hungarian_match
from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_detr_config


def test_hungarian_matches_scipy_cost():
    """Exact min-cost vs scipy.linear_sum_assignment over random and
    tie-heavy matrices, rectangular shapes, padded rows."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(0)
    fn = jax.jit(hungarian_match)
    for trial in range(60):
        r = rng.randint(1, 9)
        c = rng.randint(r, 14)
        cost = rng.randn(r, c).astype(np.float32)
        if trial % 3 == 0:
            cost = np.round(cost)  # exercise ties
        nv = rng.randint(0, r + 1)
        valid = np.zeros(r, bool)
        valid[:nv] = True
        col = np.asarray(fn(jnp.asarray(cost), jnp.asarray(valid)))
        if not nv:
            continue
        rr, cc = linear_sum_assignment(cost[:nv])
        assert len(set(col[:nv])) == nv  # a true matching
        ours = cost[np.arange(nv), col[:nv]].sum()
        assert abs(ours - cost[rr, cc].sum()) < 1e-4


def test_sine_positional_encoding_shape_and_range():
    from aod_meh_hua_tpu.models.detr import sine_positional_encoding

    valid = np.ones((1, 4, 6), bool)
    valid[0, 3:, :] = False  # padded rows
    pos = np.asarray(sine_positional_encoding(jnp.asarray(valid), num_feats=8))
    assert pos.shape == (1, 4, 6, 16)
    assert np.abs(pos).max() <= 1.0 + 1e-6
    # normalized cumsum: the last VALID row's y-embedding hits scale
    # (sin(2*pi) ~ 0); distinct rows get distinct embeddings
    assert not np.allclose(pos[0, 0], pos[0, 1])
    # y channels first (reference cat order): columns of one row share
    # the y half, rows of one column share the x half
    np.testing.assert_allclose(pos[0, 1, 0, :8], pos[0, 1, 3, :8], atol=1e-6)
    np.testing.assert_allclose(pos[0, 0, 2, 8:], pos[0, 1, 2, 8:], atol=1e-6)


def test_match_single_assigns_gt_to_best_query():
    """A query whose box/class prediction nails a gt must win it."""
    from aod_meh_hua_tpu.engine.detr import _match_single

    cfg = tiny_detr_config()
    q, c, g = cfg.num_queries, cfg.num_classes, cfg.max_gt
    img_shape = jnp.asarray([64, 128], jnp.int32)
    cls_logits = np.zeros((q, c + 1), np.float32)
    boxes = np.full((q, 4), 0.5, np.float32)  # everyone predicts mid box
    # query 7 predicts gt 0 exactly: cxcywh normalized of [8,8,32,32]
    boxes[7] = [20 / 128, 20 / 64, 24 / 128, 24 / 64]
    cls_logits[7, 2] = 6.0
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_labels = np.zeros((g,), np.int32)
    gt_valid = np.zeros((g,), bool)
    gt_boxes[0] = [8, 8, 32, 32]
    gt_labels[0] = 2
    gt_valid[0] = True
    t = _match_single(jnp.asarray(cls_logits), jnp.asarray(boxes),
                      jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                      jnp.asarray(gt_valid), img_shape, cfg)
    labels = np.asarray(t.labels)
    assert labels[7] == 2
    assert (labels != c).sum() == 1  # exactly one positive
    np.testing.assert_allclose(np.asarray(t.bbox_targets)[7],
                               boxes[7], atol=1e-6)
    # no gts -> all background
    t0 = _match_single(jnp.asarray(cls_logits), jnp.asarray(boxes),
                       jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                       jnp.asarray(np.zeros((g,), bool)), img_shape, cfg)
    assert (np.asarray(t0.labels) == c).all()


@pytest.fixture(scope="module")
def detr_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.detr import make_detr_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_detr_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(optimizer="adamw", lr=1e-3, weight_decay=1e-4,
                       backbone_lr_mult=1.0, grad_clip=0.1, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_detr_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:32, 8:32] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [8, 8, 32, 32]
    labels[0, 0] = 1
    images[1, 30:62, 28:60] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [28, 30, 60, 62]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, state, train_step, eval_step, batch


def test_detr_train_step_finite_and_updates(detr_setup):
    cfg, state, train_step, eval_step, batch = detr_setup
    own = jax.tree.map(jnp.array, state)
    state1, aux = train_step(own, batch, jax.random.PRNGKey(0))
    for k in ("loss", "loss_cls", "loss_bbox", "loss_iou"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) == 2.0
    # transformer params move
    before = state.params["decoder_0"]["cross_attn"]["query"]["kernel"]
    after = state1.params["decoder_0"]["cross_attn"]["query"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_detr_overfits_and_detects(detr_setup):
    """Two synthetic objects: 400 AdamW steps recover both boxes with
    the right labels as the top NMS-free detections (IoU > 0.6)."""
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps
    from aod_meh_hua_tpu.engine.batch import EvalBatch

    cfg, state, train_step, eval_step, batch = detr_setup
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(0)
    for _ in range(400):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
    assert float(aux["loss"]) < 4.0

    h, w = cfg.canvas
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, eb)
    bx, sc = np.asarray(dets.boxes), np.asarray(dets.scores)
    lb = np.asarray(dets.labels)
    for b, (gt, lab) in enumerate([([8, 8, 32, 32], 1), ([28, 30, 60, 62], 3)]):
        i = sc[b].argmax()
        iou = np.asarray(bbox_overlaps(jnp.asarray([gt], jnp.float32),
                                       jnp.asarray(bx[b, i:i + 1])))[0, 0]
        assert iou > 0.6, (b, bx[b, i], iou)
        assert lb[b, i] == lab
