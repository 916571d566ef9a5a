"""YOLOF family: ctr-clamped decode, uniform matching, implicit
objectness, and the fused train / eval steps (parity targets: reference
dilated_encoder.py / yolof_head.py / uniform_assigner.py /
delta_xywh_bbox_coder.py ctr-clamp branch, cited in
aod_meh_hua_tpu/models/yolof.py and engine/yolof.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_yolof_config


def test_yolof_decode_ctr_clamp():
    """Center shift clamps at +-ctr_clamp px; wh clamps from above only
    (delta_xywh_bbox_coder.py:226-236)."""
    from aod_meh_hua_tpu.engine.yolof import yolof_decode

    anchors = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])
    # huge positive center shift: dx*pw = 500 -> clamped to 32
    d = jnp.asarray([[5.0, 0.0, 0.0, 0.0]])
    out = np.asarray(yolof_decode(anchors, d, ctr_clamp=32.0))[0]
    np.testing.assert_allclose(out, [32 - 50 + 50, 0, 32 + 50 + 50, 100],
                               atol=1e-4)
    # dw above max_ratio clamps; NEGATIVE dw does not (upper-only clamp)
    d = jnp.asarray([[0.0, 0.0, 10.0, -10.0]])
    out = np.asarray(yolof_decode(anchors, d, ctr_clamp=32.0))[0]
    max_ratio = abs(np.log(16 / 1000))
    assert np.isclose(out[2] - out[0], 100 * np.exp(max_ratio), rtol=1e-5)
    assert np.isclose(out[3] - out[1], 100 * np.exp(-10.0), atol=1e-4)


def test_uniform_matching_semantics():
    """Each gt takes the 4 cheapest anchors by pred cost AND by anchor
    cost; low-anchor-IoU candidates are dropped; high-overlap negatives
    get weight 0 (uniform_assigner.py:64-121)."""
    from aod_meh_hua_tpu.engine.yolof import _uniform_match_single

    cfg = tiny_yolof_config()
    gen = cfg.build_anchor_generator()
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(cfg.featmap_sizes())))
    a = anchors.shape[0]
    g = cfg.max_gt
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_labels = np.zeros((g,), np.int32)
    gt_valid = np.zeros((g,), bool)
    gt_boxes[0] = [0, 0, 32, 32]
    gt_labels[0] = 2
    gt_valid[0] = True
    decoded = jnp.asarray(np.tile([[200.0, 200.0, 230.0, 230.0]], (a, 1)))
    labels, weights, cand_idx, cand_gt, cand_w, num_pos = \
        _uniform_match_single(decoded, anchors, jnp.asarray(gt_boxes),
                              jnp.asarray(gt_labels), jnp.asarray(gt_valid),
                              cfg)
    labels = np.asarray(labels)
    pos = (labels == 2).nonzero()[0]
    # only anchor-cost candidates can pass the anchor-IoU gate here (the
    # decoded boxes sit far away): at most match_times survivors, at
    # least one (the anchor on the gt)
    assert 1 <= len(pos) <= cfg.match_times
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    iou = np.asarray(bbox_overlaps(jnp.asarray(gt_boxes[:1]), anchors[pos]))
    assert (iou >= cfg.pos_ignore_thr).all()
    assert float(num_pos) == len(pos)
    # no gts -> all background, full weights
    l0, w0, *_rest, np0 = _uniform_match_single(
        decoded, anchors, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(np.zeros((g,), bool)), cfg)
    assert (np.asarray(l0) == cfg.num_classes).all()
    assert float(np0) == 0.0


@pytest.fixture(scope="module")
def yolof_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.yolof import make_yolof_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_yolof_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_yolof_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:40, 8:40] = rng.randn(32, 32, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [8, 8, 40, 40]
    labels[0, 0] = 1
    images[1, 24:62, 20:60] = rng.randn(38, 40, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [20, 24, 60, 62]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, state, train_step, eval_step, batch


def test_yolof_train_step_runs_and_updates_bn(yolof_setup):
    cfg, state, train_step, eval_step, batch = yolof_setup
    own = jax.tree.map(jnp.array, state)
    before = np.asarray(own.batch_stats["neck"]["lateral"]["bn"]["mean"]).copy()
    state1, aux = train_step(own, batch)
    for k in ("loss", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) >= 2.0
    after = np.asarray(state1.batch_stats["neck"]["lateral"]["bn"]["mean"])
    assert not np.allclose(before, after)  # encoder BN TRAINS


def test_yolof_overfits_and_detects(yolof_setup):
    """300 steps recover both synthetic boxes with the right labels."""
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps
    from aod_meh_hua_tpu.engine.batch import EvalBatch

    cfg, state, train_step, eval_step, batch = yolof_setup
    state = jax.tree.map(jnp.array, state)
    for _ in range(300):
        state, aux = train_step(state, batch)
    assert float(aux["loss"]) < 1.0

    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, eb)
    bx, sc = np.asarray(dets.boxes), np.asarray(dets.scores)
    lb = np.asarray(dets.labels)
    for b, (gt, lab) in enumerate([([8, 8, 40, 40], 1), ([20, 24, 60, 62], 3)]):
        i = sc[b].argmax()
        iou = np.asarray(bbox_overlaps(jnp.asarray([gt], jnp.float32),
                                       jnp.asarray(bx[b, i:i + 1])))[0, 0]
        assert iou > 0.6, (b, bx[b, i], iou)
        assert lb[b, i] == lab
