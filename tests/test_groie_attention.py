"""GRoIE and empirical-attention families + the shared
GeneralizedAttention module (parity targets:
mmdet/models/roi_heads/roi_extractors/generic_roi_extractor.py,
configs/groie/*, configs/empirical_attention/* — cited in
models/attention.py, models/two_stage.py, engine/two_stage.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import (TrainConfig,
                                          tiny_empirical_attention_config,
                                          tiny_groie_config)


def test_generalized_attention_is_identity_at_init():
    """gamma inits to 0, so the block is exactly the identity — the
    plugged backbone starts as the plain ResNet."""
    from aod_meh_hua_tpu.models.attention import GeneralizedAttention

    for at in ("1111", "0010", "0100"):
        mod = GeneralizedAttention(num_heads=2, attention_type=at,
                                   kv_stride=2)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 10, 8),
                        jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_generalized_attention_rows_softmax_to_one():
    """With nonzero gamma the output is a proper attention: perturbing
    gamma changes the output, and the attention respects the term mask
    (a '0000'-style check: query/key convs exist only when needed)."""
    from aod_meh_hua_tpu.models.attention import GeneralizedAttention

    mod = GeneralizedAttention(num_heads=2, attention_type="0010",
                               kv_stride=1)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 6, 6, 8), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    p = jax.tree.map(np.array, variables["params"])
    assert "key_conv" in p and "query_conv" not in p  # term 3 only
    p["gamma"] = np.ones_like(p["gamma"])
    y = mod.apply({"params": p}, x)
    assert not np.allclose(np.asarray(y), np.asarray(x))
    assert np.isfinite(np.asarray(y)).all()


def _two_object_batch(cfg, rng):
    h, w = cfg.canvas
    g = cfg.max_gt
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:40, 8:40] = rng.randn(32, 32, 3).astype(np.float32) + 2.5
    boxes[0, 0] = [8, 8, 40, 40]
    labels[0, 0] = 1
    images[1, 24:56, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.5
    boxes[1, 0] = [60, 24, 92, 56]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    return images, boxes, labels, gt_valid, shapes


def _overfit_and_check(cfg, steps=200, lr=0.01):
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.engine.two_stage import make_faster_rcnn_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=lr, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_faster_rcnn_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    rng = np.random.RandomState(0)
    images, boxes, labels, gt_valid, shapes = _two_object_batch(cfg, rng)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)

    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(0)
    for _ in range(steps):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
    assert np.isfinite(float(aux["loss"]))

    eb = EvalBatch(images, shapes, np.ones((2, 4), np.float32),
                   np.ones(2, bool))
    r = eval_step({"params": state.params,
                   "batch_stats": state.batch_stats}, eb)
    for i in range(2):
        ok = np.asarray(r.valid[i]) & (np.asarray(r.scores[i]) > 0.3)
        assert ok.any(), f"img {i}: no confident detections"
        det = np.asarray(r.boxes[i])[ok]
        lab = np.asarray(r.labels[i])[ok]
        best = np.asarray(bbox_overlaps(
            jnp.asarray(boxes[i][:1]), jnp.asarray(det)))[0]
        j = best.argmax()
        assert best[j] > 0.5, f"img {i}: best IoU {best[j]}"
        assert lab[j] == labels[i, 0]


def test_groie_overfits_and_detects():
    _overfit_and_check(tiny_groie_config())


def test_empirical_attention_overfits_and_detects():
    _overfit_and_check(tiny_empirical_attention_config())
