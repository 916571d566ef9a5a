"""FPG and GN+WS families (parity targets: mmdet/models/necks/fpg.py,
configs/fpg/*, configs/gn+ws/* — cited in models/fpg.py,
models/gn_ws.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import (TrainConfig, tiny_fpg_config,
                                          tiny_gn_ws_config)


def test_fpg_shapes_and_skip_staircase():
    """5-level grid out of 4 backbone levels; staircase skip_inds build
    no transition params for the skipped (stage, level) cells."""
    from aod_meh_hua_tpu.models.fpg import FPG

    neck = FPG(out_channels=16, inter_channels=16, num_outs=5,
               stack_times=5)
    inputs = tuple(jnp.zeros((1, 64 // s, 128 // s, c), jnp.float32)
                   for s, c in ((4, 8), (8, 16), (16, 32), (32, 64)))
    variables = neck.init(jax.random.PRNGKey(0), inputs)
    outs = neck.apply(variables, inputs)
    assert [o.shape for o in outs] == [
        (1, 16, 32, 16), (1, 8, 16, 16), (1, 4, 8, 16), (1, 2, 4, 16),
        (1, 1, 2, 16)]
    p = variables["params"]
    # level 0 skips stages 0-3: its first transitions appear at stage 4
    assert "s0_l0_lateral" not in p and "s4_l0_lateral" in p
    # level 4 never skips
    assert "s0_l4_lateral" in p
    # top level has no across_down; bottom level has no same_up
    assert "s4_l4_across_down" not in p and "s4_l0_same_up" not in p


def test_conv_ws_standardizes_weights():
    """ConvWS == plain conv of the per-out-channel standardized kernel
    (mmcv ConvWS2d semantics)."""
    from aod_meh_hua_tpu.models.gn_ws import ConvWS

    mod = ConvWS(features=6, kernel=3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    k = variables["params"]["kernel"]
    std = (k - k.mean(axis=(0, 1, 2), keepdims=True)) / (
        k.std(axis=(0, 1, 2), keepdims=True) + 1e-5)
    want = jax.lax.conv_general_dilated(
        x, std, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


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


def test_fpg_overfits_and_detects():
    _overfit_and_check(tiny_fpg_config())


def test_gn_ws_overfits_and_detects():
    _overfit_and_check(tiny_gn_ws_config())
