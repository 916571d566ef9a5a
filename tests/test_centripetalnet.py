"""CentripetalNet family — centripetal-shift corner pairing (parity
targets: mmdet/models/dense_heads/centripetal_head.py,
corner_head.py:463-487 shift targets, configs/centripetalnet/* — cited
in models/centripetal.py, engine/centripetal.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import (TrainConfig,
                                          tiny_centripetalnet_config)


def test_shift_targets_match_reference_formulas():
    """Guiding shift = scaled center relative to the corner pixel;
    centripetal shift = log(center - exact corner) (corner_head.py
    :463-487), written at the truncated corner pixel."""
    from aod_meh_hua_tpu.engine.centripetal import centripetal_targets_single

    cfg = tiny_centripetalnet_config()
    g = cfg.max_gt
    boxes = np.zeros((g, 4), np.float32)
    boxes[0] = [10.0, 6.0, 50.0, 38.0]
    labels = np.zeros((g,), np.int32)
    labels[0] = 2
    valid = np.zeros((g,), bool)
    valid[0] = True
    t = centripetal_targets_single(jnp.asarray(boxes), jnp.asarray(labels),
                                   jnp.asarray(valid), cfg)
    r = 1.0 / cfg.out_stride
    sl, st, sr, sb = 10 * r, 6 * r, 50 * r, 38 * r
    scx, scy = (sl + sr) / 2, (st + sb) / 2
    li, ti, ri, bi = int(sl), int(st), int(sr), int(sb)
    np.testing.assert_allclose(np.asarray(t["tl_guide"])[ti, li],
                               [scx - li, scy - ti], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t["br_guide"])[bi, ri],
                               [ri - scx, bi - scy], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t["tl_cent"])[ti, li],
                               [np.log(scx - sl), np.log(scy - st)],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t["br_cent"])[bi, ri],
                               [np.log(sr - scx), np.log(sb - scy)],
                               rtol=1e-5)
    # masks mark exactly the corner pixels
    assert np.asarray(t["tl_mask"]).sum() == 1
    assert np.asarray(t["tl_mask"])[ti, li] == 1


def test_centripetalnet_overfits_and_detects():
    """A few hundred steps on a two-object batch: decode pairs corners
    via centripetal shifts (no embeddings anywhere in the model) and
    recovers both boxes."""
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.engine.centripetal import \
        make_centripetal_train_step
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg = tiny_centripetalnet_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_centripetal_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    rng = np.random.RandomState(0)
    h, w = cfg.canvas
    g = cfg.max_gt
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:40, 8:40] = rng.randn(32, 32, 3).astype(np.float32) + 2.5
    boxes[0, 0] = [8, 8, 40, 40]
    labels[0, 0] = 1
    images[1, 24:56, 28:60] = rng.randn(32, 32, 3).astype(np.float32) - 2.5
    boxes[1, 0] = [28, 24, 60, 56]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = np.ones((2, 1), bool)  # keypoint family: anchors unused
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)

    state = jax.tree.map(jnp.array, state)
    for _ in range(300):
        state, aux = train_step(state, batch)
    assert np.isfinite(float(aux["loss"]))

    eb = EvalBatch(images, shapes, np.ones((2, 4), np.float32),
                   np.ones(2, bool))
    r = eval_step({"params": state.params,
                   "batch_stats": state.batch_stats}, eb)
    for i in range(2):
        ok = np.asarray(r.valid[i]) & (np.asarray(r.scores[i]) > 0.25)
        assert ok.any(), f"img {i}: no confident detections"
        det = np.asarray(r.boxes[i])[ok]
        lab = np.asarray(r.labels[i])[ok]
        best = np.asarray(bbox_overlaps(
            jnp.asarray(boxes[i][:1]), jnp.asarray(det)))[0]
        j = best.argmax()
        assert best[j] > 0.5, f"img {i}: best IoU {best[j]}"
        assert lab[j] == labels[i, 0]
