"""HTC: mask info flow wiring, semantic fusion, and learnability.

Reference: /root/reference/mmdet/models/roi_heads/htc_roi_head.py +
mask_heads/{htc_mask_head,fused_semantic_head}.py + configs/htc/."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_htc_config


def _mk_batch(cfg, rng):
    from aod_meh_hua_tpu.engine.htc import HTCBatch
    from aod_meh_hua_tpu.ops import anchor_valid_flags

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
    # full-box instance rasters; semantic = stride-8 label paint
    masks = np.zeros((2, g, r, r), np.float32)
    masks[:, 0] = 1.0
    seg = np.zeros((2, h // 8, w // 8), np.int32)
    for b in range(2):
        x1, y1, x2, y2 = (boxes[b, 0] / 8).astype(int)
        seg[b, y1:y2 + 1, x1:x2 + 1] = labels[b, 0] + 1
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    return HTCBatch(images, boxes, labels, gt_valid, av, shapes, masks, seg)


def test_htc_model_has_stagewise_heads_and_info_flow():
    from aod_meh_hua_tpu.api import init_detector

    cfg = tiny_htc_config()
    model, variables = init_detector(cfg, seed=0)
    p = variables["params"]
    for i in range(cfg.num_stages):
        assert f"bbox_head_{i}" in p
        assert f"mask_head_{i}" in p
    assert "semantic_head" in p
    # info flow: heads 1..N-1 own a conv_res (head 0 never receives one)
    assert "conv_res" not in p["mask_head_0"]
    assert "conv_res" in p["mask_head_1"]
    assert "conv_res" in p["mask_head_2"]
    assert "conv_embedding" in p["semantic_head"]


def test_htc_trains_and_predicts_masks():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import EvalBatch, create_train_state
    from aod_meh_hua_tpu.engine.htc import make_htc_train_step

    cfg = tiny_htc_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    step = make_htc_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    rng = np.random.RandomState(0)
    batch = _mk_batch(cfg, rng)
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(13)
    losses = []
    segs = []
    for _ in range(80):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
        losses.append(float(aux["loss"]))
        segs.append(float(aux["loss_semantic_seg"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])
    assert segs[-1] < segs[0]  # semantic branch learns
    for s in range(cfg.num_stages):
        assert np.isfinite(float(aux[f"s{s}.loss_mask"]))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step(variables, eb)
    scores = np.asarray(dets.scores)
    valid = np.asarray(dets.valid)
    masks = np.asarray(dets.masks)
    assert masks.shape[-1] == cfg.mask_size
    for i in range(2):
        m = valid[i] & (scores[i] > 0.2)
        assert m.any(), f"image {i}: no detection"
        top = np.argmax(np.where(m, scores[i], -1))
        # the full-box gt raster -> predicted mask mostly on
        assert masks[i, top].mean() > 0.5
