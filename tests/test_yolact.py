"""YOLACT: raster pasting, crop semantics, and learnability with
prototype masks.

Reference: /root/reference/mmdet/models/dense_heads/yolact_head.py +
configs/yolact/yolact_r50_1x8_coco.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.engine.yolact import crop_masks, paste_rasters
from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_yolact_config


def test_paste_rasters_places_box_mask():
    g, r = 3, 8
    boxes = np.zeros((g, 4), np.float32)
    boxes[0] = [32, 16, 96, 48]  # covers cells x 8..23, y 4..11 at /4
    masks = np.zeros((g, r, r), np.float32)
    masks[0] = 1.0
    out = np.asarray(paste_rasters(jnp.asarray(boxes), jnp.asarray(masks),
                                   (16, 32), (64, 128)))
    assert out.shape == (3, 16, 32)
    # inside the box -> 1, outside -> 0
    assert out[0, 6, 12] == 1.0
    assert out[0, 6, 2] == 0.0
    assert out[0, 1, 12] == 0.0
    assert out[1].sum() == 0.0


def test_crop_masks_zeroes_outside_box():
    m = jnp.ones((2, 16, 32))
    boxes = jnp.asarray([[32, 16, 96, 48], [0, 0, 128, 64]], jnp.float32)
    out = np.asarray(crop_masks(m, boxes, (16, 32), (64, 128), padding=0))
    assert out[0, 6, 12] == 1.0
    assert out[0, 6, 4] == 0.0  # left of the box
    assert out[0, 2, 12] == 0.0  # above the box
    assert out[1].min() == 1.0  # full-image box keeps everything


def test_yolact_overfits_and_masks():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import EvalBatch, create_train_state
    from aod_meh_hua_tpu.engine.mask_rcnn import MaskBatch
    from aod_meh_hua_tpu.engine.yolact import make_yolact_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_yolact_config()
    model, variables = init_detector(cfg, seed=0)
    assert "protonet" in variables["params"]
    assert "segm_head" in variables["params"]
    # lr matches the reference recipe (configs/yolact/yolact_r50_1x8_coco.py
    # optimizer lr=1e-3): at 1e-2 the shared head conv's ReLU dies under the
    # early OHEM gradients and bbox regression freezes.
    tcfg = TrainConfig(lr=1e-3, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    step = make_yolact_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    r = cfg.gt_mask_raster
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
    masks = np.zeros((2, g, r, r), np.float32)
    masks[:, 0] = 1.0
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = MaskBatch(images, boxes, labels, gt_valid, av, shapes, masks)
    state = jax.tree.map(jnp.array, state)
    losses = []
    for _ in range(400):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert float(aux["loss_mask"]) < 3.0

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step(variables, eb)
    scores = np.asarray(dets.scores)
    valid = np.asarray(dets.valid)
    lab = np.asarray(dets.labels)
    m = np.asarray(dets.masks)
    assert m.shape[2:] == (cfg.canvas[0] // 4, cfg.canvas[1] // 4)
    for i, want in enumerate([2, 4]):
        sel = valid[i] & (scores[i] > 0.1)
        assert sel.any(), f"image {i}: no detection"
        top = np.argmax(np.where(sel, scores[i], -1))
        assert lab[i][top] == want
        # the mask concentrates inside the gt box region (proto coords)
        gt = (batch.gt_boxes[i, 0] / 4).astype(int)
        inside = m[i, top, gt[1]:gt[3], gt[0]:gt[2]].mean()
        assert inside > 0.4, f"image {i}: inside mass {inside}"
