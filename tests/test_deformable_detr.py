"""Deformable DETR family: the multi-scale deformable attention core
(fuzzed against a torch.grid_sample transcription of mmcv's pure-torch
fallback), focal-cost matching, and the fused train / sigmoid-top-k
eval steps (parity targets cited in models/deformable_detr.py and
engine/deformable_detr.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import (TrainConfig,
                                          tiny_deformable_detr_config)


def test_ms_deform_attn_matches_torch_grid_sample():
    """ops/ms_deform_attn.ms_deform_attn vs a literal torch transcription
    of mmcv multi_scale_deformable_attn_pytorch (grid_sample bilinear,
    padding_mode='zeros', align_corners=False), including out-of-range
    locations that exercise the zero-padding rule."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from aod_meh_hua_tpu.ops.ms_deform_attn import ms_deform_attn

    rng = np.random.RandomState(0)
    b, q, nh, hd, p = 2, 5, 3, 4, 2
    shapes = [(6, 9), (3, 5)]
    vals = [rng.randn(b, h, w, nh, hd).astype(np.float32) for (h, w) in shapes]
    # locations spill outside [0, 1] to hit the zero-padding branch
    locs = rng.uniform(-0.2, 1.2, (b, q, nh, len(shapes), p, 2)).astype(np.float32)
    wts = rng.rand(b, q, nh, len(shapes), p).astype(np.float32)
    wts /= wts.reshape(b, q, nh, -1).sum(-1)[..., None, None]

    ours = np.asarray(ms_deform_attn([jnp.asarray(v) for v in vals],
                                     jnp.asarray(locs), jnp.asarray(wts)))

    out = 0.0
    for lvl, v in enumerate(vals):
        h, w = shapes[lvl]
        vt = torch.from_numpy(v).permute(0, 3, 4, 1, 2).reshape(b * nh, hd, h, w)
        g = torch.from_numpy(locs[:, :, :, lvl]).permute(0, 2, 1, 3, 4)
        g = g.reshape(b * nh, q, p, 2) * 2.0 - 1.0
        samp = F.grid_sample(vt, g, mode="bilinear", padding_mode="zeros",
                             align_corners=False)          # [b*nh, hd, q, p]
        wt = torch.from_numpy(wts[:, :, :, lvl]).permute(0, 2, 1, 3)
        wt = wt.reshape(b * nh, 1, q, p)
        out = out + (samp * wt).sum(-1)                    # [b*nh, hd, q]
    ref = out.reshape(b, nh, hd, q).permute(0, 3, 1, 2).reshape(b, q, nh * hd)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_encoder_reference_points_centers():
    from aod_meh_hua_tpu.ops.ms_deform_attn import encoder_reference_points

    vr = np.ones((1, 2, 2), np.float32)
    ref = np.asarray(encoder_reference_points([(2, 4), (1, 2)],
                                              jnp.asarray(vr)))
    assert ref.shape == (1, 2 * 4 + 1 * 2, 2, 2)
    # first token of level 0: pixel center (0.5, 0.5) normalized
    np.testing.assert_allclose(ref[0, 0, 0], [0.5 / 4, 0.5 / 2], atol=1e-6)
    # level-1 tokens start after the 8 level-0 tokens, centered likewise
    np.testing.assert_allclose(ref[0, 8, 0], [0.5 / 2, 0.5 / 1], atol=1e-6)
    # valid_ratio: the per-level divide by (vr * H) and the final
    # rescale by vr cancel at the token's OWN level (reference formula,
    # transformer.py:490-507) — same-level refs are vr-invariant
    vr2 = np.full((1, 2, 2), 0.5, np.float32)
    ref2 = np.asarray(encoder_reference_points([(2, 4), (1, 2)],
                                               jnp.asarray(vr2)))
    np.testing.assert_allclose(ref2[0, 0, 0], ref[0, 0, 0], atol=1e-6)


def test_focal_cost_prefers_confident_right_class():
    from aod_meh_hua_tpu.engine.deformable_detr import _focal_cost

    logits = np.zeros((3, 4), np.float32)
    logits[1, 2] = 5.0    # query 1 confident in class 2
    logits[2, 2] = -5.0   # query 2 confidently rejects class 2
    cost = np.asarray(_focal_cost(jnp.asarray(logits),
                                  jnp.asarray([2], np.int32), 2.0, 0.25))
    assert cost.shape == (1, 3)
    assert cost[0, 1] < cost[0, 0] < cost[0, 2]


@pytest.fixture(scope="module")
def ddetr_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.deformable_detr import \
        make_deformable_detr_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_deformable_detr_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(optimizer="adamw_deform", lr=1e-3, weight_decay=1e-4,
                       backbone_lr_mult=1.0, grad_clip=0.1, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_deformable_detr_train_step(model, cfg, tx)
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


def test_ddetr_train_step_finite_and_updates(ddetr_setup):
    cfg, state, train_step, eval_step, batch = ddetr_setup
    own = jax.tree.map(jnp.array, state)
    state1, aux = train_step(own, batch, jax.random.PRNGKey(0))
    for k in ("loss", "loss_cls", "loss_bbox", "loss_iou"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) == 2.0
    # deformable cross-attention params move
    before = state.params["decoder_0"]["cross_attn"]["sampling_offsets"]["kernel"]
    after = state1.params["decoder_0"]["cross_attn"]["sampling_offsets"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_ddetr_overfits_and_detects(ddetr_setup):
    """Two synthetic objects: 400 AdamW steps recover both boxes with
    the right labels as the top NMS-free detections (IoU > 0.6)."""
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg, state, train_step, eval_step, batch = ddetr_setup
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(0)
    for _ in range(400):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
    assert float(aux["loss"]) < 4.0

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
