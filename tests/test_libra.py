"""Libra R-CNN: Balanced L1 loss, the IoU-balanced CombinedSampler, the
Balanced Feature Pyramid, and the family's end-to-end learnability.

Reference parity targets (/root/reference):
* mmdet/models/losses/balanced_l1_loss.py:12-50
* mmdet/core/bbox/samplers/instance_balanced_pos_sampler.py:13,
  iou_balanced_neg_sampler.py:9 (floor_thr=-1, num_bins=3 — the live
  configs/libra_rcnn/libra_faster_rcnn_r50_fpn_1x_coco.py settings)
* mmdet/models/necks/bfp.py:10-101
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.ops.losses import balanced_l1_loss
from aod_meh_hua_tpu.ops.sampler import libra_sample_pos_neg
from aod_meh_hua_tpu.utils.config import tiny_libra_config


# --------------------------------------------------------------------------
# Balanced L1
# --------------------------------------------------------------------------


def _balanced_l1_ref(diff, beta=1.0, alpha=0.5, gamma=1.5):
    """Direct numpy transcription of balanced_l1_loss.py:42-49."""
    b = np.e ** (gamma / alpha) - 1
    return np.where(
        diff < beta,
        alpha / b * (b * diff + 1) * np.log(b * diff / beta + 1) - alpha * diff,
        gamma * diff + gamma / b - alpha * beta)


def test_balanced_l1_matches_reference_formula():
    rng = np.random.RandomState(0)
    pred = rng.randn(64, 4).astype(np.float32) * 2
    target = rng.randn(64, 4).astype(np.float32)
    got = np.asarray(balanced_l1_loss(jnp.asarray(pred), jnp.asarray(target),
                                      reduction="none"))
    want = _balanced_l1_ref(np.abs(pred - target).astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_balanced_l1_continuous_at_beta():
    eps = 1e-4
    lo = float(balanced_l1_loss(jnp.array([1.0 - eps]), jnp.array([0.0]),
                                reduction="none")[0])
    hi = float(balanced_l1_loss(jnp.array([1.0 + eps]), jnp.array([0.0]),
                                reduction="none")[0])
    assert abs(hi - lo) < 1e-3
    g = jax.grad(lambda p: balanced_l1_loss(p, jnp.zeros(()), reduction="none"))
    # gradient approaches gamma from both sides at |diff| = beta
    assert abs(float(g(jnp.array(1.0 - 1e-3))) - 1.5) < 0.01
    assert abs(float(g(jnp.array(1.0 + 1e-3))) - 1.5) < 1e-5


# --------------------------------------------------------------------------
# CombinedSampler (instance-balanced pos + IoU-balanced neg)
# --------------------------------------------------------------------------


def _sample(assigned, max_ov, num=32, pos_fraction=0.25, num_gt=8, seed=0):
    n = len(assigned)
    return libra_sample_pos_neg(
        jax.random.PRNGKey(seed), jnp.asarray(assigned, jnp.int32),
        jnp.ones((n,), bool), jnp.asarray(max_ov, jnp.float32),
        num, pos_fraction, num_gt=num_gt)


def test_libra_sampler_fixed_shape_and_counts():
    rng = np.random.RandomState(1)
    assigned = np.zeros(400, np.int32)
    assigned[:30] = rng.randint(1, 4, 30)       # positives on gts 0-2
    max_ov = rng.uniform(0.0, 0.45, 400)
    max_ov[:30] = rng.uniform(0.55, 0.95, 30)
    s = _sample(assigned, max_ov)
    inds, is_pos, valid = map(np.asarray, (s.inds, s.is_pos, s.valid))
    assert valid.all()                           # 400 candidates >> 32 slots
    assert is_pos.sum() == 8                     # num * pos_fraction
    assert int(s.num_pos) == 8
    # positives first, then negatives (reference cat order)
    assert not np.any(np.diff(is_pos.astype(int)) > 0)
    assert all(assigned[i] > 0 for i in inds[is_pos])
    assert all(assigned[i] == 0 for i in inds[valid & ~is_pos])
    assert len(np.unique(inds)) == len(inds)     # no double draws


def test_libra_sampler_instance_balance():
    """gt 1 owns 40 positives, gt 2 owns 2: the quota round(8/2)+1 = 5 caps
    gt 1 while gt 2 keeps both (instance_balanced_pos_sampler.py:30-44)."""
    assigned = np.zeros(300, np.int32)
    assigned[:40] = 1
    assigned[40:42] = 2
    max_ov = np.full(300, 0.1)
    max_ov[:42] = 0.9
    s = _sample(assigned, max_ov, num=32, pos_fraction=0.25)
    sel = np.asarray(s.inds)[np.asarray(s.is_pos)]
    per_gt = np.bincount(np.asarray(assigned)[sel], minlength=3)
    assert per_gt[1] + per_gt[2] == 8
    assert per_gt[2] == 2                        # the rare instance survives
    assert per_gt[1] == 6                        # 5 by quota + 1 random extra


def test_libra_sampler_iou_bins():
    """Negatives spread across the three IoU bins instead of collapsing
    onto the easy (IoU ~ 0) mass (iou_balanced_neg_sampler.py:46-87)."""
    rng = np.random.RandomState(2)
    assigned = np.zeros(600, np.int32)
    assigned[0] = 1                               # one positive, IoU 0.9
    max_ov = np.zeros(600)
    max_ov[0] = 0.9
    # 500 trivial negatives in bin 0, 50 in bin 1, 50 in bin 2
    max_ov[1:501] = rng.uniform(0.0, 0.29, 500)
    max_ov[501:551] = rng.uniform(0.31, 0.59, 50)
    max_ov[551:] = rng.uniform(0.61, 0.89, 49)
    s = _sample(assigned, max_ov, num=31, pos_fraction=0.04, num_gt=8)
    sel = np.asarray(s.inds)[np.asarray(s.valid) & ~np.asarray(s.is_pos)]
    bins = np.digitize(max_ov[sel], [0.3, 0.6])
    # expected 10 per bin (30 // 3); a uniform sampler would put ~25 in bin 0
    assert (np.bincount(bins, minlength=3) == 10).all()


def test_libra_sampler_take_all_when_underfull():
    assigned = np.zeros(50, np.int32)
    assigned[:3] = 1
    s = _sample(assigned, np.zeros(50), num=64, pos_fraction=0.25)
    v = np.asarray(s.valid)
    assert v.sum() == 50                          # everything sampled
    assert np.asarray(s.is_pos).sum() == 3


# --------------------------------------------------------------------------
# BFP (adaptive max pool + non-local refine)
# --------------------------------------------------------------------------


def test_adaptive_max_pool_matches_torch():
    import torch
    import torch.nn.functional as F

    from aod_meh_hua_tpu.models.fpn import adaptive_max_pool

    rng = np.random.RandomState(3)
    for in_hw, out_hw in [((16, 32), (4, 8)), ((17, 23), (5, 7)),
                          ((8, 8), (3, 3)), ((5, 9), (5, 9))]:
        x = rng.randn(2, *in_hw, 6).astype(np.float32)
        got = np.asarray(adaptive_max_pool(jnp.asarray(x), out_hw))
        want = F.adaptive_max_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), out_hw
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_bfp_shapes_and_refine_params():
    from aod_meh_hua_tpu.models.fpn import BFP

    sizes = [(16, 32), (8, 16), (4, 8), (2, 4), (1, 2)]
    xs = [jnp.asarray(np.random.RandomState(i).randn(2, h, w, 16), jnp.float32)
          for i, (h, w) in enumerate(sizes)]
    bfp = BFP(refine_level=2)
    variables = bfp.init(jax.random.PRNGKey(0), xs)
    outs = bfp.apply(variables, xs)
    assert [o.shape for o in outs] == [x.shape for x in xs]
    assert set(variables["params"]["refine"]) == {"g", "theta", "phi",
                                                  "conv_out"}
    # residual design: zero refine output would leave inputs + mean residual
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


# --------------------------------------------------------------------------
# end-to-end learnability
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def libra_setup():
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.two_stage import (
        make_faster_rcnn_eval_step,
        make_faster_rcnn_train_step,
    )
    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_libra_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_faster_rcnn_train_step(model, cfg, tx)
    eval_step = make_faster_rcnn_eval_step(model, cfg)

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
    return cfg, model, state, train_step, eval_step, batch


def test_libra_model_has_bfp_params(libra_setup):
    _, _, state, _, _, _ = libra_setup
    assert "bfp" in state.params
    assert "refine" in state.params["bfp"]


def test_libra_overfits_and_detects(libra_setup):
    cfg, model, state, train_step, eval_step, batch = libra_setup
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(120):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    from aod_meh_hua_tpu.engine import EvalBatch

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step(variables, eb)
    boxes = np.asarray(dets.boxes)
    labels = np.asarray(dets.labels)
    scores = np.asarray(dets.scores)
    valid = np.asarray(dets.valid)
    for i, (gt, lab) in enumerate([(batch.gt_boxes[0, 0], 2),
                                   (batch.gt_boxes[1, 0], 4)]):
        m = valid[i] & (scores[i] > 0.3)
        assert m.any(), f"image {i}: no confident detection"
        top = np.argmax(np.where(m, scores[i], -1))
        assert labels[i][top] == lab
        bx = boxes[i][top]
        x1 = max(bx[0], gt[0]); y1 = max(bx[1], gt[1])
        x2 = min(bx[2], gt[2]); y2 = min(bx[3], gt[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        union = ((bx[2] - bx[0]) * (bx[3] - bx[1])
                 + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
        assert inter / union > 0.5, f"image {i}: IoU {inter / union}"
