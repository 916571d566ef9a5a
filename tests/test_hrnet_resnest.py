"""HRNet and ResNeSt backbone families (parity targets:
mmdet/models/backbones/hrnet.py, necks/hrfpn.py, backbones/resnest.py,
configs/hrnet/*, configs/resnest/* — cited in models/hrnet.py,
models/resnest.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import (TrainConfig, tiny_hrnet_config,
                                          tiny_resnest_config)


def test_hrnet_branch_shapes():
    """4 parallel branches at strides 4/8/16/32 with widths w..8w, and
    HRFPN emits the 5-level stride-4..64 pyramid."""
    from aod_meh_hua_tpu.models.hrnet import HRFPN, HRNet

    w = 4
    net = HRNet(width=w, stage_modules=(1, 1, 1), num_blocks=1,
                stage1_blocks=1, stem_width=8)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 32, w), (1, 8, 16, 2 * w), (1, 4, 8, 4 * w),
        (1, 2, 4, 8 * w)]

    neck = HRFPN(out_channels=16, num_outs=5)
    nv = neck.init(jax.random.PRNGKey(1), outs)
    feats = neck.apply(nv, outs)
    assert [f.shape for f in feats] == [
        (1, 16, 32, 16), (1, 8, 16, 16), (1, 4, 8, 16), (1, 2, 4, 16),
        (1, 1, 2, 16)]


def test_resnest_split_attention_sums_to_one():
    """The radix softmax weights each channel's radix splits to sum 1:
    with identical splits the output equals either split exactly."""
    from aod_meh_hua_tpu.models.resnest import SplitAttentionConv

    mod = SplitAttentionConv(channels=8, radix=2)
    xh = np.random.RandomState(0).randn(2, 6, 6, 4).astype(np.float32)
    # identical per-group inputs (grouped conv: split r reads slice r)
    x = jnp.asarray(np.concatenate([xh, xh], axis=-1))
    variables = mod.init(jax.random.PRNGKey(0), x)
    # force both radix splits identical by duplicating group weights
    p = variables["params"]
    k = np.array(p["conv"]["kernel"])  # [3,3,in/groups,C*r] (writable copy)
    c = 8
    k[..., c:] = k[..., :c]
    p = jax.tree.map(np.asarray, p)
    p["conv"]["kernel"] = k
    variables = {"params": p, "batch_stats": variables["batch_stats"]}
    y = mod.apply(variables, x)
    # identical splits: softmax weights sum to 1 -> output == split value
    kern = jnp.asarray(k[..., :c])
    want = jax.lax.conv_general_dilated(
        jnp.asarray(xh), kern, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.maximum(np.asarray(want), 0),
                               rtol=1e-4, atol=1e-5)


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


def test_hrnet_overfits_and_detects():
    _overfit_and_check(tiny_hrnet_config())


def test_resnest_overfits_and_detects():
    _overfit_and_check(tiny_resnest_config())
