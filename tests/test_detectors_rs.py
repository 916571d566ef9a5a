"""DetectoRS family — SAC backbone + Recursive Feature Pyramid on
Cascade R-CNN (parity targets: mmdet/models/backbones/
detectors_resnet.py, necks/rfp.py, configs/detectors/* — cited in
models/detectors_rs.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_detectors_config


def test_sac_is_plain_conv_at_init():
    """switch inits to 1 and weight_diff/contexts to 0, so at init SAC
    == the dilation-1 conv of the AWS-standardized kernel (mmcv
    SAConv2d init semantics: the block starts as the pretrained conv)."""
    from aod_meh_hua_tpu.models.detectors_rs import SAConv3x3

    mod = SAConv3x3(features=8, stride=2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 12, 4).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(variables, x)

    k = variables["params"]["kernel"]
    mean = k.mean(axis=(0, 1, 2), keepdims=True)
    std = k.std(axis=(0, 1, 2), keepdims=True) + 1e-5
    w = (k - mean) / std
    want = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_rfp_fusion_is_half_half_at_init():
    """rfp_weight inits to 0 -> sigmoid gate 0.5: the fused pyramid is
    the mean of the two unroll outputs (rfp.py constant_init(0))."""
    from aod_meh_hua_tpu.api import init_detector

    cfg = tiny_detectors_config()
    model, variables = init_detector(cfg, seed=0)
    rng = np.random.RandomState(2)
    images = rng.randn(1, cfg.canvas[0], cfg.canvas[1], 3).astype(np.float32)

    feats = model.apply(variables, jnp.asarray(images),
                        method=lambda m, im: m.features(im))
    assert len(feats) == len(cfg.rpn.anchor_strides)

    def unrolls(m, im):
        x1 = m.neck(m.backbone(im))
        rfp_feats = (None,) + tuple(m.aspp(x1[i]) for i in (1, 2, 3))
        x2 = m.neck(m.rfp_backbone.rfp_call(im, rfp_feats))
        return x1, x2

    x1, x2 = model.apply(variables, jnp.asarray(images), method=unrolls)
    for f, a, b in zip(feats, x1, x2):
        np.testing.assert_allclose(np.asarray(f),
                                   0.5 * np.asarray(a) + 0.5 * np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_detectors_overfits_and_detects():
    """The cascade engine drives the SAC+RFP model unchanged: a few
    hundred steps on a two-object batch, eval recovers both boxes."""
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.engine.two_stage import make_cascade_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg = tiny_detectors_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_cascade_train_step(model, cfg, tx)
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
    images[1, 24:56, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.5
    boxes[1, 0] = [60, 24, 92, 56]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)

    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(0)
    for _ in range(200):
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
