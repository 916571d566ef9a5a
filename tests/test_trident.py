"""TridentNet family — weight-shared multi-dilation branches, C4 RoI
head (parity targets: mmdet/models/backbones/trident_resnet.py,
detectors/trident_faster_rcnn.py, configs/tridentnet/* — cited in
models/trident.py, engine/trident.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_trident_config


def test_single_branch_equals_training_branch():
    """Eval's single-branch C4 features ARE branch test_branch_idx of
    the training forward: same shared kernels, dilation 2, frozen BN —
    the branch-folded trick must be exact."""
    from aod_meh_hua_tpu.api import init_detector

    cfg = tiny_trident_config()
    model, variables = init_detector(cfg, seed=0)
    rng = np.random.RandomState(3)
    images = rng.randn(2, cfg.canvas[0], cfg.canvas[1], 3).astype(np.float32)

    multi = model.apply(variables, jnp.asarray(images),
                        method=lambda m, im: m.features(im))
    single = model.apply(
        variables, jnp.asarray(images),
        method=lambda m, im: m.features(im, single_branch=True))
    r = len(cfg.trident_dilations)
    assert multi.shape[0] == r * 2
    b_idx = cfg.test_branch_idx
    np.testing.assert_allclose(np.asarray(multi[b_idx * 2:(b_idx + 1) * 2]),
                               np.asarray(single), rtol=2e-5, atol=2e-5)
    # branches genuinely differ (different dilations, same weights)
    assert not np.allclose(np.asarray(multi[:2]), np.asarray(single))


def test_trident_conv_shares_one_kernel():
    """The trident stage has exactly ONE conv2 kernel per block (shared
    across the 3 dilation branches), not three."""
    from aod_meh_hua_tpu.api import init_detector

    cfg = tiny_trident_config()
    _, variables = init_detector(cfg, seed=0)
    blk = variables["params"]["backbone"]["layer3_0"]
    assert "conv2" in blk and set(blk["conv2"]) == {"kernel"}
    assert blk["conv2"]["kernel"].shape == (3, 3, cfg.stem_width * 4,
                                            cfg.stem_width * 4)


def test_trident_overfits_and_detects():
    """A few hundred steps on a two-object batch: eval detections
    recover both boxes with the right labels."""
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.engine.trident import make_trident_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg = tiny_trident_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_trident_train_step(model, cfg, tx)
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
    for _ in range(300):
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
