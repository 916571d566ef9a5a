"""NAS-FPN merge cells and CARAFE upsampling.

Reference: /root/reference/mmdet/models/necks/{nas_fpn,fpn_carafe}.py +
the mmcv merge_cells / CARAFE ops."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.models.fpn import CARAFE, NASFPN, carafe_upsample


def _np_carafe(x, masks, k, scale):
    """Naive transcription of the CARAFE reassembly kernel: output pixel
    (i, j) = sum over the k x k neighborhood of source pixel
    (i//scale, j//scale), weighted by its softmaxed mask."""
    b, h, w, c = x.shape
    oh, ow = h * scale, w * scale
    r = k // 2
    out = np.zeros((b, oh, ow, c), np.float32)
    for bi in range(b):
        for i in range(oh):
            for j in range(ow):
                si, sj = i // scale, j // scale
                for di in range(-r, r + 1):
                    for dj in range(-r, r + 1):
                        y, xx = si + di, sj + dj
                        if 0 <= y < h and 0 <= xx < w:
                            wgt = masks[bi, i, j, (di + r) * k + (dj + r)]
                            out[bi, i, j] += x[bi, y, xx] * wgt
    return out


def test_carafe_upsample_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 5, 3).astype(np.float32)
    m = rng.rand(2, 8, 10, 25).astype(np.float32)
    m = m / m.sum(-1, keepdims=True)
    got = np.asarray(carafe_upsample(jnp.asarray(x), jnp.asarray(m), 5, 2))
    want = _np_carafe(x, m, 5, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_carafe_module_preserves_mass_for_uniform_mask():
    """With the content encoder zeroed, masks are uniform -> CARAFE is a
    neighborhood box filter; the output is finite and shaped [2H, 2W]."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 8, 4).astype(np.float32))
    mod = CARAFE()
    v = mod.init(jax.random.PRNGKey(0), x)
    v2 = jax.tree_util.tree_map(lambda a: a, v)
    v2["params"]["content_encoder"]["kernel"] = (
        v["params"]["content_encoder"]["kernel"] * 0)
    v2["params"]["content_encoder"]["bias"] = (
        v["params"]["content_encoder"]["bias"] * 0)
    y = mod.apply(v2, x)
    assert y.shape == (1, 12, 16, 4)
    # interior pixels: uniform 5x5 average of the source neighborhood
    want = np.asarray(x)
    got = np.asarray(y)
    i, j = 6, 8  # maps to source (3, 4), fully interior
    avg = want[0, 1:6, 2:7].mean(axis=(0, 1))
    np.testing.assert_allclose(got[0, i, j], avg, rtol=1e-4, atol=1e-5)


def test_nasfpn_shapes_and_stacking():
    rng = np.random.RandomState(2)
    feats = [jnp.asarray(rng.randn(1, s, 2 * s, 8).astype(np.float32))
             for s in (16, 8, 4, 2)]
    m = NASFPN(out_channels=16, stack_times=2, start_level=1, num_outs=5)
    v = m.init(jax.random.PRNGKey(0), feats)
    outs = m.apply(v, feats)
    assert [o.shape[1] for o in outs] == [8, 4, 2, 1, 1]
    assert all(o.shape[-1] == 16 for o in outs)
    # both stacked stages own parameters
    assert "stage0_sum_44_4" in v["params"]
    assert "stage1_sum_44_4" in v["params"]


def test_nasfpn_retina_and_carafe_rcnn_train():
    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.retina_zoo import \
        make_vanilla_retina_train_step
    from aod_meh_hua_tpu.engine.two_stage import make_faster_rcnn_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import (TrainConfig, tiny_carafe_config,
                                              tiny_nasfpn_config)

    rng = np.random.RandomState(0)

    def mk_batch(cfg):
        h, w = cfg.canvas
        g = cfg.max_gt
        images = np.full((2, h, w, 3), 0.1, np.float32)
        boxes = np.zeros((2, g, 4), np.float32)
        labels = np.zeros((2, g), np.int32)
        images[0, 10:34, 20:44] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
        boxes[0, 0] = [20, 10, 44, 34]
        labels[0, 0] = 2
        gt_valid = np.zeros((2, g), bool)
        gt_valid[0, 0] = True
        shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
        av = anchor_valid_flags(cfg.build_anchor_generator(),
                                cfg.featmap_sizes(), shapes)
        return Batch(images, boxes, labels, gt_valid, av, shapes)

    cfg = tiny_nasfpn_config()
    model, variables = init_detector(cfg, seed=0)
    assert "stage1_sum_44_4" in variables["params"]["neck"]
    state, tx = create_train_state(
        model, variables, TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0),
        frozen_stages=0)
    step = make_vanilla_retina_train_step(model, cfg, tx)
    batch = mk_batch(cfg)
    state = jax.tree.map(jnp.array, state)
    losses = []
    for _ in range(25):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    cfg = tiny_carafe_config()
    model, variables = init_detector(cfg, seed=0)
    assert "carafe_1" in variables["params"]["neck"]
    state, tx = create_train_state(
        model, variables, TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0),
        frozen_stages=0)
    step = make_faster_rcnn_train_step(model, cfg, tx)
    batch = mk_batch(cfg)
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(25):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
