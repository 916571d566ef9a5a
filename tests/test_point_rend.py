"""PointRend family: SimpleRoIAlign + point-sample semantics,
importance point sampling, and subdivision-refined mask learnability
(parity targets: roi_heads/point_rend_roi_head.py,
mask_heads/{coarse_mask_head,mask_point_head}.py — cited in
models/point_rend.py, engine/point_rend.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from aod_meh_hua_tpu.engine.point_rend import (_sample_coarse,
                                               _sample_gt_raster,
                                               simple_roi_align)
from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_point_rend_config


def test_simple_roi_align_constant_and_gradient():
    """A constant map samples constant; a horizontal-ramp map samples
    the roi's x centers (point_sample center convention: pixel =
    canvas / stride - 0.5)."""
    h, w, stride = 16, 32, 4
    ramp = np.broadcast_to(np.arange(w, dtype=np.float32)[None, :, None],
                           (h, w, 1)).copy()
    rois = jnp.asarray([[16.0, 16.0, 48.0, 48.0]])  # feat x 4..12, y 4..12
    out = np.asarray(simple_roi_align(jnp.asarray(ramp), rois, 4, stride))
    assert out.shape == (1, 4, 4, 1)
    # x canvas centers: 16 + (j+.5)/4*32 = 20,28,36,44 -> feat 4.5,6.5,...
    want = np.array([16 + (j + 0.5) / 4 * 32 for j in range(4)]) / 4 - 0.5
    np.testing.assert_allclose(out[0, 2, :, 0], want, atol=1e-5)
    const = jnp.full((h, w, 3), 7.0)
    outc = np.asarray(simple_roi_align(const, rois, 4, stride))
    np.testing.assert_allclose(outc, 7.0, atol=1e-5)


def test_sample_coarse_matches_grid_centers():
    """Sampling a map at its own cell centers returns the map values
    (point_sample: pixel = p * size - 0.5 is exact at centers)."""
    m = np.random.RandomState(0).randn(2, 4, 6, 3).astype(np.float32)
    u = (np.arange(6, dtype=np.float32) + 0.5) / 6
    v = (np.arange(4, dtype=np.float32) + 0.5) / 4
    gx, gy = np.meshgrid(u, v)
    pts = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    pts = np.broadcast_to(pts[None], (2, 24, 2)).copy()
    out = np.asarray(_sample_coarse(jnp.asarray(m), jnp.asarray(pts)))
    np.testing.assert_allclose(out.reshape(2, 4, 6, 3), m, atol=1e-5)


def test_sample_gt_raster_halves():
    """Points in the left half of a roi covering a left-half gt mask
    sample 1.0; right-half points sample 0.0."""
    r = 28
    raster = np.zeros((2, r, r), np.float32)
    raster[0, :, : r // 2] = 1.0
    gt_boxes = np.array([[8.0, 8.0, 40.0, 40.0], [0, 0, 1, 1]], np.float32)
    rois = np.array([[8.0, 8.0, 40.0, 40.0]], np.float32)
    pts = np.array([[[0.2, 0.5], [0.8, 0.5], [0.25, 0.1]]], np.float32)
    out = np.asarray(_sample_gt_raster(
        jnp.asarray(gt_boxes), jnp.asarray(raster),
        jnp.zeros((1,), jnp.int32), jnp.asarray(rois), jnp.asarray(pts)))
    assert out.shape == (1, 3)
    assert out[0, 0] > 0.9 and out[0, 2] > 0.9
    assert out[0, 1] < 0.1


@pytest.fixture(scope="module")
def pr_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import create_train_state
    from aod_meh_hua_tpu.engine.mask_rcnn import MaskBatch, rasterize_gt_masks
    from aod_meh_hua_tpu.engine.point_rend import make_point_rend_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_point_rend_config()
    model, variables = init_detector(cfg, seed=0)
    assert "coarse_head" in variables["params"]
    assert "point_head" in variables["params"]
    tcfg = TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_point_rend_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:40, 8:24] = rng.randn(32, 16, 3).astype(np.float32) + 2.5
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
    rasters = np.stack([
        rasterize_gt_masks([[[8, 8, 24, 8, 24, 40, 8, 40]]], boxes[0], g,
                           cfg.gt_mask_raster),
        rasterize_gt_masks([[]], boxes[1], g, cfg.gt_mask_raster),
    ])
    batch = MaskBatch(images, boxes, labels, gt_valid, av, shapes, rasters)
    return cfg, state, train_step, eval_step, batch


def test_point_rend_train_step_finite_and_updates(pr_setup):
    cfg, state, train_step, eval_step, batch = pr_setup
    own = jax.tree.map(jnp.array, state)
    state1, aux = train_step(own, batch, jax.random.PRNGKey(0))
    for k in ("loss", "loss_rpn_cls", "loss_cls", "loss_bbox", "loss_mask",
              "loss_point"):
        assert np.isfinite(float(aux[k])), k
    for name in ("coarse_head", "point_head"):
        before = jax.tree.leaves(state.params[name])[0]
        after = jax.tree.leaves(state1.params[name])[0]
        assert not np.allclose(np.asarray(before), np.asarray(after)), name


def test_point_rend_overfits_and_refines(pr_setup):
    """300 SGD steps: boxes recovered; the subdivision-refined mask
    (7 -> 28 with 2 steps in the tiny config) matches the gt shape —
    left-half for object 0, full-box for object 1."""
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg, state, train_step, eval_step, batch = pr_setup
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(0)
    for _ in range(300):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
    assert np.isfinite(float(aux["loss"]))

    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, eb)
    bx, sc = np.asarray(dets.boxes), np.asarray(dets.scores)
    lb, mk = np.asarray(dets.labels), np.asarray(dets.masks)
    # refined resolution: mask_size * scale^steps = 7 * 4 = 28
    assert mk.shape[2:] == (28, 28)
    gts = [([8, 8, 40, 40], 1), ([60, 24, 92, 56], 3)]
    for b, (gt, lab) in enumerate(gts):
        i = sc[b].argmax()
        iou = np.asarray(bbox_overlaps(jnp.asarray([gt], jnp.float32),
                                       jnp.asarray(bx[b, i:i + 1])))[0, 0]
        assert iou > 0.5, (b, bx[b, i], iou)
        assert lb[b, i] == lab
    i0 = sc[0].argmax()
    m0 = mk[0, i0]
    s = m0.shape[0]
    assert m0[:, : s // 3].mean() > 0.6, m0[:, : s // 3].mean()
    assert m0[:, -s // 3:].mean() < 0.4, m0[:, -s // 3:].mean()
    i1 = sc[1].argmax()
    assert mk[1, i1].mean() > 0.6
