"""Cascade RPN family — region assigner, anchor-offset geometry, and the
two-stage refinement loop (parity targets:
mmdet/models/dense_heads/cascade_rpn_head.py,
core/bbox/assigners/region_assigner.py,
configs/cascade_rpn/crpn_r50_caffe_fpn_1x_coco.py — cited in
models/cascade_rpn.py, engine/cascade_rpn.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_cascade_rpn_config


def _region_assign_reference(anchors_lvl, featmap_sizes, strides, gt_boxes,
                             anchor_scale, center_ratio=0.2,
                             ignore_ratio=0.5):
    """Numpy transcription of region_assigner.py:57 (sequential gt loop,
    calc_region rounding/clamping, adjacent-level ignores applied last)."""
    num_lvls = len(anchors_lvl)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = np.sqrt((gt_boxes[:, 2] - gt_boxes[:, 0])
                    * (gt_boxes[:, 3] - gt_boxes[:, 1]))
    min_sz = anchor_scale * strides[0]
    tgt = np.clip(np.floor(np.log2(scale) - np.log2(min_sz) + 0.5),
                  0, num_lvls - 1).astype(int)

    def region(bbox, ratio, stride, fs):
        fb = bbox / stride
        x1 = np.round((1 - ratio) * fb[0] + ratio * fb[2])
        y1 = np.round((1 - ratio) * fb[1] + ratio * fb[3])
        x2 = np.round(ratio * fb[0] + (1 - ratio) * fb[2])
        y2 = np.round(ratio * fb[1] + (1 - ratio) * fb[3])
        return (np.clip(x1, 0, fs[1]), np.clip(y1, 0, fs[0]),
                np.clip(x2, 0, fs[1]), np.clip(y2, 0, fs[0]))

    def inside(anchors, stride, reg):
        x1, y1, x2, y2 = reg
        fa = anchors / stride
        x = (fa[:, 0] + fa[:, 2]) * 0.5
        y = (fa[:, 1] + fa[:, 3]) * 0.5
        return (x >= x1) & (x <= x2) & (y >= y1) & (y <= y2)

    assigned = [np.zeros(len(a), np.int64) for a in anchors_lvl]
    ign_flags = [np.zeros(len(a), bool) for a in anchors_lvl]
    for g, gt in enumerate(gt_boxes):
        lvl = tgt[g]
        st, fs = strides[lvl], featmap_sizes[lvl]
        ign = inside(anchors_lvl[lvl], st, region(gt, r2, st, fs))
        assigned[lvl][ign] = -1
        pos = inside(anchors_lvl[lvl], st, region(gt, r1, st, fs))
        assigned[lvl][pos] = g + 1
        for d in (lvl - 1, lvl + 1):
            if 0 <= d < num_lvls:
                ign = inside(anchors_lvl[d], strides[d],
                             region(gt, r2, strides[d], featmap_sizes[d]))
                ign_flags[d][ign] = True
    for lvl in range(num_lvls):
        assigned[lvl][ign_flags[lvl]] = -1
    return np.concatenate(assigned)


def test_region_assign_matches_reference_transcription():
    from aod_meh_hua_tpu.engine.cascade_rpn import _anchor_tables
    from aod_meh_hua_tpu.ops import region_assign

    cfg = tiny_cascade_rpn_config()
    gen = cfg.build_anchor_generator()
    sizes = cfg.featmap_sizes()
    anchors_lvl = [np.asarray(a) for a in gen.grid_anchors(sizes)]
    anchors, lvl_ids, strides_pa, feat_wh = _anchor_tables(cfg)

    rng = np.random.RandomState(7)
    for trial in range(8):
        g = rng.randint(1, 6)
        x1 = rng.uniform(0, 90, g)
        y1 = rng.uniform(0, 40, g)
        w = rng.uniform(4, 120, g)
        h = rng.uniform(4, 60, g)
        gts = np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)
        want = _region_assign_reference(
            anchors_lvl, sizes, cfg.rpn.anchor_strides, gts,
            cfg.rpn.anchor_scale)

        pad = np.zeros((cfg.max_gt, 4), np.float32)
        pad[:g] = gts
        gv = np.zeros(cfg.max_gt, bool)
        gv[:g] = True
        got = region_assign(
            jnp.asarray(anchors), jnp.asarray(pad), jnp.asarray(gv),
            jnp.ones(len(anchors), bool), jnp.asarray(lvl_ids),
            jnp.asarray(strides_pa), jnp.asarray(feat_wh),
            float(cfg.rpn.anchor_scale), float(cfg.rpn.anchor_strides[0]),
            len(sizes))
        np.testing.assert_array_equal(np.asarray(got), want,
                                      err_msg=f"trial {trial}")


def test_anchor_offsets_geometry():
    """Offsets place tap k exactly at anchor_center + tap*(extent/2)
    in feature units (anchor_offset semantics, ks=3, dilation=1)."""
    from aod_meh_hua_tpu.engine.cascade_rpn import _TAPS, anchor_offsets

    h, w, stride = 4, 6, 8.0
    # one anchor per cell, each a 32x16 box centered off-grid
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    cx = (gx + 0.37) * stride
    cy = (gy - 0.21) * stride
    anchors = np.stack([cx - 16, cy - 8, cx + 16, cy + 8],
                       axis=-1).reshape(1, -1, 4).astype(np.float32)
    (off,) = anchor_offsets(jnp.asarray(anchors), [(0, h * w)], [(h, w)],
                            [stride])
    off = np.asarray(off).reshape(h, w, 9, 2)
    for k in range(9):
        ty, tx = _TAPS[k]
        # sampled position = grid + base_tap + offset
        got_y = gy + ty + off[..., k, 0]
        got_x = gx + tx + off[..., k, 1]
        want_y = cy / stride + ty * (16.0 / stride / 2.0)
        want_x = cx / stride + tx * (32.0 / stride / 2.0)
        np.testing.assert_allclose(got_y, want_y, atol=1e-5)
        np.testing.assert_allclose(got_x, want_x, atol=1e-5)


def test_cascade_rpn_trains_and_recalls():
    """A few hundred steps on a two-object batch: proposals cover both
    gts (AR == 1) and stage-1 refinement produces tighter boxes than the
    static anchors could."""
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.engine.cascade_rpn import make_crpn_train_step
    from aod_meh_hua_tpu.engine.rpn_only import proposal_recall
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_cascade_rpn_config()
    model, variables = init_detector(cfg, seed=0)
    # lr gentler than the other families' overfit tests: the linear IoU
    # loss saturates (zero gradient) if stage 0 overshoots into
    # non-overlap before converging — the reference avoids this with a
    # 500-iter warmup at batch 16 (crpn base schedule)
    tcfg = TrainConfig(lr=0.005, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_crpn_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    rng = np.random.RandomState(0)
    h, w = cfg.canvas
    g = cfg.max_gt
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:40, 8:40] = rng.randn(32, 32, 3).astype(np.float32) + 2.5
    boxes[0, 0] = [8, 8, 40, 40]
    images[1, 24:56, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.5
    boxes[1, 0] = [60, 24, 92, 56]
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
    assert (np.asarray(r.labels) == 0).all()
    ar = proposal_recall(np.asarray(r.boxes), np.asarray(r.valid),
                         [boxes[0][:1], boxes[1][:1]], iou_thr=0.5)
    assert ar == 1.0, ar
