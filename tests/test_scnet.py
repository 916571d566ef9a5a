"""SCNet: feature relay, global context fusion, single post-cascade
mask head (parity targets: mmdet/models/roi_heads/scnet_roi_head.py,
bbox_heads/scnet_bbox_head.py, mask_heads/{scnet_mask_head,
global_context_head,feature_relay_head}.py, configs/scnet/* — cited in
models/scnet.py, engine/scnet.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_scnet_config


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


def test_scnet_structure():
    """One mask head (not per-stage), plus glbctx + relay heads; the
    bbox heads return the relayable shared fc feature."""
    from aod_meh_hua_tpu.api import init_detector

    cfg = tiny_scnet_config()
    model, variables = init_detector(cfg, seed=0)
    p = variables["params"]
    assert "mask_head" in p and "mask_head_0" not in p
    assert "glbctx_head" in p and "relay_head" in p
    for i in range(cfg.num_stages):
        assert f"bbox_head_{i}" in p
    # relay fc maps shared fc width -> roi_size^2 * fpn_channels
    fc = p["relay_head"]["fc"]["kernel"]
    assert fc.shape == (cfg.rcnn.fc_channels,
                        cfg.rcnn.roi_size ** 2 * cfg.fpn_channels)

    x = jnp.zeros((3, cfg.rcnn.roi_size, cfg.rcnn.roi_size,
                   cfg.fpn_channels), jnp.float32)
    cls, reg, shared = model.apply(variables, x, 0,
                                   method=lambda m, f, s: m.roi_forward(f, s))
    assert shared.shape == (3, cfg.rcnn.fc_channels)
    assert reg.shape == (3, 1, 4)  # reg_class_agnostic


def test_glbctx_loss_is_multihot_bce():
    from aod_meh_hua_tpu.engine.scnet import _glbctx_loss

    logits = jnp.asarray([[10.0, -10.0, -10.0]])
    labels = jnp.asarray([[0, 0]])
    valid = jnp.asarray([[True, False]])
    # target = [1, 0, 0]; perfectly predicted -> ~0 loss
    l = _glbctx_loss(logits, labels, valid, 3, 1.0)
    assert float(l) < 1e-3
    # wrong prediction on class 1 -> large loss
    l2 = _glbctx_loss(jnp.asarray([[10.0, 10.0, -10.0]]), labels, valid,
                      3, 1.0)
    assert float(l2) > 1.0


def test_scnet_trains_and_predicts_masks():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import EvalBatch, create_train_state
    from aod_meh_hua_tpu.engine.scnet import make_scnet_train_step

    cfg = tiny_scnet_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    step = make_scnet_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    rng = np.random.RandomState(0)
    batch = _mk_batch(cfg, rng)
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(13)
    losses, glb = [], []
    for _ in range(80):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
        losses.append(float(aux["loss"]))
        glb.append(float(aux["loss_glbctx"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])
    assert glb[-1] < glb[0]  # global context branch learns

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
        assert masks[i, top].mean() > 0.5
