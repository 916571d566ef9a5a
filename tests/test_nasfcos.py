"""NAS-FCOS family (parity targets: mmdet/models/dense_heads/
nasfcos_head.py, necks/nasfcos_fpn.py, configs/nas_fcos/* — cited in
models/nasfcos.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_nasfcos_config


def test_nasfcos_fpn_shapes_and_dag():
    """The searched FPN emits the 5-level stride-8..128 pyramid and the
    cell DAG consumes exactly the c22/c32/c02/c42/c36/c61 wiring."""
    from aod_meh_hua_tpu.models.nasfcos import NASFCOSFPN

    neck = NASFCOSFPN(out_channels=16, num_outs=5)
    inputs = tuple(jnp.zeros((1, 64 // s, 128 // s, c), jnp.float32)
                   for s, c in ((4, 8), (8, 16), (16, 32), (32, 64)))
    variables = neck.init(jax.random.PRNGKey(0), inputs)
    outs = neck.apply(variables, inputs)
    assert [o.shape for o in outs] == [
        (1, 8, 16, 16), (1, 4, 8, 16), (1, 2, 4, 16), (1, 1, 2, 16),
        (1, 1, 1, 16)]
    p = variables["params"]
    for cell in ("c22_1", "c22_2", "c32", "c02", "c42", "c36", "c61"):
        assert cell in p, cell
    # one-input cells skip the second input conv
    assert "in2_dcn" not in p["c32"] and "in2_dcn" in p["c22_1"]


def test_nasfcos_overfits_and_detects():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.batch import EvalBatch
    from aod_meh_hua_tpu.engine.fcos import make_fcos_train_step
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps

    cfg = tiny_nasfcos_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_fcos_train_step(model, cfg, tx)
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
    av = np.ones((2, 1), bool)  # anchor-free: anchors unused
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)

    state = jax.tree.map(jnp.array, state)
    for _ in range(250):
        state, aux = train_step(state, batch)
    assert np.isfinite(float(aux["loss"]))

    eb = EvalBatch(images, shapes, np.ones((2, 4), np.float32),
                   np.ones(2, bool))
    r = eval_step({"params": state.params,
                   "batch_stats": state.batch_stats}, eb)
    for i in range(2):
        ok = np.asarray(r.valid[i]) & (np.asarray(r.scores[i]) > 0.25)
        assert ok.any(), f"img {i}: no confident detections"
        det = np.asarray(r.boxes[i])[ok]
        lab = np.asarray(r.labels[i])[ok]
        best = np.asarray(bbox_overlaps(
            jnp.asarray(boxes[i][:1]), jnp.asarray(det)))[0]
        j = best.argmax()
        assert best[j] > 0.5, f"img {i}: best IoU {best[j]}"
        assert lab[j] == labels[i, 0]
