"""PAFPN: neck structure and the pafpn Faster R-CNN family.

Reference: /root/reference/mmdet/models/necks/pafpn.py +
configs/pafpn/faster_rcnn_r50_pafpn_1x_coco.py."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import tiny_pafpn_config


def test_pafpn_shapes_and_params():
    from aod_meh_hua_tpu.models.fpn import PAFPN

    sizes = [(16, 32), (8, 16), (4, 8), (2, 4)]
    xs = [jnp.asarray(np.random.RandomState(i).randn(2, h, w, 8 * (i + 1)),
                      jnp.float32) for i, (h, w) in enumerate(sizes)]
    neck = PAFPN(out_channels=16, start_level=0, num_outs=5)
    variables = neck.init(jax.random.PRNGKey(0), xs)
    outs = neck.apply(variables, xs)
    assert len(outs) == 5
    assert [o.shape[1:3] for o in outs[:4]] == sizes
    assert outs[4].shape[1:3] == (1, 2)  # maxpool extra
    p = variables["params"]
    # bottom-up downsample convs + pafpn convs exist (pafpn.py:72-96)
    assert "downsample_0" in p and "pafpn_0" in p and "lateral_0" in p


def test_pafpn_family_trains_and_evals():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, EvalBatch, create_train_state
    from aod_meh_hua_tpu.engine.two_stage import make_faster_rcnn_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import TrainConfig

    cfg = tiny_pafpn_config()
    model, variables = init_detector(cfg, seed=0)
    assert "downsample_0" in variables["params"]["neck"]
    tcfg = TrainConfig(lr=0.02, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_faster_rcnn_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

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

    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(40):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step(variables, eb)
    assert np.asarray(dets.boxes).shape[0] == 2
