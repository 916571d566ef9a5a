"""ResNeXt / Res2Net / RegNet backbones.

Reference: /root/reference/mmdet/models/backbones/{resnext,res2net,
regnet}.py + configs/{resnext via faster_rcnn_x101,res2net,regnet}/."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.models.backbones import (REGNET_ARCHS, RegNet, Res2Net,
                                              ResNeXt, regnet_stages)


def test_regnet_schedule_matches_reference_arithmetic():
    """regnet.py:251-341 on the 3.2GF arch: 25 blocks over 4 stages."""
    widths, blocks, groups = regnet_stages(REGNET_ARCHS["regnetx_3.2gf"])
    assert len(widths) == len(blocks) == len(groups) == 4
    assert sum(blocks) == 25
    # widths are multiples of their group width and nondecreasing
    for w, g in zip(widths, groups):
        assert w % g == 0
    assert widths == sorted(widths)


def test_backbone_output_strides_and_widths():
    x = jnp.zeros((1, 64, 64, 3))
    nxt = ResNeXt(block_counts=(1, 1, 1, 1), stem_width=8, groups=4,
                  base_width=4)
    v = nxt.init(jax.random.PRNGKey(0), x)
    outs = nxt.apply(v, x)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    # grouped conv2 kernel: [3, 3, width/groups, width]
    k = v["params"]["layer2_0"]["conv2"]["kernel"]
    assert k.shape[2] * 4 == k.shape[3]

    r2 = Res2Net(block_counts=(1, 1, 1, 1), stem_width=8, scales=4,
                 base_width=26)
    v = r2.init(jax.random.PRNGKey(0), x)
    outs = r2.apply(v, x)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert "conv2_0" in v["params"]["layer1_0"]
    assert "conv2_3" not in v["params"]["layer1_0"]  # scales-1 convs

    rg = RegNet(arch="regnetx_400mf")
    v = rg.init(jax.random.PRNGKey(0), x)
    outs = rg.apply(v, x)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    widths, _, _ = regnet_stages(REGNET_ARCHS["regnetx_400mf"])
    assert [o.shape[-1] for o in outs] == widths


def test_res2net_hierarchy_is_scalewise():
    """Zeroing split j's conv must not affect splits < j (the running
    sum flows forward only)."""
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 8),
                    jnp.float32)
    m = Res2Net(block_counts=(1,), stem_width=8, scales=4, base_width=26)
    # single stage: output is layer1 only
    v = m.init(jax.random.PRNGKey(0), x)
    base = m.apply(v, x)[0]
    v2 = jax.tree_util.tree_map(lambda a: a, v)
    v2["params"]["layer1_0"]["conv2_2"]["kernel"] = (
        v["params"]["layer1_0"]["conv2_2"]["kernel"] * 0.0)
    out = m.apply(v2, x)[0]
    assert not np.allclose(np.asarray(base), np.asarray(out))


@pytest.mark.parametrize("backbone_type,extra", [
    ("resnext", dict(resnext_groups=4)),
    ("res2net", dict()),
    ("regnet", dict(regnet_arch="regnetx_400mf")),
])
def test_faster_rcnn_trains_with_backbone(backbone_type, extra):
    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.two_stage import make_faster_rcnn_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.utils.config import (TrainConfig,
                                              tiny_faster_rcnn_config)

    cfg = tiny_faster_rcnn_config(backbone_type=backbone_type, **extra)
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(lr=0.02, batch_size=2, grad_clip=10.0)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    step = make_faster_rcnn_train_step(model, cfg, tx)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 10:34, 20:44] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [20, 10, 44, 34]
    labels[0, 0] = 2
    gt_valid = np.zeros((2, g), bool)
    gt_valid[0, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(25):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
