"""Deformable conv backbone (DCN v1 / modulated v2).

Reference: /root/reference/mmdet/models/backbones/resnet.py:109-205 +
configs/dcn/*.py."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.models.deform import DeformableConv3x3
from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_faster_rcnn_config


def _plain_conv(x, kernel9):
    """lax 3x3 pad-1 conv with the deform layout kernel [9, Cin, Cout]."""
    k = kernel9.reshape(3, 3, *kernel9.shape[1:])
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_zero_offsets_equal_plain_conv():
    """conv_offset is zero-initialized, so at init the deformable conv
    IS the plain 3x3 conv (integer taps, exact bilinear weights)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 11, 5).astype(np.float32))
    for modulated in (False, True):
        m = DeformableConv3x3(7, modulated=modulated)
        variables = m.init(jax.random.PRNGKey(1), x)
        got = m.apply(variables, x)
        want = _plain_conv(x, variables["params"]["kernel"])
        if modulated:
            want = want * 0.5  # sigmoid(0) modulation
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_strided_deform_matches_strided_conv_at_init():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 12, 4).astype(np.float32))
    m = DeformableConv3x3(6, stride=2)
    variables = m.init(jax.random.PRNGKey(2), x)
    got = m.apply(variables, x)
    k = variables["params"]["kernel"].reshape(3, 3, 4, 6)
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.shape == want.shape == (1, 4, 6, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_offsets_shift_the_sampling():
    """A constant (0, +1) offset on every tap equals shifting the input
    one pixel left (interior rows, zero padding at the seam)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 10, 3).astype(np.float32))
    m = DeformableConv3x3(4)
    variables = m.init(jax.random.PRNGKey(3), x)
    # hand-craft the offset conv bias: dy=0, dx=1 for all taps
    bias = np.zeros(18, np.float32)
    bias[1::2] = 1.0
    v2 = jax.tree_util.tree_map(lambda a: a, variables)
    v2["params"]["conv_offset"]["bias"] = jnp.asarray(bias)
    got = m.apply(v2, x)
    shifted = jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    want = m.apply(variables, shifted)
    # column 0 differs by construction: the offset version's kx=0 tap
    # reads x[0] while the shifted conv reads its zero padding
    np.testing.assert_allclose(np.asarray(got[:, :, 1:]),
                               np.asarray(want[:, :, 1:]),
                               rtol=2e-4, atol=2e-4)


def test_context_block_identity_at_init_and_constant_offset():
    """GCNet ContextBlock: zero-init last transform conv -> identity at
    init; after perturbing it, the block adds the SAME vector to every
    spatial position (global context)."""
    from aod_meh_hua_tpu.models.deform import ContextBlock

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 7, 8).astype(np.float32))
    m = ContextBlock(ratio=0.25)
    variables = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m.apply(variables, x)),
                               np.asarray(x), rtol=1e-6)
    v2 = jax.tree_util.tree_map(lambda a: a, variables)
    v2["params"]["channel_add_conv_1"]["kernel"] = jnp.asarray(
        rng.randn(2, 8).astype(np.float32))
    y = np.asarray(m.apply(v2, x))
    delta = y - np.asarray(x)
    np.testing.assert_allclose(
        delta, np.broadcast_to(delta[:, :1, :1], delta.shape),
        rtol=1e-4, atol=1e-5)
    assert np.abs(delta).max() > 0


def test_dcn_faster_rcnn_trains():
    """mdcn c3-c5 Faster R-CNN: params exist where expected, loss is
    finite and decreasing over a short synthetic run."""
    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.two_stage import make_faster_rcnn_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_faster_rcnn_config(backbone_dcn="mdcn")
    model, variables = init_detector(cfg, seed=0)
    bb = variables["params"]["backbone"]
    assert "conv_offset" not in bb["layer1_0"]["conv2"]  # stage c2: plain
    assert "conv_offset" in bb["layer2_0"]["conv2"]
    assert bb["layer2_0"]["conv2"]["conv_offset"]["kernel"].shape[-1] == 27
    assert float(jnp.abs(
        bb["layer2_0"]["conv2"]["conv_offset"]["kernel"]).max()) == 0.0

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
    images[1, 20:52, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [60, 20, 92, 52]
    labels[1, 0] = 4
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(40):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # the offset branch learned something (gradient reached it)
    off = state.params["backbone"]["layer2_0"]["conv2"]["conv_offset"]["kernel"]
    assert float(jnp.abs(off).max()) > 0.0
