import numpy as np
import pytest

from aod_meh_hua_tpu.ops import AnchorGenerator, SSDAnchorGenerator, anchor_valid_flags


def test_retina_base_anchors_values():
    gen = AnchorGenerator(strides=[8], ratios=[0.5, 1.0, 2.0], octave_base_scale=4, scales_per_octave=3)
    base = gen.base_anchors[0]
    assert base.shape == (9, 4)
    # ratio-major ordering: idx = ratio_idx * 3 + scale_idx
    # ratio 1.0 (idx 3..5), scale 4 -> 32x32 square centered at origin
    np.testing.assert_allclose(base[3], [-16, -16, 16, 16], atol=1e-4)
    # ratio 0.5 => h/w = 0.5: w = 8*sqrt(2)*4, h = 8*sqrt(0.5)*4
    w = 8 * np.sqrt(2.0) * 4
    h = 8 * np.sqrt(0.5) * 4
    np.testing.assert_allclose(base[0], [-w / 2, -h / 2, w / 2, h / 2], rtol=1e-5)
    # octave scales: 4, 4*2^(1/3), 4*2^(2/3)
    s1 = 4 * 2 ** (1 / 3)
    np.testing.assert_allclose(base[4], np.array([-16, -16, 16, 16]) * s1 / 4, rtol=1e-5)


def test_retina_grid_order():
    gen = AnchorGenerator(strides=[8], ratios=[1.0], octave_base_scale=4, scales_per_octave=1)
    anchors = gen.grid_anchors([(2, 3)])[0]  # H=2, W=3, A=1
    assert anchors.shape == (6, 4)
    # row-major cells: (0,0), (0,1), (0,2), (1,0)...
    np.testing.assert_allclose(anchors[1] - anchors[0], [8, 0, 8, 0])
    np.testing.assert_allclose(anchors[3] - anchors[0], [0, 8, 0, 8])


def test_valid_flags():
    gen = AnchorGenerator(strides=[8], ratios=[1.0], octave_base_scale=4, scales_per_octave=1)
    flags = gen.valid_flags([(4, 4)], pad_shape=(17, 9))[0]
    # valid_h = ceil(17/8)=3, valid_w = ceil(9/8)=2
    grid = flags.reshape(4, 4)
    assert grid[:3, :2].all()
    assert not grid[3].any()
    assert not grid[:, 2:].any()


def test_total_anchor_count_canvas():
    gen = AnchorGenerator()
    sizes = [(608 // s, 1024 // s) for s in (8, 16, 32, 64, 128)]
    anchors = gen.grid_anchors(sizes)
    total = sum(a.shape[0] for a in anchors)
    assert anchors[0].shape[0] == 76 * 128 * 9
    assert total == sum(h * w * 9 for h, w in sizes)


def test_ssd_anchor_counts_and_sizes():
    gen = SSDAnchorGenerator()
    # reference config: ratios ([2],[2,3],[2,3],[2,3],[2],[2]) -> 4,6,6,6,4,4
    assert gen.num_base_anchors == [4, 6, 6, 6, 4, 4]
    # basesize_ratio_range=(0.15, 0.9), input 300: first level min 21 max 45
    assert gen.base_sizes[0] == 21
    base0 = gen.base_anchors[0]
    # anchor 0: min-size square at center (4, 4)
    np.testing.assert_allclose(base0[0], [4 - 10.5, 4 - 10.5, 4 + 10.5, 4 + 10.5])
    # anchor 1: sqrt(21*45) square
    s = 21 * np.sqrt(45.0 / 21.0)
    np.testing.assert_allclose(base0[1], [4 - s / 2, 4 - s / 2, 4 + s / 2, 4 + s / 2], rtol=1e-5)


def test_batch_valid_flags():
    gen = AnchorGenerator(strides=[8, 16], ratios=[1.0], octave_base_scale=4, scales_per_octave=1)
    sizes = [(4, 4), (2, 2)]
    flags = anchor_valid_flags(gen, sizes, np.array([[32, 32], [8, 8]]))
    assert flags.shape == (2, 16 + 4)
    assert flags[0].all()
    assert flags[1].sum() == 1 + 1  # one cell valid per level
