"""Ablation configs, visualization utils, split variants, profiling."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from aod_meh_hua_tpu.utils.config import tiny_test_config, TrainConfig
from aod_meh_hua_tpu.models import init_retinanet
from aod_meh_hua_tpu.engine import create_train_state, make_train_step
from aod_meh_hua_tpu.engine.train import make_loss_fn

from test_engine import _make_batch

CFG = tiny_test_config()


@pytest.mark.parametrize("variant", [
    {"meh_loss": "l1"},                      # Lambda_L1Net
    {"meh_loss": "msle"},                    # Lambda_MSLENet
    {"use_meh": False},                      # Lambda_L2Net_NoL
    {"cls_loss": "focal"},                   # plain FocalLoss head
    {"cls_loss": "edl_focal"},               # EDL_FocalLoss head
])
def test_ablation_configs_train(variant, rng):
    cfg = replace(CFG, **variant)
    model, variables = init_retinanet(cfg, jax.random.PRNGKey(0))
    loss_fn, anchors = make_loss_fn(model, cfg)
    total, aux = jax.jit(loss_fn)(variables["params"], variables["batch_stats"],
                                  _make_batch(rng), anchors)
    assert np.isfinite(float(total))
    if variant.get("use_meh") is False:
        assert float(aux["loss_meh"]) == 0.0


def test_visualize_utils(tmp_path, rng):
    from aod_meh_hua_tpu.utils.visualize import (
        draw_detections, heatmap, save_image, dump_level_heatmaps, denormalize,
    )

    img = rng.randint(0, 255, (100, 160, 3)).astype(np.uint8)
    out = draw_detections(
        img, np.array([[10, 10, 60, 60], [80, 20, 150, 90]]),
        labels=np.array([3, 7]), scores=np.array([0.9, 0.4]),
        uncertainties=np.array([0.12, 0.55]),
    )
    assert out.shape == img.shape and not np.array_equal(out, img)
    hm = heatmap(rng.rand(8, 16), size=(64, 128))
    assert hm.shape == (64, 128, 3)
    save_image(out, str(tmp_path / "d.jpg"))
    assert os.path.exists(tmp_path / "d.jpg")

    sizes = [(4, 8), (2, 4)]
    vals = rng.rand(sum(h * w * 9 for h, w in sizes)).astype(np.float32)
    dump_level_heatmaps(vals, sizes, 9, str(tmp_path), canvas=(32, 64))
    assert os.path.exists(tmp_path / "unc_level0.jpg")

    norm = (img.astype(np.float32)[..., ::-1] - 123.0) / 58.0
    back = denormalize(norm, (123.0, 123.0, 123.0), (58.0, 58.0, 58.0))
    np.testing.assert_allclose(back, img, atol=2)


def test_split_variants():
    from aod_meh_hua_tpu.data import init_split_disjoint, update_labeled_set_reselect

    rng = np.random.RandomState(0)
    x_l, x_u, x_all = init_split_disjoint(50, 10, rng)
    assert len(x_l) == 10 and len(x_u) == 40
    assert np.intersect1d(x_l, x_u).size == 0

    unc = np.linspace(0, 1, 50)
    x_l2, x_u2 = update_labeled_set_reselect(unc, x_all, x_l, 5, rng)
    assert len(x_l2) == 15
    np.testing.assert_array_equal(x_l2, np.arange(35, 50))  # top-15 by uncertainty


def test_split_variants_all_double_plain():
    """get_X_L_ALL / get_X_L_0_Double / update_X_L_filter parity
    (active_datasets.py:7-13, 15-24, 151-163)."""
    from aod_meh_hua_tpu.data import (
        init_split_all, init_split_double, update_labeled_set_plain,
    )

    rng = np.random.RandomState(1)
    x_l, x_u, x_all = init_split_all(30, rng)
    np.testing.assert_array_equal(x_l, np.arange(30))  # all, sorted
    assert len(x_u) == 1 and x_u[0] == x_all[-1]

    rng = np.random.RandomState(2)
    x_l, x_u, x_all = init_split_double(50, 10, rng)
    assert len(x_l) == 20 and len(x_u) == 30
    assert np.intersect1d(x_l, x_u).size == 0
    np.testing.assert_array_equal(np.union1d(x_l, x_u), np.arange(50))

    rng = np.random.RandomState(3)
    x_l = np.arange(10)
    unc = np.linspace(0, 1, 50)
    x_l2, x_u2 = update_labeled_set_plain(unc, np.arange(50), x_l, 5, rng)
    np.testing.assert_array_equal(x_l2, np.concatenate([np.arange(10),
                                                        np.arange(45, 50)]))
    assert len(x_u2) == len(x_l2)
    assert np.intersect1d(x_l2, x_u2).size == 0


def test_stem_s2d_equivalence(rng):
    """The space-to-depth stem (TPU layout) is numerically the 7x7/2
    conv with the identical parameter tree — checkpoints swap freely."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from aod_meh_hua_tpu.models import build_retinanet, init_retinanet
    from aod_meh_hua_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config()
    model, variables = init_retinanet(cfg, jax.random.PRNGKey(3))
    model_s2d = build_retinanet(replace(cfg, stem_s2d=True))
    h, w = cfg.canvas
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32) * 0.3)
    a = model.apply(variables, x)
    b = model_s2d.apply(variables, x)  # same variables, different layout
    for u, v in zip(a[:2], b[:2]):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-4, atol=1e-4)
    # init with the flag produces the same param tree
    _, v2 = init_retinanet(replace(cfg, stem_s2d=True), jax.random.PRNGKey(3))
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(variables)
    assert v2["params"]["backbone"]["conv1"]["kernel"].shape == \
        variables["params"]["backbone"]["conv1"]["kernel"].shape


def test_save_code_snapshot(tmp_path):
    """SaveCode port: the run dir gets a source snapshot archive."""
    import tarfile

    from aod_meh_hua_tpu.utils.env import save_code

    p = save_code(str(tmp_path))
    names = tarfile.open(p).getnames()
    assert any(n.startswith("aod_meh_hua_tpu/") for n in names)
    assert any(n.startswith("tools/") for n in names)
    assert not any("__pycache__" in n for n in names)


def test_profile_time_and_cost(capsys):
    from aod_meh_hua_tpu.utils.profiling import profile_time, compiled_cost

    x = jnp.ones((64, 64))
    with profile_time("matmul", sync=x):
        y = x @ x
    assert "matmul" in capsys.readouterr().out
    cost = compiled_cost(lambda a: a @ a, x)
    assert cost["flops"] > 0


def test_show_result(tmp_path, rng):
    from aod_meh_hua_tpu.api import show_result

    img = rng.randint(0, 255, (80, 120, 3)).astype(np.uint8)
    dets = [np.array([[5, 5, 40, 40, 0.9]], np.float32)] + [np.zeros((0, 5), np.float32)] * 5
    out = show_result(img, dets, out_file=str(tmp_path / "r.jpg"))
    assert os.path.exists(tmp_path / "r.jpg")
    assert not np.array_equal(out, img)


def test_conv1x1_matmul_equivalence(rng):
    """Conv1x1Matmul (backbone 1x1 convs as reshaped matmuls — the
    measured 4.6x MXU lever, models/resnet.py) is numerically the
    nn.Conv path with the identical parameter tree, including the
    stride-2 downsample 1x1."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from aod_meh_hua_tpu.models import build_retinanet, init_retinanet
    from aod_meh_hua_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config()
    model, variables = init_retinanet(cfg, jax.random.PRNGKey(3))
    model_mm = build_retinanet(replace(cfg, conv1x1_matmul=True))
    h, w = cfg.canvas
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32) * 0.3)
    a = model.apply(variables, x)
    b = model_mm.apply(variables, x)  # same variables, different lowering
    for u, v in zip(a[:2], b[:2]):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-4, atol=1e-4)
    # init with the flag produces the same param tree
    _, v2 = init_retinanet(replace(cfg, conv1x1_matmul=True),
                           jax.random.PRNGKey(3))
    assert jax.tree_util.tree_structure(v2) == \
        jax.tree_util.tree_structure(variables)
