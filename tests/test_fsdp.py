"""FSDP (ZeRO-3-style) parameter sharding over a 2D (data, fsdp) mesh.

Beyond the reference's DDP-only strategy (SURVEY.md section 2.10): large
params / optimizer-state tensors shard over the 'fsdp' axis, GSPMD
inserts the all-gathers; the jitted train step (engine/train.py) is
UNCHANGED. These tests pin (a) the spec rule, (b) numerical agreement
of a 4x2 (data, fsdp) step with the plain 8-way DP step, (c) sharded
scoring on the 2D mesh's data axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from aod_meh_hua_tpu.engine import (Batch, EvalBatch, create_train_state,
                                    make_score_step, make_train_step)
from aod_meh_hua_tpu.models import init_retinanet
from aod_meh_hua_tpu.ops import anchor_valid_flags
from aod_meh_hua_tpu.parallel import (fsdp_spec, make_mesh, make_mesh_2d,
                                      replicate, shard_batch,
                                      shard_params_fsdp)
from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_test_config


@pytest.mark.smoke
def test_fsdp_spec_rule():
    # large conv kernel: largest divisible dim, trailing wins ties
    assert fsdp_spec((3, 3, 64, 64), 2, min_size=1) == P(None, None, None, "fsdp")
    assert fsdp_spec((3, 3, 128, 64), 2, min_size=1) == P(None, None, "fsdp", None)
    # small tensors and scalars replicate
    assert fsdp_spec((64,), 2) == P()
    assert fsdp_spec((), 2) == P()
    # nothing divisible -> replicated even if large
    assert fsdp_spec((3, 3, 5, 7), 2, min_size=1) == P()


def _make_batch(cfg, b, seed=0):
    rng = np.random.RandomState(seed)
    h, w = cfg.canvas
    g = cfg.max_gt
    boxes = np.zeros((b, g, 4), np.float32)
    boxes[:, 0] = [10, 10, 60, 60]
    gen = cfg.build_anchor_generator()
    shapes = np.tile([[h, w]], (b, 1)).astype(np.int32)
    av = anchor_valid_flags(gen, cfg.featmap_sizes(), shapes)
    return Batch(rng.randn(b, h, w, 3).astype(np.float32) * 0.1, boxes,
                 np.zeros((b, g), np.int32),
                 np.tile(np.arange(g) == 0, (b, 1)), av, shapes)


def _run_step(mesh, state_placer, b=8):
    cfg = tiny_test_config()
    model, variables = init_retinanet(cfg, jax.random.PRNGKey(0))
    state, tx = create_train_state(model, variables, TrainConfig(batch_size=b),
                                   frozen_stages=cfg.frozen_stages)
    state = state_placer(state, mesh)
    step = make_train_step(model, cfg, tx)
    batch = shard_batch(jax.tree.map(jnp.asarray, _make_batch(cfg, b)), mesh)
    state, aux = step(state, batch)
    return cfg, model, state, float(aux["loss"])


@pytest.mark.smoke
def test_fsdp_step_matches_dp():
    mesh_dp = make_mesh(8)
    _, _, state_dp, loss_dp = _run_step(mesh_dp, replicate)

    mesh_2d = make_mesh_2d(4, 2)
    # tiny-config tensors are small; drop the size floor so they shard
    cfg, model, state_fsdp, loss_fsdp = _run_step(
        mesh_2d, lambda s, m: shard_params_fsdp(s, m, min_size=2 ** 10))

    assert np.isfinite(loss_dp) and np.isfinite(loss_fsdp)
    np.testing.assert_allclose(loss_fsdp, loss_dp, rtol=1e-5)
    # updated params agree leaf-by-leaf (all-gather back to host)
    flat_dp = jax.tree.leaves(state_dp.params)
    flat_fs = jax.tree.leaves(state_fsdp.params)
    assert len(flat_dp) == len(flat_fs)
    for a, b in zip(flat_dp, flat_fs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # and at least one large leaf actually lives sharded on 'fsdp'
    sharded = [x for x in jax.tree.leaves(state_fsdp.params)
               if "fsdp" in str(getattr(x, "sharding", ""))]
    assert sharded, "no parameter leaf carries the fsdp axis"

    # scoring on the same 2D mesh: batch on 'data', params as they lie
    score = make_score_step(model, cfg)
    bsz = 8
    h, w = cfg.canvas
    eb = EvalBatch(np.zeros((bsz, h, w, 3), np.float32),
                   np.tile([[h, w]], (bsz, 1)).astype(np.int32),
                   np.ones((bsz, 4), np.float32), np.ones(bsz, bool))
    eb = shard_batch(jax.tree.map(jnp.asarray, eb), mesh_2d)
    unc, _ = score({"params": state_fsdp.params,
                    "batch_stats": state_fsdp.batch_stats}, eb)
    assert np.isfinite(np.asarray(unc)).all()


def test_fsdp_mid_cycle_resume_bit_identical(tmp_path):
    """Gather-on-save under ZeRO-3: kill a --fsdp 2 run mid-cycle after
    an epoch snapshot, resume from it, and the final cycle checkpoint is
    BIT-identical to the uninterrupted fsdp run (the same bar the DP
    resume test sets in test_al_loop.py; reference save path
    mmdet/utils/Epoch_Based_Runner_Lambda.py:144-169)."""
    import os

    import aod_meh_hua_tpu.engine.checkpoint as ckpt_mod
    from aod_meh_hua_tpu.al import ALDriver, ALPaths
    from aod_meh_hua_tpu.data import PipelineConfig
    from aod_meh_hua_tpu.engine.checkpoint import (cycle_ckpt_path,
                                                   load_checkpoint)
    from aod_meh_hua_tpu.utils.config import ALConfig

    from test_data import make_voc

    base, _, ids = make_voc(str(tmp_path / "voc"), "VOC2007", n=14, seed=3)
    with open(os.path.join(base, "ImageSets/Main/test.txt"), "w") as f:
        f.write("\n".join(ids[:4]))

    cfg = tiny_test_config()
    tcfg = TrainConfig(batch_size=8, outer_epoch=1, epoch_ratio=(2,), lr=0.01,
                       ckpt_interval=1)
    al = ALConfig(cycles=(0,), x_l_0_size=4, x_s_size=2, x_l_repeat=1,
                  score_batch_size=8)
    pipe = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)

    def driver(work_dir):
        return ALDriver(cfg, tcfg, al,
                        ALPaths(voc07=base, voc12=None, work_dir=work_dir),
                        pipeline=pipe, validate=False, log=None,
                        cache_dir=None, num_devices=8, fsdp=2)

    def final_params(work_dir):
        d = driver(work_dir)
        path = cycle_ckpt_path(d.paths.save_dir, d.name, 0, 2)
        init = d._init_model(tcfg.seed)[1]
        return load_checkpoint(path, {"params": init["params"],
                                      "batch_stats": init.get("batch_stats", {})})

    wa = str(tmp_path / "uninterrupted")
    driver(wa).run()

    # interrupted run: die right after the 3rd epoch snapshot
    wb = str(tmp_path / "interrupted")
    real_save = ckpt_mod.save_train_state
    calls = {"n": 0}

    def killer(save_dir, state, progress):
        out = real_save(save_dir, state, progress)
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt("simulated preemption")
        return out

    ckpt_mod.save_train_state = killer
    try:
        with pytest.raises(KeyboardInterrupt):
            driver(wb).run()
    finally:
        ckpt_mod.save_train_state = real_save

    driver(wb).run(resume_from=driver(wb).paths.save_dir)

    pa, pb = final_params(wa), final_params(wb)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        pa, pb)


def test_al_driver_fsdp_selection_parity(tmp_path):
    """Full AL cycle pair through ALDriver on an 8-device mesh: the
    4x2 (data, fsdp) run must acquire the SAME images as plain DP-8
    (the sharding layout is a placement detail, not a numerics one)."""
    import os

    from aod_meh_hua_tpu.al import ALDriver, ALPaths
    from aod_meh_hua_tpu.data import PipelineConfig
    from aod_meh_hua_tpu.utils.config import ALConfig

    from test_data import make_voc

    base, _, ids = make_voc(str(tmp_path / "voc"), "VOC2007", n=14, seed=3)
    with open(os.path.join(base, "ImageSets/Main/test.txt"), "w") as f:
        f.write("\n".join(ids[:4]))

    cfg = tiny_test_config()
    tcfg = TrainConfig(batch_size=8, outer_epoch=1, epoch_ratio=(1,), lr=0.01)
    al = ALConfig(cycles=(0, 1), x_l_0_size=4, x_s_size=2, x_l_repeat=1,
                  zero_rate=0.5, score_batch_size=8)
    pipe = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)

    sel = {}
    for tag, kw in [("dp", dict(num_devices=8)),
                    ("fsdp", dict(num_devices=8, fsdp=2))]:
        wd = str(tmp_path / f"work_{tag}")
        drv = ALDriver(cfg, tcfg, al, ALPaths(voc07=base, voc12=None, work_dir=wd),
                       pipeline=pipe, validate=False, log=None, cache_dir=None,
                       **kw)
        drv.run()
        sel[tag] = (np.load(os.path.join(wd, "X_L_1.npy")),
                    np.load(os.path.join(wd, "Unc_1.npy")))
    np.testing.assert_array_equal(sel["dp"][0], sel["fsdp"][0])
    np.testing.assert_allclose(sel["dp"][1], sel["fsdp"][1], rtol=1e-4, atol=1e-6)
