"""End-to-end AL loop integration test on a synthetic mini-VOC (CPU).

The reference has no equivalent test (SURVEY.md section 4: the fork
ships zero tests); this exercises the full cycle machinery — fresh model
per cycle, three training runs, eval mAP, pool scoring, acquisition,
npy persistence, cycle resume — at toy scale.
"""

import os

import numpy as np
import pytest

from aod_meh_hua_tpu.al import ALDriver, ALPaths
from aod_meh_hua_tpu.data import PipelineConfig
from aod_meh_hua_tpu.utils.config import ALConfig, TrainConfig, tiny_test_config

from test_data import make_voc


@pytest.fixture(scope="module")
def mini_voc(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("alvoc"))
    base, lst, ids = make_voc(root, "VOC2007", n=14, seed=3)
    # test list: reuse trainval ids as a tiny val set
    test_list = os.path.join(base, "ImageSets/Main/test.txt")
    with open(test_list, "w") as f:
        f.write("\n".join(ids[:4]))
    return base


@pytest.mark.smoke
def test_al_two_cycles(mini_voc, tmp_path):
    cfg = tiny_test_config()
    tcfg = TrainConfig(batch_size=2, outer_epoch=1, epoch_ratio=(1,), lr=0.01)
    al = ALConfig(cycles=(0, 1), x_l_0_size=4, x_s_size=2, x_l_repeat=1,
                  zero_rate=0.5, score_batch_size=4)
    work_dir = str(tmp_path / "work")
    paths = ALPaths(voc07=mini_voc, voc12=None, work_dir=work_dir)
    pipe = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)

    driver = ALDriver(cfg, tcfg, al, paths, pipeline=pipe, validate=True, log=None)
    metrics = driver.run()

    assert len(metrics) == 2
    assert all(np.isfinite(m["mAP"]) for m in metrics)
    # cycle-1 artifacts exist and X_L grew by <= x_s_size
    x_l0 = np.load(os.path.join(work_dir, "X_L_0.npy"))
    x_l1 = np.load(os.path.join(work_dir, "X_L_1.npy"))
    unc1 = np.load(os.path.join(work_dir, "Unc_1.npy"))
    assert len(x_l0) == 4
    assert len(x_l0) < len(x_l1) <= len(x_l0) + al.x_s_size
    assert set(x_l0).issubset(set(x_l1))
    assert unc1.shape[0] == len(driver.pool)
    assert np.isfinite(unc1).all()
    # per-cycle checkpoints saved
    ckpts = [f for f in os.listdir(paths.save_dir) if "_mycode" in f]
    assert len(ckpts) == 2
    assert metrics[1]["n_labeled"] == len(x_l1)


def test_mid_cycle_resume_bit_identical(mini_voc, tmp_path):
    """Kill a run mid-cycle after an epoch snapshot, resume with
    resume_from, and the final params are BIT-identical to the
    uninterrupted run (the reference's cfg.resume_from -> runner.resume,
    apis/train_Lambda.py:72-75 — which the npy cycle-resume cannot do)."""
    import aod_meh_hua_tpu.engine.checkpoint as ckpt_mod
    from aod_meh_hua_tpu.engine.checkpoint import load_checkpoint, cycle_ckpt_path

    cfg = tiny_test_config()
    tcfg = TrainConfig(batch_size=2, outer_epoch=1, epoch_ratio=(2,), lr=0.01,
                       ckpt_interval=1)
    al = ALConfig(cycles=(0,), x_l_0_size=4, x_s_size=2, x_l_repeat=1,
                  score_batch_size=4)
    pipe = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)

    def final_params(work_dir):
        d1 = ALDriver(cfg, tcfg, al, ALPaths(voc07=mini_voc, voc12=None,
                                             work_dir=work_dir),
                      pipeline=pipe, validate=False, log=None)
        path = cycle_ckpt_path(d1.paths.save_dir, d1.name, 0, 2)
        init = d1._init_model(tcfg.seed)[1]
        return load_checkpoint(path, {"params": init["params"],
                                      "batch_stats": init.get("batch_stats", {})})

    # uninterrupted run
    wa = str(tmp_path / "uninterrupted")
    ALDriver(cfg, tcfg, al, ALPaths(voc07=mini_voc, voc12=None, work_dir=wa),
             pipeline=pipe, validate=False, log=None).run()

    # interrupted run: die right after the 3rd epoch snapshot
    # (runs = 2 x 2 epochs; 3rd save = run 2, epoch 1)
    wb = str(tmp_path / "interrupted")
    real_save = ckpt_mod.save_train_state
    calls = {"n": 0}

    def killer(save_dir, state, progress):
        out = real_save(save_dir, state, progress)
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt("simulated preemption")
        return out

    db = ALDriver(cfg, tcfg, al, ALPaths(voc07=mini_voc, voc12=None, work_dir=wb),
                  pipeline=pipe, validate=False, log=None)
    import aod_meh_hua_tpu.al.loop as loop_mod
    orig = ckpt_mod.save_train_state
    ckpt_mod.save_train_state = killer
    try:
        with pytest.raises(KeyboardInterrupt):
            db.run()
    finally:
        ckpt_mod.save_train_state = orig

    # resume from the snapshot
    db2 = ALDriver(cfg, tcfg, al, ALPaths(voc07=mini_voc, voc12=None, work_dir=wb),
                   pipeline=pipe, validate=False, log=None)
    db2.run(resume_from=db2.paths.save_dir)

    pa, pb = final_params(wa), final_params(wb)
    import jax

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        pa, pb)


def test_al_resume_cycle(mini_voc, tmp_path):
    cfg = tiny_test_config()
    tcfg = TrainConfig(batch_size=2, outer_epoch=1, epoch_ratio=(1,), lr=0.01)
    al = ALConfig(cycles=(0, 1), x_l_0_size=4, x_s_size=2, x_l_repeat=1, zero_rate=0.0, score_batch_size=4)
    work_dir = str(tmp_path / "work2")
    paths = ALPaths(voc07=mini_voc, voc12=None, work_dir=work_dir)
    pipe = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)

    d1 = ALDriver(cfg, tcfg, al, paths, pipeline=pipe, validate=False, log=None)
    d1.run()
    # resume from cycle 1's saved split: only cycle 1 retrains
    d2 = ALDriver(cfg, tcfg, al, paths, pipeline=pipe, validate=False, log=None)
    d2.run(resume_cycle=1)
    x_l1 = np.load(os.path.join(work_dir, "X_L_1.npy"))
    assert len(x_l1) > 4
