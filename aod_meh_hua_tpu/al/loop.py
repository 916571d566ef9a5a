"""The active-learning cycle orchestrator.

Behavioral parity target (reference, /root/reference):
* tools/train_RetinaNet.py:76-253 — per cycle: write split -> build a
  FRESH detector (re-init weights incl. the uniform retina_cls bias) ->
  train in three runs (outer epoch 0 trains twice: 'First Label Set
  Training' then 'Fully-Supervised', outer epoch 1 once; each run is
  epoch_ratio[0] inner epochs over RepeatDataset x X_L_repeat; lr resets
  to base per run and steps x0.1 at epoch lr_step_epoch of the FINAL run
  only) -> per-cycle checkpoint -> score the whole pool -> update_X_L
  with zeroRate -> persist X_L/X_U/Unc npys.
* mmdet/utils/functions.py:478 (ResumeCycle), tools driver load_cycle.

Everything device-side is one of four compiled programs (train/score x
landscape/portrait); this loop is plain host python + numpy.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np

from ..data import (
    ConcatVOC, EvalLoader, PipelineConfig, TrainLoader, VOCDataset,
    init_split, load_cycle_state, save_cycle_state, update_labeled_set,
)
from ..engine import (
    create_train_state, detections_to_per_class, make_eval_step,
    make_train_step, schedule_lr,
)
from ..engine.checkpoint import load_checkpoint, save_cycle_checkpoint
from ..engine.train import set_learning_rate
from ..models import init_retinanet
from ..utils.config import ALConfig, RetinaNetConfig, TrainConfig
from ..utils.voc_eval import eval_map
from .uncertainty import score_pool

ORIENTATIONS = ("landscape", "portrait")


@dataclass
class ALPaths:
    voc07: str                 # .../VOC2007
    voc12: Optional[str]       # .../VOC2012 (None for voc07-only runs)
    work_dir: str
    trainval07: Optional[str] = None  # default: ImageSets/Main/trainval.txt
    trainval12: Optional[str] = None
    test07: Optional[str] = None      # default: ImageSets/Main/test.txt

    def __post_init__(self):
        j = os.path.join
        self.trainval07 = self.trainval07 or j(self.voc07, "ImageSets/Main/trainval.txt")
        if self.voc12:
            self.trainval12 = self.trainval12 or j(self.voc12, "ImageSets/Main/trainval.txt")
        self.test07 = self.test07 or j(self.voc07, "ImageSets/Main/test.txt")
        self.save_dir = j(self.work_dir, "model_save")


class ALDriver:
    """Runs the full AL experiment. All jitted programs are built lazily
    per orientation and cached across cycles."""

    def __init__(
        self,
        model_cfg: RetinaNetConfig,
        train_cfg: TrainConfig,
        al_cfg: ALConfig,
        paths: ALPaths,
        pipeline: Optional[PipelineConfig] = None,
        validate: bool = True,
        name: str = "retinanet_meh",
        log: Optional[callable] = print,
        num_devices: Optional[int] = None,
        cache_dir: Optional[str] = "auto",
        distributed: bool = False,
        coordinator: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None,
        fsdp: int = 1,
        baseline: Optional[str] = None,
        ensemble_size: int = 3,
    ):
        """num_devices > 1 runs data-parallel over a 'data' mesh: params
        replicated, train batches and pool-scoring batches sharded on the
        batch axis (the reference's DDP + rank-sharded scoring,
        /root/reference/mmdet/apis/train.py:75-85, apis/test.py:197-315).
        batch sizes are GLOBAL and must divide by num_devices.

        cache_dir: decoded-canvas cache root ("auto" = <work_dir>/
        canvas_cache, None = off). The pool is immutable across cycles,
        so eval/score sweeps decode each JPEG ONCE per experiment and
        every later sweep memory-maps the prepared canvas — the
        reference re-decodes per epoch per cycle (datasets/pipelines/
        loading.py:12).

        distributed=True is the multi-HOST axis (the reference's
        --launcher {pytorch,slurm,mpi} DDP mode, tools/
        train_RetinaNet.py:68,117-123): jax.distributed is initialized
        (coordinator/num_processes/process_id for manual launches,
        auto-discovered on Cloud TPU), the TRAIN mesh spans every
        process's devices (grads psum over ICI+DCN), and the pool/eval
        sweeps are rank-sliced — each process scores its strided slice
        on its local devices and results merge through one gather
        (apis/test.py:197-315). Loaders stay bit-identical across ranks
        (same seeds), so the global train batch is assembled from
        identical host copies and the selection matches the
        single-process run exactly. Only rank 0 writes artifacts.

        fsdp > 1 folds the mesh to 2D (num_devices/fsdp, fsdp) =
        ('data', 'fsdp') and ZeRO-3-shards params + optimizer state over
        the 'fsdp' axis (parallel/mesh.py shard_params_fsdp): GSPMD
        all-gathers weights at use and reduce-scatters grads. Beyond the
        reference (DDP-only); useful when a family's params + momentum
        don't fit one chip's HBM. Batches stay sharded on 'data', so
        global batch sizes must divide num_devices/fsdp."""
        self.cfg = model_cfg
        self.tcfg = train_cfg
        self.al = al_cfg
        self.paths = paths
        # baseline="ensemble": the reference's deep-ensemble experiment
        # (apis/CalEnsembleUnc.py:86-181) as a driver mode — each cycle
        # trains ensemble_size independently seeded members on the same
        # X_L and scores the pool with the 3-member sigmoid-MI instead
        # of HUA. Members are cycle-local (not snapshotted): a mid-cycle
        # resume retrains them from the primary's snapshot point.
        if baseline not in (None, "ensemble"):
            raise ValueError(f"unknown baseline {baseline!r}")
        if baseline == "ensemble" and al_cfg.use_max_conf != "False":
            raise ValueError("ensemble baseline emits no maxconf; "
                             "use_max_conf must stay 'False'")
        self.baseline = baseline
        self.ensemble_size = int(ensemble_size)
        self.augment_fn = None
        if pipeline is None:
            if getattr(model_cfg, "family", "retinanet") == "ssd":
                # SSD: exact warp, caffe-style std=1 (Config_SSD.py:87,106);
                # uint8 transport applies to eval/score only (the augment
                # chain produces float images -> host-normalized path)
                pipeline = PipelineConfig(
                    img_scale=model_cfg.canvas, canvas=model_cfg.canvas,
                    std=(1.0, 1.0, 1.0), keep_ratio=False,
                    device_normalize=True,
                )
                from ..data.ssd_augment import ssd_train_augment

                self.augment_fn = ssd_train_augment
            else:
                pipeline = PipelineConfig(canvas=model_cfg.canvas,
                                          device_normalize=True)
        self.pipeline = pipeline
        self.validate = validate
        self.name = name
        self.log = log or (lambda *a, **k: None)
        self.rng = np.random.RandomState(train_cfg.seed)

        self.distributed = distributed
        self.proc_id, self.proc_count = 0, 1
        if distributed:
            from ..parallel import init_distributed

            info = init_distributed(coordinator, num_processes, process_id)
            self.proc_id = info["process_index"]
            self.proc_count = info["process_count"]
            if num_devices is None:
                num_devices = info["global_devices"]
            self.log(f"distributed: process {self.proc_id}/{self.proc_count}, "
                     f"{info['local_devices']} local / "
                     f"{info['global_devices']} global devices")
        self.is_main = self.proc_id == 0

        self.mesh = None
        self.fsdp = max(1, int(fsdp))
        self._local_mesh_built = False
        self._local_mesh = None
        if self.fsdp > 1 and (num_devices is None or num_devices <= 1):
            raise ValueError("fsdp > 1 requires num_devices > 1")
        if num_devices is not None and num_devices > 1:
            from ..parallel import make_mesh, make_mesh_2d

            if num_devices % self.fsdp:
                raise ValueError(f"num_devices {num_devices} not divisible "
                                 f"by fsdp {self.fsdp}")
            n_data = num_devices // self.fsdp
            if train_cfg.batch_size % n_data:
                raise ValueError(
                    f"global batch_size {train_cfg.batch_size} not divisible "
                    f"by the data axis ({n_data} = num_devices/fsdp)")
            if al_cfg.score_batch_size % n_data:
                raise ValueError(
                    f"score_batch_size {al_cfg.score_batch_size} not divisible "
                    f"by the data axis ({n_data} = num_devices/fsdp)")
            self.mesh = (make_mesh_2d(n_data, self.fsdp) if self.fsdp > 1
                         else make_mesh(num_devices))

        datasets = [VOCDataset(paths.trainval07, paths.voc07)]
        if paths.voc12:
            datasets.append(VOCDataset(paths.trainval12, paths.voc12))
        self.pool = ConcatVOC(datasets)
        self.val = VOCDataset(paths.test07, paths.voc07, test_mode=True) if validate else None

        if cache_dir == "auto":
            cache_dir = os.path.join(paths.work_dir, "canvas_cache")
        self.cache_dir = cache_dir
        self._caches: Dict[str, object] = {}

        if self.proc_count > 1:
            from ..parallel import barrier

            barrier("driver_ready")  # absorb import/dataset-build skew

        self._train_steps: Dict[str, callable] = {}
        self._score_steps: Dict[str, callable] = {}
        self._eval_steps: Dict[str, callable] = {}
        self.model = None
        self.tx = None
        self.metrics: List[dict] = []
        # optional hook: variables -> variables (e.g. pretrained backbone)
        self.pretrained_loader = None

    # ----- program cache -----

    def _train_step(self, orientation: str):
        if orientation not in self._train_steps:
            self._train_steps[orientation] = make_train_step(
                self.model, self.cfg.for_orientation(orientation), self.tx,
                # pinned output placement keeps the ZeRO-3 layout a
                # fixpoint of the step, so a state re-placed at resume
                # hits the SAME compiled program (bit-identical resume)
                pin_state_shardings=self.mesh is not None,
            )
        return self._train_steps[orientation]

    def _eval_step(self, orientation: str):
        if orientation not in self._eval_steps:
            self._eval_steps[orientation] = make_eval_step(
                self.model, self.cfg.for_orientation(orientation)
            )
        return self._eval_steps[orientation]

    def _shard(self, batch):
        """Split a batch's leading axis over the data mesh (no-op single-device)."""
        if self.mesh is None:
            return batch
        from ..parallel import shard_batch

        return shard_batch(batch, self.mesh)

    def _replicate(self, state):
        """Place train state on the mesh: replicated (DP), or ZeRO-3
        sharded over 'fsdp' when the mesh carries that axis."""
        if self.mesh is None:
            return state
        if self.fsdp > 1:
            from ..parallel import shard_params_fsdp

            return shard_params_fsdp(state, self.mesh)
        from ..parallel import replicate

        return replicate(state, self.mesh)

    def _host_state(self, tree):
        """Host-numpy view for checkpointing / per-rank sweeps
        (gather-on-save: under fsdp or multi-host the leaves are sharded
        jax.Arrays whose shards may live on non-addressable devices).
        COLLECTIVE under multi-host: every rank must call it — keep the
        call OUTSIDE any is_main guard."""
        if self.mesh is not None and (self.fsdp > 1 or self.proc_count > 1):
            from ..parallel import gather_to_host

            return gather_to_host(tree, self.mesh)
        return jax.tree.map(np.asarray, tree)

    # ----- phases -----

    def _init_model(self, seed: int):
        if getattr(self.cfg, "family", "retinanet") == "ssd":
            from ..models import init_ssd

            return init_ssd(self.cfg, jax.random.PRNGKey(seed))
        return init_retinanet(self.cfg, jax.random.PRNGKey(seed))

    def _fresh_model(self, cycle: int):
        seed = self.tcfg.seed + cycle  # fresh init each cycle (driver :156-162)
        model, variables = self._init_model(seed)
        if self.pretrained_loader is not None:
            variables = self.pretrained_loader(variables)
        if self.model is None:
            # first cycle: build optimizer once; compiled programs are
            # config-shaped, so they survive re-initialized variables
            self.model = model
            state, self.tx = create_train_state(
                self.model, variables, self.tcfg,
                frozen_stages=getattr(self.cfg, "frozen_stages", 0),
            )
            return state
        from ..engine.train import TrainState
        import jax.numpy as jnp

        return TrainState(
            jnp.zeros((), jnp.int32), variables["params"],
            variables.get("batch_stats", {}), self.tx.init(variables["params"]),
        )

    def _train_run(self, state, x_l, run_seed: int, is_final_run: bool,
                   cycle: int = 0, run_idx: int = 0, start_epoch: int = 0,
                   snapshot: bool = True):
        loader = TrainLoader(
            self.pool, x_l, self.cfg, self.pipeline,
            batch_size=self.tcfg.batch_size, repeat=self.al.x_l_repeat,
            seed=run_seed, augment_fn=self.augment_fn,
        )
        n_inner = self.tcfg.epoch_ratio[0]
        if self.proc_count > 1:
            # align ranks before the compile-heavy first step: the CPU
            # Gloo rendezvous window is ~30 s (parallel/dist.barrier)
            from ..parallel import barrier

            barrier("train_run")
        run_iter = 0  # warmup restarts per run (each run is a new runner)
        if start_epoch:
            # mid-cycle resume: replay the consumed RNG + warmup counter
            loader.burn_epochs(start_epoch)
            run_iter = start_epoch * len(loader)
        for inner in range(start_epoch, n_inner):
            lr = self.tcfg.lr * (0.1 if (is_final_run and inner >= self.tcfg.lr_step_epoch) else 1.0)
            state = state._replace(opt_state=set_learning_rate(state.opt_state, lr))
            t0, n_iter = time.time(), 0
            auxes = []  # device scalars; fetched ONCE at epoch end (a
            # mid-epoch fetch would flush this environment's TPU relay
            # journal per iter — see engine/batch.prepare_images notes)
            for orientation, batch in loader:
                if run_iter < self.tcfg.warmup_iters:
                    # mmcv linear warmup: lr * (1 - (1 - k/N)(1 - ratio))
                    f = 1 - (1 - run_iter / self.tcfg.warmup_iters) * (1 - self.tcfg.warmup_ratio)
                    state = state._replace(
                        opt_state=set_learning_rate(state.opt_state, lr * f))
                elif run_iter == self.tcfg.warmup_iters and self.tcfg.warmup_iters:
                    state = state._replace(opt_state=set_learning_rate(state.opt_state, lr))
                state, aux = self._train_step(orientation)(state, self._shard(batch))
                n_iter += 1
                run_iter += 1
                auxes.append(aux)
            losses = np.array([float(a["loss"]) for a in auxes])
            dt = time.time() - t0
            bad = np.nonzero(~np.isfinite(losses))[0]
            if bad.size:
                # the reference's NaN/Inf asserts (My_L_ssd_head.py:281);
                # epoch-granular here (per-iter would sync the device)
                i = int(bad[0])
                a = auxes[i]
                raise FloatingPointError(
                    f"non-finite loss {losses[i]} at epoch iter {i + 1} "
                    f"(cls {float(a['loss_cls'])}, bbox {float(a['loss_bbox'])}, "
                    f"meh {float(a['loss_meh'])})"
                )
            loss_sum = float(losses.sum())
            self.log(
                f"    epoch done: {n_iter} iters, mean loss "
                f"{loss_sum / max(n_iter, 1):.4f}, lr {lr:g}, {dt:.1f}s"
            )
            self._log_train_entry({
                "mean_loss": loss_sum / max(n_iter, 1), "iters": n_iter,
                "lr": lr, "seconds": round(dt, 2),
                "img_per_s": round(n_iter * self.tcfg.batch_size / max(dt, 1e-9), 2),
            })
            ival = self.tcfg.ckpt_interval if snapshot else 0
            if ival and ((inner + 1) % ival == 0 or inner + 1 == n_inner):
                # gather BEFORE the rank guard: under fsdp/multi-host the
                # host view is assembled by a collective all ranks run
                host = self._host_state(state)
                if self.is_main:
                    from ..engine.checkpoint import save_train_state

                    save_train_state(
                        self.paths.save_dir, host,
                        {"cycle": cycle, "run": run_idx, "epoch": inner,
                         "run_iter": run_iter, "name": self.name},
                    )
        return state

    def _train_ensemble_members(self, x_l, cycle: int, runs) -> list:
        """Train ensemble_size - 1 EXTRA members for the ensemble
        baseline (the primary model is member 0): fresh init per member
        with a disjoint seed stream, the SAME run schedule and labeled
        set, no snapshots. Returns their host variable dicts."""
        from ..engine.train import TrainState
        import jax.numpy as jnp

        member_vars = []
        for m in range(1, self.ensemble_size):
            seed = self.tcfg.seed + cycle + 10_000 * m
            _model, variables = self._init_model(seed)
            if self.pretrained_loader is not None:
                variables = self.pretrained_loader(variables)
            state = TrainState(
                jnp.zeros((), jnp.int32), variables["params"],
                variables.get("batch_stats", {}),
                self.tx.init(variables["params"]),
            )
            state = self._replicate(state)
            for ri, (outer, _r) in enumerate(runs):
                is_final = ri == len(runs) - 1
                self.log(f"  ensemble member {m + 1}/{self.ensemble_size}: "
                         f"train run {ri + 1}/{len(runs)}")
                state = self._train_run(
                    state, x_l,
                    self.tcfg.seed + cycle * 100 + ri + 10_000 * m,
                    is_final, cycle=cycle, run_idx=ri, snapshot=False,
                )
            member_vars.append(self._host_state(self._variables(state)))
        return member_vars

    def _score_pool_ensemble(self, state, x_l, cycle: int, runs):
        """The deep-ensemble baseline sweep (CalEnsembleUnc.py:137-180):
        rank-sliced like the production sweep, plain-jit per rank (the
        member loop inside the step is the batch-parallel axis), scores
        gathered across hosts. Returns (unc, zeros-as-maxconf)."""
        from .baselines import score_pool_ensemble

        members = [self._host_state(self._variables(state))]
        members += self._train_ensemble_members(x_l, cycle, runs)
        from ..parallel import rank_indices

        sidx = rank_indices(len(self.pool), self.proc_id, self.proc_count)
        loader = EvalLoader(self.pool, sidx, self.pipeline,
                            batch_size=self.al.score_batch_size,
                            cache=self._canvas_cache("pool", self.pool))
        unc = score_pool_ensemble(self.model, members, self.cfg, loader,
                                  len(self.pool))
        return unc, np.zeros_like(unc)

    def _log_train_entry(self, entry: dict):
        """Append a jsonl train-log record (the TextLoggerHook analog);
        forwarded to wandb when a run is active (the reference's optional
        wandb tracking, tools/train_SSD.py:109-121)."""
        if not self.is_main:
            return
        os.makedirs(self.paths.work_dir, exist_ok=True)
        with open(os.path.join(self.paths.work_dir, "train_log.jsonl"), "a") as f:
            f.write(json.dumps(entry) + "\n")
        try:
            import wandb

            if wandb.run is not None:
                wandb.log(entry)
        except ImportError:
            pass

    def _canvas_cache(self, name: str, dataset):
        """Per-dataset decoded-canvas cache (pool + val differ), built
        lazily and kept open across cycles. Multi-host: per-rank subdir
        (each rank only ever sweeps its slice; avoids create races)."""
        if self.proc_count > 1:
            name = f"{name}_r{self.proc_id}"
        if name not in self._caches:
            from ..data import open_canvas_cache

            cd = os.path.join(self.cache_dir, name) if self.cache_dir else None
            self._caches[name] = open_canvas_cache(
                cd, dataset, self.pipeline, log=self.log)
        return self._caches[name]

    def _sweep_setup(self, dataset, variables):
        """Execution context for a pool/eval sweep: (indices, variables,
        mesh). Single-process: the full range over the data mesh.
        Multi-process: this rank's strided slice on its LOCAL devices
        (the reference's rank-sliced multi_gpu sweep, apis/
        test.py:197-240) with a host copy of the replicated params."""
        n = len(dataset)
        if self.proc_count == 1:
            return np.arange(n), variables, self.mesh
        from ..parallel import make_local_mesh, rank_indices

        if not self._local_mesh_built:
            self._local_mesh = make_local_mesh()
            self._local_mesh_built = True
        idx = rank_indices(n, self.proc_id, self.proc_count)
        host_vars = self._host_state(variables)  # gathers fsdp shards
        return idx, host_vars, self._local_mesh

    def evaluate(self, variables) -> float:
        assert self.val is not None
        idx, svars, mesh = self._sweep_setup(self.val, variables)
        loader = EvalLoader(self.val, idx, self.pipeline,
                            batch_size=self.al.score_batch_size,
                            cache=self._canvas_cache("val", self.val))
        if mesh is not None:
            from ..parallel import shard_batch

            shard = lambda b: shard_batch(b, mesh)
        else:
            shard = jax.device_put  # async: overlaps H2D with the step
        results, annotations = [], []
        order = []
        # one-batch lookahead: upload k+1 while k's detections transfer
        # back and convert (same structure as al.uncertainty.score_pool)
        it = iter(loader)
        cur = next(it, None)
        cur = (cur[0], shard(cur[1]), cur[2]) if cur is not None else None
        while cur is not None:
            orientation, batch, bidx = cur
            dets = self._eval_step(orientation)(svars, batch)
            cur = next(it, None)
            cur = (cur[0], shard(cur[1]), cur[2]) if cur is not None else None
            results.extend(detections_to_per_class(dets, self.cfg.num_classes,
                                                   np.asarray(batch.valid)))
            order.extend(bidx.tolist())
        if self.proc_count > 1:
            from ..parallel import collect_objects

            parts = collect_objects(self.paths.work_dir, "eval",
                                    (results, order))
            results = [r for res, _ in parts for r in res]
            order = [i for _, o in parts for i in o]
        annotations = [self.val.get_ann_info(i) for i in order]
        out = eval_map(results, annotations, iou_thr=0.5, mode="11points")
        return out["mAP"]

    def _variables(self, state):
        return {"params": state.params, "batch_stats": state.batch_stats}

    # ----- the main loop -----

    def run(self, resume_cycle: int = -1, load_cycle: int = -1,
            resume_from: Optional[str] = None):
        """resume_from: path to a save_dir (or train_state.ckpt) written
        by the epoch-granular snapshotter — resumes training INSIDE the
        interrupted cycle at the exact next epoch, bit-identical to the
        uninterrupted run (the reference's cfg.resume_from,
        apis/train_Lambda.py:72-75). resume_cycle remains the coarser
        cycle-granular restart (ResumeCycle)."""
        os.makedirs(self.paths.work_dir, exist_ok=True)
        if self.is_main:
            try:
                from ..utils.env import save_code

                save_code(self.paths.work_dir)  # SaveCode (functions.py:103-116)
            except Exception:
                pass  # snapshotting must never block training
        mid = None  # (progress dict) for mid-cycle resume
        if resume_from:
            d = resume_from if os.path.isdir(resume_from) else os.path.dirname(resume_from)
            with open(os.path.join(d, "train_state.json")) as f:
                mid = json.load(f)
            mid["dir"] = d
            resume_cycle = mid["cycle"]
        x_l, x_u, x_all = init_split(len(self.pool), self.al.x_l_0_size, self.rng)
        if self.is_main:
            save_cycle_state(self.paths.work_dir, 0, x_l, x_u)
        resumed = resume_cycle < 0

        for cycle in self.al.cycles:
            if not resumed:
                if cycle < resume_cycle:
                    continue
                loaded = load_cycle_state(self.paths.work_dir, resume_cycle)
                assert loaded is not None, f"no saved state for cycle {resume_cycle}"
                x_l, x_u = loaded
                resumed = True

            self.log(f"== cycle {cycle}: |X_L|={len(x_l)} |X_U|={len(x_u)} ==")
            state = self._replicate(self._fresh_model(cycle))
            if load_cycle >= 0:
                from ..engine.checkpoint import cycle_ckpt_path

                path = cycle_ckpt_path(self.paths.save_dir, self.name, load_cycle,
                                       self.tcfg.epoch_ratio[0])
                params = load_checkpoint(path, state.params)
                if self.mesh is not None:
                    # re-place the host leaves: ZeRO-3-sharded under fsdp
                    # (a replicated placement would defeat the HBM saving
                    # and recompile against a new input sharding), else
                    # replicated — mirrors the resume_from path
                    from ..parallel import replicate, shard_params_fsdp

                    params = (shard_params_fsdp(params, self.mesh)
                              if self.fsdp > 1 else replicate(params, self.mesh))
                state = state._replace(params=params)
                self.log(f"  loaded params from {path}")

            # three training runs: outer 0 twice, final outer once
            runs = []
            for outer in range(self.tcfg.outer_epoch):
                n_runs = 2 if outer == 0 else 1
                for r in range(n_runs):
                    runs.append((outer, r))

            start_run, start_epoch = 0, 0
            if mid is not None and cycle == mid["cycle"]:
                from ..engine.checkpoint import load_train_state

                state, _ = load_train_state(mid["dir"], state)
                state = self._replicate(state)
                start_run, start_epoch = mid["run"], mid["epoch"] + 1
                if start_epoch >= self.tcfg.epoch_ratio[0]:
                    start_run, start_epoch = start_run + 1, 0
                self.log(f"  resumed mid-cycle at run {start_run + 1}, "
                         f"epoch {start_epoch + 1}")
                mid = None

            for ri, (outer, r) in enumerate(runs):
                if ri < start_run:
                    continue
                is_final = ri == len(runs) - 1
                self.log(f"  train run {ri + 1}/{len(runs)} (outer {outer})")
                state = self._train_run(
                    state, x_l, self.tcfg.seed + cycle * 100 + ri, is_final,
                    cycle=cycle, run_idx=ri,
                    start_epoch=start_epoch if ri == start_run else 0,
                )

            if self.validate:
                mAP = self.evaluate(self._variables(state))
                self.log(f"  cycle {cycle} VOC mAP: {mAP:.4f}")
                self.metrics.append({"cycle": cycle, "mAP": mAP, "n_labeled": int(len(x_l))})
                if self.is_main:
                    with open(os.path.join(self.paths.work_dir, "metrics.json"), "w") as f:
                        json.dump(self.metrics, f, indent=2)

            import aod_meh_hua_tpu

            from ..data.voc import VOC_CLASSES
            from ..utils.env import collect_env

            host_vars = self._host_state(self._variables(state))
            if self.is_main:
                save_cycle_checkpoint(
                    self.paths.save_dir, self.name, cycle, self.tcfg.epoch_ratio[0],
                    host_vars,
                    meta={"version": aod_meh_hua_tpu.__version__,
                          "CLASSES": list(VOC_CLASSES), "cycle": cycle,
                          "n_labeled": int(len(x_l)),
                          "family": getattr(self.cfg, "family", "retinanet"),
                          "env": collect_env()},
                )

            if cycle != self.al.cycles[-1]:
                self.log("  scoring pool ...")
                t0 = time.time()
                if self.baseline == "ensemble":
                    unc, mconf = self._score_pool_ensemble(
                        state, x_l, cycle, runs)
                else:
                    sidx, svars, smesh = self._sweep_setup(
                        self.pool, self._variables(state))
                    loader = EvalLoader(
                        self.pool, sidx, self.pipeline,
                        batch_size=self.al.score_batch_size,
                        cache=self._canvas_cache("pool", self.pool))
                    unc, mconf = score_pool(
                        self.model, svars, self.cfg, loader,
                        len(self.pool), rng=self.rng,
                        steps=self._score_steps_cache(), mesh=smesh,
                    )
                if self.proc_count > 1 and (self.baseline == "ensemble"
                                            or self.cfg.hua.pool != "Random"):
                    from ..parallel import allgather_sum

                    unc = allgather_sum(unc)
                    mconf = allgather_sum(mconf)
                dt = time.time() - t0
                self.log(f"  pool scored: {len(self.pool)} imgs in {dt:.1f}s "
                         f"({len(self.pool) / dt:.1f} img/s)")
                x_l, x_u = update_labeled_set(
                    unc, x_all, x_l, self.al.x_s_size, self.rng,
                    zero_rate=self.al.zero_rate, max_conf=mconf,
                    use_max_conf=self.al.use_max_conf,
                )
                if self.is_main:
                    save_cycle_state(self.paths.work_dir, cycle + 1, x_l, x_u, unc)
        return self.metrics

    def _score_steps_cache(self):
        if self.cfg.hua.pool == "Random":
            return None
        if not self._score_steps:
            import dataclasses

            from ..engine.score import make_score_step

            score_model, score_cfg = self.model, self.cfg
            if self.al.int8_scoring:
                # int8-PTQ backbone for the pool sweep only: same param
                # tree (models/quant.py), so the trained variables feed
                # both programs; eval/train keep compute_dtype
                if getattr(self.cfg, "family", "retinanet") != "retinanet":
                    raise ValueError(
                        "int8_scoring is a RetinaNet-backbone mode "
                        f"(family={getattr(self.cfg, 'family', '?')!r})")
                from ..models import build_retinanet

                score_cfg = dataclasses.replace(self.cfg, backbone_int8=True)
                score_model = build_retinanet(score_cfg)
            for o in ORIENTATIONS:
                self._score_steps[o] = make_score_step(
                    score_model, score_cfg.for_orientation(o))
        return self._score_steps
