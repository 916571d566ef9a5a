"""Training engine: one jitted step fusing the supervised + MEH phases.

Behavioral parity targets (reference, /root/reference):
* mmdet/utils/Epoch_Based_Runner_Lambda.py:20-38 — per-iter two-phase
  update: (1) main loss backward + SGD step on trunk params, (2) MEH loss
  on the *pre-update* per-anchor cls loss, backward + SGD step on the
  lambda branch only.
* mmdet/apis/train_Lambda.py:41-48 — main optimizer excludes retina_L /
  L_convs; a second SGD(lr, momentum, wd) covers exactly those.
* mmdet/models/dense_heads/Lambda_L2.py:106-121 (supervised loss_single
  incl. the unreduced loss_noR), :235-252 (MEH loss
  mean((|lambda - loss| * w)^2) * 5 per level).
* L_anchor_head.py:290-320 (loss: targets, num_total_samples = sum of
  per-image max(#pos, 1)).

TPU redesign: because the MEH branch consumes stop_gradient(features) and
regresses stop_gradient(loss_noR), the gradient of (main_loss + meh_loss)
partitions exactly as the reference's two backwards — one fused backward
pass + one optimizer update implements both phases, with the MEH target
being the pre-update loss by construction. Weight decay / momentum act
per-parameter so a single SGD chain is update-for-update identical to the
reference's two optimizers. frozen_stages is an optimizer mask.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import anchor_targets, AnchorGenerator
from ..ops.losses import (
    edl_softmax_focal_loss,
    l1_loss,
    sigmoid_focal_loss_elementwise,
)
from ..utils.config import RetinaNetConfig, TrainConfig
from .batch import Batch, prepare_images, ConstArg


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def frozen_mask(params: Any, frozen_stages: int = 1) -> Any:
    """True for params the optimizer must not touch (reference
    frozen_stages=1: ResNet stem + layer1; resnet.py:305 semantics).
    frozen_stages <= 0 freezes nothing (the SSD family)."""
    if frozen_stages <= 0:
        return jax.tree.map(lambda _: False, params)
    stem = {"conv1", "bn1"}
    layer_prefixes = tuple(f"layer{i}_" for i in range(1, frozen_stages + 1))

    def mask_path(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[0] == "backbone":
            return keys[1] in stem or keys[1].startswith(layer_prefixes)
        return False

    return jax.tree_util.tree_map_with_path(mask_path, params)


def make_optimizer(tcfg: TrainConfig, params: Any, frozen_stages: int = 1):
    """SGD(momentum, wd) in torch's exact form: buf = mu*buf + (g + wd*p);
    p -= lr*buf. The lr is injected so schedule changes don't recompile."""

    def _tx(learning_rate):
        chain = [
            optax.add_decayed_weights(tcfg.weight_decay),
            optax.trace(decay=tcfg.momentum),
        ]
        if tcfg.grad_clip:
            chain.insert(0, optax.clip_by_global_norm(tcfg.grad_clip))
        chain.append(optax.scale(-1.0))
        chain.append(optax.scale_by_learning_rate(learning_rate, flip_sign=False))
        return optax.chain(*chain)

    inner = optax.inject_hyperparams(_tx)(learning_rate=tcfg.lr)
    tx = optax.chain(inner, optax.masked(optax.set_to_zero(), frozen_mask(params, frozen_stages)))
    return tx


def set_learning_rate(opt_state, lr: float):
    """Functionally update the injected learning rate."""
    inner = opt_state[0]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(hp["learning_rate"]).dtype)
    return (inner._replace(hyperparams=hp),) + tuple(opt_state[1:])


def schedule_lr(tcfg: TrainConfig, outer_epoch: int, inner_epoch: int) -> float:
    """The driver's effective schedule (tools/train_RetinaNet.py:179-200):
    lr reset to base each outer epoch; x0.1 step at lr_step_epoch of the
    final outer epoch only."""
    lr = tcfg.lr
    if outer_epoch == tcfg.outer_epoch - 1 and inner_epoch >= tcfg.lr_step_epoch:
        lr = lr * 0.1
    return lr


def create_train_state(model, variables, tcfg: TrainConfig, frozen_stages: int = 1):
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if getattr(tcfg, "optimizer", "sgd") == "adamw_deform":
        # AdamW + the deformable-DETR custom_keys lr_mults
        from .deformable_detr import make_deformable_detr_optimizer

        tx = make_deformable_detr_optimizer(tcfg, params, frozen_stages)
    elif getattr(tcfg, "optimizer", "sgd") == "adamw":
        from .detr import make_detr_optimizer

        tx = make_detr_optimizer(tcfg, params, frozen_stages)
    else:
        tx = make_optimizer(tcfg, params, frozen_stages)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats, opt_state), tx


def _meh_regression(lam: jnp.ndarray, target: jnp.ndarray, w: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Per-level MEH loss (Lambda_L2.py:235-252 and the L1/MSLE ablations)."""
    lam = lam + 1e-9
    if kind == "l2":
        return jnp.mean((jnp.abs(lam - target) * w) ** 2) * 5.0
    if kind == "l1":
        return jnp.mean(jnp.abs(lam - target) * w)
    if kind == "msle":
        return jnp.mean(jnp.abs(jnp.log(lam + 1.0) - jnp.log(target + 1.0)) * w)
    raise ValueError(kind)


def _make_targets_fn(cfg):
    return jax.vmap(
        functools.partial(
            anchor_targets,
            num_classes=cfg.num_classes,
            target_means=cfg.target_means,
            target_stds=cfg.target_stds,
            pos_iou_thr=cfg.pos_iou_thr,
            neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou,
            gt_max_assign_all=cfg.gt_max_assign_all,
        ),
        in_axes=(None, 0, 0, 0, 0),
    )


def make_loss_fn(model, cfg):
    """Family dispatch: EDL-focal Retina loss or OHEM-CE SSD loss."""
    if getattr(cfg, "family", "retinanet") == "ssd":
        return make_ssd_loss_fn(model, cfg)
    return make_retina_loss_fn(model, cfg)


def make_retina_loss_fn(model, cfg: RetinaNetConfig):
    gen = cfg.build_anchor_generator()
    # the anchor table must reach the jitted step as an ARGUMENT, not a
    # closure constant (see postprocess.make_candidate_selector)
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    bounds = cfg.level_bounds()
    targets_fn = _make_targets_fn(cfg)

    def loss_fn(params, batch_stats, batch: Batch, anchors):
        variables = {"params": params, "batch_stats": batch_stats}
        cls_scores, bbox_preds, lambdas = model.apply(
            variables, prepare_images(batch.images, batch.img_shapes, cfg))
        t = targets_fn(anchors, batch.anchor_valid, batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        num_total = t.num_pos.sum().astype(jnp.float32)

        # classification loss family (EDL_Softmax_FocalLoss is the live
        # config; 'focal' = plain sigmoid focal, 'edl_focal' = the
        # relu-evidence variant, EDL_FocalLoss.py:31-70)
        eps = 1e-9
        if cfg.cls_loss == "edl_softmax_focal":
            prob = jax.nn.softmax(cls_scores, axis=-1)
            pseudo = jnp.log(prob / (1.0 - prob + eps) + eps)
        elif cfg.cls_loss == "edl_focal":
            conc = jax.nn.relu(cls_scores) + 1.0
            p = conc / conc.sum(axis=-1, keepdims=True)
            pseudo = jnp.log(p / (1.0 - p + eps) + eps)
        elif cfg.cls_loss == "focal":
            pseudo = cls_scores
        else:
            raise ValueError(f"unknown cls_loss {cfg.cls_loss!r}")
        elem = sigmoid_focal_loss_elementwise(
            pseudo, t.labels, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha
        )  # [B, A, C]
        loss_cls = (elem * t.label_weights[..., None]).sum() / num_total
        # unreduced per-anchor loss (the MEH regression target, loss_noR)
        loss_nor = jax.lax.stop_gradient(elem.sum(axis=-1))  # [B, A]

        loss_bbox = (jnp.abs(bbox_preds - t.bbox_targets) * t.bbox_weights).sum() / num_total

        loss_meh = jnp.zeros((), jnp.float32)
        if lambdas is not None:
            w = t.bbox_weights[..., 0]  # Lambda_L2.py:237 uses bbox weights
            for (s0, s1) in bounds:
                loss_meh = loss_meh + _meh_regression(
                    lambdas[:, s0:s1], loss_nor[:, s0:s1], w[:, s0:s1], cfg.meh_loss
                )

        total = loss_cls + loss_bbox + loss_meh
        aux = {
            "loss": total,
            "loss_cls": loss_cls,
            "loss_bbox": loss_bbox,
            "loss_meh": loss_meh,
            "num_pos": num_total,
        }
        return total, aux

    return loss_fn, anchors_host


def make_ssd_loss_fn(model, cfg):
    """SSD supervised + MEH loss.

    Mirrors My_L_ssd_head.py:182-233 (per-image OHEM cross-entropy with
    neg:pos = neg_pos_ratio, smooth-L1 bbox loss, weighted unreduced
    loss_noR) and :217-224 (MEH: per-image mean((|lambda - loss|)^2) * 2,
    UNWEIGHTED — the runner never passes mineW).
    """
    from ..ops.losses import softmax_cross_entropy

    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    targets_fn = _make_targets_fn(cfg)
    c = cfg.num_classes

    def loss_fn(params, batch_stats, batch: Batch, anchors):
        variables = {"params": params, "batch_stats": batch_stats}
        cls_scores, bbox_preds, lambdas = model.apply(
            variables, prepare_images(batch.images, batch.img_shapes, cfg))
        t = targets_fn(anchors, batch.anchor_valid, batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        num_total = t.num_pos.sum().astype(jnp.float32)

        ce = softmax_cross_entropy(cls_scores, t.labels, reduction="none")  # [B, A]
        ce = ce * t.label_weights
        pos = (t.labels < c) & (t.label_weights > 0)
        neg = (t.labels == c) & (t.label_weights > 0)

        def ohem_image(ce_i, pos_i, neg_i):
            num_pos = pos_i.sum()
            num_neg = jnp.minimum(cfg.neg_pos_ratio * num_pos, neg_i.sum())
            masked = jnp.where(neg_i, ce_i, -jnp.inf)
            order = jnp.argsort(-masked)  # hardest negatives first
            rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
            sel_neg = neg_i & (rank < num_neg)
            return jnp.where(pos_i, ce_i, 0.0).sum() + jnp.where(sel_neg, ce_i, 0.0).sum()

        loss_cls = jax.vmap(ohem_image)(ce, pos, neg).sum() / num_total

        diff = jnp.abs(bbox_preds - t.bbox_targets)
        beta = cfg.smoothl1_beta
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
        loss_bbox = (sl1 * t.bbox_weights).sum() / num_total

        loss_nor = jax.lax.stop_gradient(ce)  # SSD's loss_noR is the weighted CE
        loss_meh = jnp.zeros((), jnp.float32)
        if lambdas is not None:
            err = jnp.abs(lambdas + 1e-9 - loss_nor)
            if cfg.meh_weighted:
                err = err * t.bbox_weights[..., 0]
            # per-image mean over all anchors, x weight, summed over batch
            loss_meh = (err ** 2).mean(axis=1).sum() * cfg.meh_loss_weight

        total = loss_cls + loss_bbox + loss_meh
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "loss_meh": loss_meh, "num_pos": num_total}
        return total, aux

    return loss_fn, anchors_host


def make_train_step(model, cfg, tx, pin_state_shardings: bool = False) -> Callable:
    loss_fn, anchors_host = make_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, anchors):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch, anchors)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats, opt_state), aux

    anchors_arg = ConstArg(anchors_host)
    cell: dict = {}

    def _jfn(state: TrainState):
        # pin_state_shardings: emit the output state with EXACTLY the
        # input state's placement (built lazily from the first call).
        # Without the pin GSPMD re-shards a handful of leaves (e.g. BN
        # scales onto 'fsdp'), so a state re-placed from a checkpoint
        # with fsdp_spec compiles a SECOND program whose reduction
        # order differs at the last bit — breaking bit-identical
        # mid-cycle resume under ZeRO-3 (tests/test_fsdp.py). Pinning
        # makes fresh-placed and in-flight states indistinguishable.
        if "f" not in cell:
            kw = {}
            if pin_state_shardings:
                from jax.sharding import NamedSharding, PartitionSpec

                rep: dict = {}

                def leaf_sh(x):
                    sh = x.sharding
                    if isinstance(sh, NamedSharding):
                        rep.setdefault("r", NamedSharding(sh.mesh,
                                                          PartitionSpec()))
                        return sh
                    return None  # uncommitted host scalar (e.g. the lr
                    # hyperparam set_learning_rate rebuilt) — patch below

                state_sh = jax.tree.map(leaf_sh, state)
                # leaves not yet on the mesh pin to replicated: mixing a
                # SingleDeviceSharding into out_shardings trips jit's
                # device-set check against the mesh-placed arguments
                state_sh = jax.tree.map(
                    lambda s: rep["r"] if s is None else s, state_sh,
                    is_leaf=lambda s: s is None)
                kw["out_shardings"] = (state_sh, rep["r"])
            cell["f"] = jax.jit(train_step, donate_argnums=(0,), **kw)
        return cell["f"]

    # anchors ride as an argument, not a baked constant — see
    # postprocess.make_candidate_selector for the TPU-relay rationale
    def step(state: TrainState, batch: Batch):
        return _jfn(state)(state, batch, anchors_arg.get(batch.images))

    return step
