"""GHM (gradient harmonizing mechanism) retinanet engine.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/losses/ghm_loss.py — GHMC (binary-CE whose per-element
  weight is tot / (#elements in the same gradient-norm bin) / n_bins,
  with an EMA over bin counts) and GHMR (authentic smooth L1
  sqrt(d^2 + mu^2) - mu with the same harmonizing weights over
  g = |d / sqrt(d^2 + mu^2)|).
* configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py — plain RetinaNet
  (MaxIoU 0.5/0.4 targets, stds 1.0), GHMC(bins 30, momentum .75),
  GHMR(mu .02, bins 10, momentum .7, weight 10), grad clip 35.

TPU redesign: the reference's per-bin python loop with .item() syncs
becomes one dense bincount (scatter-add over bin indices) + gather —
no host round trips; the EMA bin counts (acc_sum buffers) live in
batch_stats as device state, exactly like BN running stats.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import anchor_targets
from .batch import Batch, ConstArg, prepare_images
from .train import TrainState

GHM_KEY = "__ghm__"


def init_ghm_state(cfg):
    return {"acc_sum_c": jnp.zeros((cfg.ghmc_bins,), jnp.float32),
            "acc_sum_r": jnp.zeros((cfg.ghmr_bins,), jnp.float32)}


def _harmonize(g, valid, bins: int, acc_sum, momentum: float):
    """Per-element GHM weights (ghm_loss.py:71-93,146-170 collapsed to
    dense ops). Returns (weights, new_acc_sum, tot)."""
    tot = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    idx = jnp.clip(jnp.floor(g * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), jnp.float32).at[
        jnp.where(valid, idx, bins - 1)].add(jnp.where(valid, 1.0, 0.0))
    nonempty = counts > 0
    n = jnp.maximum(nonempty.sum().astype(jnp.float32), 1.0)
    if momentum > 0:
        new_acc = jnp.where(nonempty,
                            momentum * acc_sum + (1 - momentum) * counts,
                            acc_sum)
        denom = new_acc
    else:
        new_acc = acc_sum
        denom = counts
    per_bin = jnp.where(nonempty, tot / jnp.maximum(denom, 1e-12), 0.0) / n
    return jnp.where(valid, per_bin[idx], 0.0), new_acc, tot


def make_ghm_train_step(model, cfg, tx) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    targets_fn = jax.vmap(
        functools.partial(
            anchor_targets, num_classes=cfg.num_classes,
            target_stds=cfg.target_stds,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=0.0),
        in_axes=(None, 0, 0, 0, 0))

    def loss_fn(params, model_stats, batch: Batch, anchors, ghm):
        variables = {"params": params, "batch_stats": model_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, deltas = model.apply(variables, images)
        t = targets_fn(anchors, batch.anchor_valid,
                       batch.gt_boxes, batch.gt_labels, batch.gt_valid)

        # ---- GHMC over [B*A, C] binary targets
        c = cfg.num_classes
        logits = cls_scores.reshape(-1, c)
        labels = t.labels.reshape(-1)
        lw = t.label_weights.reshape(-1)
        onehot = jax.nn.one_hot(jnp.where(labels < c, labels, c),
                                c + 1, dtype=jnp.float32)[:, :c]
        valid_c = (lw > 0)[:, None] & jnp.ones((1, c), bool)
        g_c = jnp.abs(jax.lax.stop_gradient(jax.nn.sigmoid(logits)) - onehot)
        w_c, acc_c, tot_c = _harmonize(g_c, valid_c, cfg.ghmc_bins,
                                       ghm["acc_sum_c"], cfg.ghmc_momentum)
        bce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        loss_cls = (bce * w_c).sum() / tot_c

        # ---- GHMR over positive rows' 4 delta channels
        mu = cfg.ghmr_mu
        diff = deltas.reshape(-1, 4) - t.bbox_targets.reshape(-1, 4)
        bw = t.bbox_weights.reshape(-1, 4)
        asl1 = jnp.sqrt(diff * diff + mu * mu) - mu
        g_r = jax.lax.stop_gradient(
            jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff)))
        w_r, acc_r, tot_r = _harmonize(g_r, bw > 0, cfg.ghmr_bins,
                                       ghm["acc_sum_r"], cfg.ghmr_momentum)
        loss_bbox = cfg.ghmr_weight * (asl1 * w_r).sum() / tot_r

        total = loss_cls + loss_bbox
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "num_pos": (bw[:, 0] > 0).sum().astype(jnp.float32),
               "_ghm": {"acc_sum_c": acc_c, "acc_sum_r": acc_r}}
        return total, aux

    def train_step(state: TrainState, batch: Batch, anchors):
        stats = dict(state.batch_stats)
        ghm = stats.pop(GHM_KEY)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, stats, batch, anchors, ghm)
        new_ghm = jax.lax.stop_gradient(aux.pop("_ghm"))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_stats = {**stats, GHM_KEY: new_ghm}
        return TrainState(state.step + 1, params, new_stats, opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: Batch):
        if GHM_KEY not in state.batch_stats:
            state = state._replace(
                batch_stats={**state.batch_stats, GHM_KEY: init_ghm_state(cfg)})
        return jfn(state, batch, anchors_arg.get(batch.images))

    return step
