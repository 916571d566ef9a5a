"""Localization Distillation (LD) engine — a GFL student distilling a
GFL teacher's box-distribution logits.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/detectors/kd_one_stage.py:11 (teacher runs no-grad on
  the same images; its head outputs feed the student loss).
* mmdet/models/dense_heads/ld_head.py:38-141 (loss_single: the full GFL
  criterion plus loss_ld = KL(student distribution || teacher
  distribution) on the POSITIVE anchors' corner rows, weighted by the
  detached max joint score and averaged by 4 per level — NOT
  re-normalized by the global avg_factor like bbox/dfl, :253-261).
* mmdet/models/losses/kd_loss.py:10-36 (temperature-T KL with the
  soft label detached, scaled by T^2).
* configs/ld/ld_r18_gflv1_r101_fpn_coco_1x.py (loss_ld weight 0.25,
  T=10; student r18, teacher r101 — both plain GFL models here, the
  teacher's variables enter the jit step as arguments).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from .gfl import make_gfl_loss_fn
from .batch import Batch, ConstArg, prepare_images
from .train import TrainState


def kd_kl_div(pred_logits, soft_logits, T: float):
    """knowledge_distillation_kl_div_loss (kd_loss.py:10): per-row KL of
    softened distributions, mean over bins, x T^2. soft detached."""
    target = jax.nn.softmax(jax.lax.stop_gradient(soft_logits) / T, axis=-1)
    logp = jax.nn.log_softmax(pred_logits / T, axis=-1)
    # F.kl_div(reduction='none') = target * (log(target) - logp)
    kl = target * (jnp.log(jnp.maximum(target, 1e-12)) - logp)
    return kl.mean(axis=-1) * (T * T)


def make_ld_train_step(model, cfg, tx, teacher_model, teacher_cfg,
                       teacher_variables) -> Callable:
    """Student GFL train step + LD distillation from a frozen teacher.

    The student loss reuses engine/gfl.py's criterion verbatim,
    including its forward pass, positive mask, and detached
    max-joint-score weights (return_outputs=True) — only the teacher
    forward and the KL term are added on top."""
    gfl_loss_fn, anchors_host, strides_host = make_gfl_loss_fn(model, cfg)
    rm = cfg.reg_max

    def ld_loss(params, batch_stats, batch: Batch, anchors, strides,
                teacher_vars):
        total, aux, (cls_scores, dist_logits, pos, w) = gfl_loss_fn(
            params, batch_stats, batch, anchors, strides,
            return_outputs=True)
        t_images = prepare_images(batch.images, batch.img_shapes,
                                  teacher_cfg)
        _, soft_logits = teacher_model.apply(
            jax.lax.stop_gradient(teacher_vars), t_images)

        pred = dist_logits.reshape(dist_logits.shape[:2] + (4, rm + 1))
        soft = soft_logits.reshape(soft_logits.shape[:2] + (4, rm + 1))
        kl = kd_kl_div(pred, soft, cfg.ld_temperature)       # [B, A, 4]
        # per-corner weight = w, avg_factor 4.0 (ld_head.py:123-128)
        loss_ld = cfg.ld_loss_weight * (kl * w[..., None]).sum() / 4.0
        total = total + loss_ld
        aux = dict(aux)
        aux["loss_ld"] = loss_ld
        aux["loss"] = total
        return total, aux

    def train_step(state: TrainState, batch: Batch, anchors, strides,
                   teacher_vars):
        grad_fn = jax.value_and_grad(ld_loss, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, strides, teacher_vars)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)
    strides_arg = ConstArg(strides_host)

    def step(state: TrainState, batch: Batch, key=None):
        return jfn(state, batch, anchors_arg.get(batch.images),
                   strides_arg.get(batch.images), teacher_variables)

    return step
