"""Semi-supervised (pseudo-label) training branch.

Behavioral parity target (reference, /root/reference):
* mmdet/models/dense_heads/Lambda_L2.py:122-233 — the unlabeled-batch
  loss: PER PYRAMID LEVEL and per image, anchors whose softmax max-prob
  >= 0.5 propose pseudo boxes; NMS (thr 0.5) over them yields pseudo GT;
  anchors are re-assigned to the pseudo GT (the head's MaxIoU assigner);
  bbox loss regresses the pseudo targets; classification uses pseudo
  labels with Jensen-Shannon-divergence-to-uniform weights (confident
  anchors weigh more; positives weigh 1), and the 'cR1' rescale pins the
  cls-loss magnitude to the bbox-loss value while keeping its gradient
  direction.
* mmdet/utils/Epoch_Based_Runner_Lambda.py:56-75 — the SSL epoch
  interleaves a labeled step and an unlabeled (pseudo) step; both run
  the MEH phase, the unlabeled one regressing the pseudo-label loss at
  the real-GT positive anchors (the unlabeled pool still carries VOC
  annotations in the reference's simulation).
* mmdet/utils/functions.py:224-240 (MakeWeights pad-region masking is
  subsumed by the anchor_valid masks here).

The reference drivers ship with this phase commented out
(tools/train_SSD.py:233-248); it is provided as a first-class train
step for the semi-supervised workflow.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import max_iou_assign
from ..ops.bbox import delta_decode, delta_encode
from ..ops.losses import sigmoid_focal_loss_elementwise
from ..ops.nms import multiclass_nms
from .batch import Batch, prepare_images, ConstArg
from .train import TrainState, _make_targets_fn, _meh_regression


def make_pseudo_loss_fn(model, cfg, prob_threshold: float = 0.5,
                        pseudo_nms_iou: float = 0.5, max_pseudo: int = 100):
    """Unlabeled-batch loss (Retina family)."""
    gen = cfg.build_anchor_generator()
    # argument, not closure constant — see postprocess.make_candidate_selector
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    bounds = cfg.level_bounds()
    targets_fn = _make_targets_fn(cfg)
    c = cfg.num_classes

    def level_image_loss(cls_i, reg_i, anchors, valid_i):
        """One (image, level): returns (loss_cls_raw, loss_bbox_raw,
        loss_noR [Al]) before the num_total_samples division."""
        probs = jax.nn.softmax(cls_i, axis=-1)
        conf_ok = (probs.max(axis=-1) >= prob_threshold) & valid_i
        # pseudo proposals: decode candidate anchors (no border clip,
        # Lambda_L2.py:153 decodes without max_shape)
        boxes = delta_decode(anchors, reg_i, means=cfg.target_means, stds=cfg.target_stds)
        masked_scores = jnp.where(conf_ok[:, None], probs, 0.0)
        dets = multiclass_nms(boxes, masked_scores, prob_threshold, pseudo_nms_iou,
                              max_pseudo, pre_nms_cands=min(cfg.test.pre_nms_cands,
                                                            boxes.shape[0] * c))
        assigned = max_iou_assign(
            anchors, dets.boxes, dets.valid, anchor_valid=valid_i,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou, gt_max_assign_all=cfg.gt_max_assign_all,
        )
        pos = (assigned > 0) & valid_i
        gt_idx = jnp.clip(assigned - 1, 0, max_pseudo - 1)
        pseudo_boxes = dets.boxes[gt_idx]
        pseudo_targets = delta_encode(anchors, pseudo_boxes,
                                      means=cfg.target_means, stds=cfg.target_stds, eps=1e-6)
        pseudo_targets = jax.lax.stop_gradient(jnp.where(pos[:, None], pseudo_targets, 0.0))
        loss_bbox = (jnp.abs(reg_i - pseudo_targets) * pos[:, None]).sum()

        pseudo_labels = jnp.where(pos, dets.labels[gt_idx], c)
        # JSD-to-uniform weights (Lambda_L2.py:172-184)
        uni = 1.0 / c
        logp = jnp.log(jnp.maximum(probs, 1e-30))
        kld_cu = (uni * (jnp.log(uni) - logp)).sum(axis=-1)      # KL(u || p)
        kld_uc = (probs * (logp - jnp.log(uni))).sum(axis=-1)    # KL(p || u)
        jsd = 0.5 * (kld_cu + kld_uc)
        flip = jsd.max() - jsd
        w = (flip - flip.min()) / (flip.max() - flip.min() + 1e-6)
        w = jnp.where(pos, 1.0, w)
        w = jax.lax.stop_gradient(jnp.where(valid_i, w, 0.0))

        eps = 1e-9
        pseudo_logits = jnp.log(probs / (1.0 - probs + eps) + eps)
        elem = sigmoid_focal_loss_elementwise(
            pseudo_logits, pseudo_labels, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)
        loss_cls = (elem * w[:, None]).sum()
        loss_nor = elem.sum(axis=-1)
        return loss_cls, loss_bbox, loss_nor

    def loss_fn(params, batch_stats, batch: Batch, all_anchors):
        variables = {"params": params, "batch_stats": batch_stats}
        cls_scores, bbox_preds, lambdas = model.apply(
            variables, prepare_images(batch.images, batch.img_shapes, cfg))
        # real-GT targets only feed num_total_samples + the MEH weights
        t = targets_fn(all_anchors, batch.anchor_valid, batch.gt_boxes,
                       batch.gt_labels, batch.gt_valid)
        num_total = t.num_pos.sum().astype(jnp.float32)

        loss_cls = jnp.zeros(())
        loss_bbox = jnp.zeros(())
        loss_meh = jnp.zeros(())
        for li, (s0, s1) in enumerate(bounds):
            lc, lb, lnor = jax.vmap(
                lambda ci, ri, vi: level_image_loss(ci, ri, all_anchors[s0:s1], vi)
            )(cls_scores[:, s0:s1], bbox_preds[:, s0:s1], batch.anchor_valid[:, s0:s1])
            lc = lc.sum() / num_total
            lb = lb.sum() / num_total
            # 'cR1' rescale: pin the cls magnitude to the bbox value,
            # gradient direction unchanged (Lambda_L2.py:193-195)
            both = (lb > 0) & (lc > 0)
            scale = jnp.where(both, jax.lax.stop_gradient(lb / jnp.maximum(lc, 1e-12)), 1.0)
            loss_cls = loss_cls + lc * scale
            loss_bbox = loss_bbox + lb
            if lambdas is not None:
                w = t.bbox_weights[:, s0:s1, 0]  # real-GT positive anchors
                loss_meh = loss_meh + _meh_regression(
                    lambdas[:, s0:s1], jax.lax.stop_gradient(lnor), w, cfg.meh_loss)

        total = loss_cls + loss_bbox + loss_meh
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "loss_meh": loss_meh, "num_pos": num_total}
        return total, aux

    return loss_fn, anchors_host


def make_pseudo_train_step(model, cfg, tx) -> Callable:
    """Jitted unlabeled-batch step (the second half of the reference's
    interleaved SSL iteration; pair with the regular labeled step)."""
    loss_fn, anchors_host = make_pseudo_loss_fn(model, cfg)

    def step(state: TrainState, batch: Batch, anchors):
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, anchors)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats, opt_state), aux

    jfn = jax.jit(step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def wrapped(state: TrainState, batch: Batch):
        return jfn(state, batch, anchors_arg.get(batch.images))

    return wrapped
