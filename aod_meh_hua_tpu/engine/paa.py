"""PAA engine: probabilistic anchor assignment with an ON-DEVICE
2-component GMM, IoU-prediction branch, and score-voting eval.

Behavioral parity targets (reference, /root/reference):
* configs/paa/paa_r50_fpn_1x_coco.py — ATSS geometry (one octave-8
  anchor/cell, stds 0.1/0.1/0.2/0.2), initial MaxIoU assign at
  pos=neg=0.1, topk 9 per (gt, level), GIoU loss weight 1.3,
  score_voting on.
* mmdet/models/dense_heads/paa_head.py:203-255 (get_pos_loss: candidate
  score = summed focal + weighted GIoU of the decoded box), :257-366
  (paa_reassign: per gt, the 9 smallest-loss candidates per level feed
  a 2-component 1-D GaussianMixture initialized at (min, max) with unit
  precisions; scheme (c): positives are the low-loss component's
  sorted-by-loss prefix up to its max-likelihood sample), :100-200
  (loss: focal avg'd by max(num_pos, B); BCE IoU branch on aligned IoU
  of the detached decoded box; GIoU weighted by that IoU and avg'd by
  its sum), :522-605 (NMS on sqrt(cls * iou_pred)), :608-670
  (score_voting: per det, candidates of its class above score_thr and
  IoU > 0.01 vote the box with exp(-(1-iou)^2/0.025) * score weights).

The reference ships each gt's candidate losses to the CPU for
sklearn.mixture.GaussianMixture; here a fixed-iteration EM (50 steps,
reg_covar 1e-6, the same (min, max) init) runs vmapped over gts inside
the jitted train step — no host round-trip. Convergence-tolerance
differences vs sklearn can flip borderline samples; the separation
scheme is otherwise identical.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import max_iou_assign
from ..ops.bbox import bbox_overlaps, delta_decode
from ..ops.losses import (
    _aligned_iou_terms,
    binary_cross_entropy_with_logits,
    giou_loss,
    sigmoid_focal_loss_elementwise,
)
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .train import TrainState

_INF = np.float32(1e30)  # host scalar: a jnp constant here would init the backend at import
EPS = 1e-12


def gmm_fit_predict_1d(x, valid, iters: int = 50, reg: float = 1e-6):
    """sklearn-equivalent 2-component 1-D GaussianMixture (full cov),
    means init (min, max), unit precisions, equal weights. Returns
    (is_component0 [K] bool, log-likelihood score [K]) over valid x."""
    n = jnp.maximum(valid.sum(), 1)
    mn = jnp.min(jnp.where(valid, x, _INF))
    mx = jnp.max(jnp.where(valid, x, -_INF))
    # padded entries carry _INF losses: (x - mu)^2 overflows and
    # 0 * inf = NaN would poison the M-step — zero them out instead
    # (their responsibilities are masked to 0 anyway)
    x = jnp.where(valid, x, 0.0)
    mu = jnp.stack([mn, mx])          # [2]
    var = jnp.ones(2)
    w = jnp.full(2, 0.5)

    def log_norm(x_, mu_, var_):
        return -0.5 * (jnp.log(2 * jnp.pi * var_)
                       + (x_ - mu_) ** 2 / var_)

    def em(_, state):
        mu, var, w = state
        logp = jnp.log(w)[None, :] + log_norm(x[:, None], mu[None, :],
                                              var[None, :])  # [K, 2]
        resp = jax.nn.softmax(logp, axis=-1)
        resp = jnp.where(valid[:, None], resp, 0.0)
        nk = resp.sum(0) + 10 * jnp.finfo(jnp.float32).eps
        mu = (resp * x[:, None]).sum(0) / nk
        var = (resp * (x[:, None] - mu[None, :]) ** 2).sum(0) / nk + reg
        w = nk / n
        return mu, var, w

    mu, var, w = jax.lax.fori_loop(0, iters, em, (mu, var, w))
    logp = jnp.log(w)[None, :] + log_norm(x[:, None], mu[None, :],
                                          var[None, :])
    pred0 = logp[:, 0] >= logp[:, 1]
    score = jax.scipy.special.logsumexp(logp, axis=-1)
    return pred0, score


def _paa_reassign_single(pos_loss, assigned, anchor_lvl, gt_valid, cfg,
                         num_levels):
    """One image: per gt, GMM-separate the per-level topk smallest-loss
    candidates; returns the final positive-anchor mask [A]."""
    a = pos_loss.shape[0]
    g = gt_valid.shape[0]
    k = cfg.paa_topk

    def per_gt(gi):
        mine = assigned == gi + 1  # [A]
        cand_losses, cand_idx = [], []
        for lvl in range(num_levels):
            m = mine & (anchor_lvl == lvl)
            vals = jnp.where(m, pos_loss, _INF)
            v, idx = jax.lax.top_k(-vals, k)
            cand_losses.append(-v)
            cand_idx.append(idx)
        losses = jnp.concatenate(cand_losses)  # [L*k]
        idx = jnp.concatenate(cand_idx)
        valid = losses < _INF
        order = jnp.argsort(losses)            # ascending, invalid last
        losses = losses[order]
        idx = idx[order]
        valid = valid[order]

        pred0, score = gmm_fit_predict_1d(losses, valid)
        fg = pred0 & valid
        # scheme (c): keep the fg prefix up to the max-score fg sample
        fg_rank = jnp.cumsum(fg) - 1
        best = jnp.argmax(jnp.where(fg, score, -_INF))
        keep = fg & (fg_rank <= fg_rank[best]) & jnp.any(fg)
        # fewer than 2 candidates: the reference skips the gt entirely
        keep = keep & (valid.sum() >= 2) & gt_valid[gi]
        return jnp.zeros((a,), bool).at[jnp.where(keep, idx, a)].set(
            True, mode="drop")

    masks = jax.vmap(per_gt)(jnp.arange(g))
    return masks.any(axis=0)


def _paa_targets_single(anchors, anchor_valid, gt_boxes, gt_labels, gt_valid,
                        cls_scores, bbox_preds, anchor_lvl, cfg, num_levels):
    """Initial loose MaxIoU assign -> candidate losses -> GMM reassign."""
    assigned = max_iou_assign(
        anchors, gt_boxes, gt_valid, anchor_valid=anchor_valid,
        pos_iou_thr=0.1, neg_iou_thr=0.1, min_pos_iou=0.0)
    pos = assigned > 0
    gt_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
    matched = gt_boxes[gt_idx]
    labels = jnp.where(pos, gt_labels[gt_idx], cfg.num_classes).astype(jnp.int32)

    decoded = delta_decode(anchors, bbox_preds, means=cfg.target_means,
                           stds=cfg.target_stds)
    loss_cls = sigmoid_focal_loss_elementwise(
        cls_scores, labels, gamma=cfg.focal_gamma,
        alpha=cfg.focal_alpha).sum(-1)
    loss_box = giou_loss(decoded, matched, reduction="none",
                         loss_weight=cfg.giou_loss_weight)
    pos_loss = jnp.where(pos, loss_cls + loss_box, _INF)

    final_pos = _paa_reassign_single(pos_loss, assigned, anchor_lvl,
                                     gt_valid, cfg, num_levels)
    labels = jnp.where(final_pos, labels, cfg.num_classes)
    return labels, jnp.where(final_pos[:, None], matched, 0.0), final_pos


def make_paa_loss_fn(model, cfg):
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    bounds = cfg.level_bounds()
    lvl_host = np.concatenate([
        np.full(s1 - s0, i, np.int32) for i, (s0, s1) in enumerate(bounds)])
    targets_fn = jax.vmap(
        functools.partial(_paa_targets_single, cfg=cfg,
                          num_levels=len(bounds)),
        in_axes=(None, 0, 0, 0, 0, 0, 0, None))

    def loss_fn(params, batch_stats, batch: Batch, anchors, anchor_lvl):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bbox_preds, iou_preds = model.apply(variables, images)
        bbox_preds = bbox_preds.astype(jnp.float32)
        labels, bbox_t, pos = targets_fn(
            anchors, batch.anchor_valid, batch.gt_boxes, batch.gt_labels,
            batch.gt_valid, jax.lax.stop_gradient(cls_scores),
            jax.lax.stop_gradient(bbox_preds), anchor_lvl)
        num_pos = pos.sum().astype(jnp.float32)
        b = cls_scores.shape[0]

        elem = sigmoid_focal_loss_elementwise(
            cls_scores, labels, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)
        loss_cls = elem.sum() / jnp.maximum(num_pos, b)

        decoded = delta_decode(anchors[None], bbox_preds,
                               means=cfg.target_means, stds=cfg.target_stds)
        iou_t, _, _ = _aligned_iou_terms(
            jax.lax.stop_gradient(decoded), bbox_t, 1e-6)
        iou_t = jnp.where(pos, iou_t, 0.0)
        loss_iou = (binary_cross_entropy_with_logits(
            iou_preds, iou_t, reduction="none")
            * pos).sum() / jnp.maximum(num_pos, 1.0)
        loss_bbox = giou_loss(
            decoded, bbox_t, weight=jnp.where(pos, jnp.clip(iou_t, EPS), 0.0),
            reduction="sum", loss_weight=cfg.giou_loss_weight,
        ) / jnp.maximum(jnp.where(pos, iou_t, 0.0).sum(), 1e-6)

        total = loss_cls + loss_bbox + loss_iou
        aux = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox,
               "loss_iou": loss_iou, "num_pos": num_pos}
        return total, aux

    return loss_fn, anchors_host, lvl_host


def make_paa_train_step(model, cfg, tx) -> Callable:
    loss_fn, anchors_host, lvl_host = make_paa_loss_fn(model, cfg)

    def train_step(state: TrainState, batch: Batch, anchors, lvl):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, lvl)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)
    lvl_arg = ConstArg(lvl_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, anchors_arg.get(batch.images),
                   lvl_arg.get(batch.images))

    return step


def score_vote(dets, cand_boxes, cand_scores, score_thr):
    """Vectorized score_voting (paa_head.py:608-670): each kept det's
    box becomes the weighted mean of same-class candidates with
    IoU > 0.01, weights exp(-(1-iou)^2/0.025) * candidate nms score."""
    ious = bbox_overlaps(dets.boxes, cand_boxes)  # [K, N]
    # (k, n) -> candidate n's nms score for det k's class
    same_cls = cand_scores[jnp.arange(cand_scores.shape[0])[None, :],
                           dets.labels[:, None]]
    ok = (ious > 0.01) & (same_cls > score_thr)
    pis = jnp.where(ok, jnp.exp(-(1 - ious) ** 2 / 0.025) * same_cls, 0.0)
    denom = jnp.maximum(pis.sum(-1, keepdims=True), 1e-12)
    voted = (pis[..., None] * cand_boxes[None]).sum(1) / denom
    boxes = jnp.where((pis.sum(-1) > 0)[:, None] & dets.valid[:, None],
                      voted, dets.boxes)
    return dets._replace(boxes=boxes)


def make_paa_eval_step(model, cfg) -> Callable:
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    t = cfg.test

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bbox_preds, iou_preds = model.apply(variables, images)
        probs = jax.nn.sigmoid(cls_scores)
        iou_p = jax.nn.sigmoid(iou_preds)
        # NMS on sqrt(cls * iou_pred) (paa_head.py:586-588)
        nms_scores = jnp.sqrt(jnp.clip(probs * iou_p[..., None], 0.0, None))

        bounds = cfg.level_bounds()
        scs, bxs = [], []
        for (s0, s1) in bounds:
            sc = nms_scores[:, s0:s1]
            pr = bbox_preds[:, s0:s1].astype(jnp.float32)
            anc = anchors[s0:s1]
            if s1 - s0 > t.nms_pre:
                key = sc.max(axis=-1)
                _, idx = jax.lax.top_k(key, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                pr = jnp.take_along_axis(pr, idx[..., None], axis=1)
                anc = anc[idx]
            else:
                anc = jnp.broadcast_to(anc[None], pr.shape)
            boxes = delta_decode(anc, pr, means=cfg.target_means,
                                 stds=cfg.target_stds,
                                 max_shape=batch.img_shapes)
            scs.append(sc)
            bxs.append(boxes)
        scores = jnp.concatenate(scs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1) / batch.scale_factors[:, None, :]
        dets = batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)
        if cfg.score_voting:
            dets = jax.vmap(functools.partial(score_vote,
                                              score_thr=t.score_thr))(
                dets, boxes, scores)
        return dets

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
