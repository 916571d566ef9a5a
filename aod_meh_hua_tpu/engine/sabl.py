"""SABL RetinaNet engine.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/sabl_retina_head.py:
  - _get_target_single (:321-437): ApproxMaxIoU assignment on squares
    (per-square max IoU over the 9 approxes; pos .5 / neg .4 /
    min_pos 0), PseudoSampler (focal cls); positives get bucketing
    coder targets.
  - loss_single (:439-478): focal cls avg num_total_pos; bucket cls
    binary-CE weight 1.5 avg num_pos * 4*side_num; offsets smooth-L1
    beta 1/9 weight 1.5 avg num_pos * 4*offset_topk.
  - get_bboxes (:480-560): per-level top-k by max cls score, bucket
    decode, multiclass NMS with score_factors = localization
    confidence (bucketing-guided rescoring).
* core/bbox/coder/bucketing_bbox_coder.py via ops/bucketing.py.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.assigner import max_iou_assign
from ..ops.bbox import bbox_overlaps
from ..ops.bucketing import bbox2bucket, bucket2bbox
from ..ops.losses import sigmoid_focal_loss_elementwise
from ..ops.nms import batched_multiclass_nms
from .batch import Batch, ConstArg, EvalBatch, prepare_images
from .guided_anchor import _ga_tables
from .train import TrainState


def make_sabl_train_step(model, cfg, tx) -> Callable:
    squares_host, approx_host, _ = _ga_tables(cfg)
    k = cfg.approxs_per_cell
    side = cfg.side_num

    def targets_single(squares, approxes, anchor_valid, gt_boxes, gt_labels,
                       gt_valid):
        iou = bbox_overlaps(gt_boxes, approxes.reshape(-1, 4))
        iou = iou.reshape(gt_boxes.shape[0], -1, k).max(axis=-1)
        assigned = max_iou_assign(
            squares, gt_boxes, gt_valid, anchor_valid=anchor_valid,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=0.0, overlaps=iou)
        pos = (assigned > 0) & anchor_valid
        neg = (assigned == 0) & anchor_valid
        gt_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
        matched = gt_boxes[gt_idx]
        labels = jnp.where(pos, gt_labels[gt_idx],
                           cfg.num_classes).astype(jnp.int32)
        lw = jnp.where(pos | neg, 1.0, 0.0)
        off_t, off_w, buc_t, buc_w = bbox2bucket(
            squares, matched, cfg.num_buckets, cfg.bucket_scale_factor,
            cfg.offset_topk, cfg.offset_upperbound)
        m = pos[:, None].astype(jnp.float32)
        return (labels, lw, off_t * m, off_w * m, buc_t * m, buc_w * m,
                pos.sum().astype(jnp.float32))

    def loss_fn(params, batch_stats, batch: Batch, squares, approxes):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bucket_cls, bucket_reg = model.apply(variables, images)
        t = jax.vmap(targets_single, in_axes=(None, None, 0, 0, 0, 0))(
            squares, approxes, batch.anchor_valid,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        labels, lw, off_t, off_w, buc_t, buc_w, npos = t
        num_pos = jnp.maximum(jnp.maximum(npos, 1.0).sum(), 1.0)

        loss_cls = (sigmoid_focal_loss_elementwise(
            cls_scores.reshape(-1, cfg.num_classes), labels.reshape(-1))
            * lw.reshape(-1)[:, None]).sum() / num_pos

        # bucket estimation: binary CE with logits on one-hot targets
        logits = bucket_cls.reshape(-1, 4 * side)
        bt = buc_t.reshape(-1, 4 * side)
        bw = buc_w.reshape(-1, 4 * side)
        bce = jnp.maximum(logits, 0) - logits * bt + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        loss_bucket_cls = cfg.bucket_cls_weight * (bce * bw).sum() / (
            num_pos * 4 * side)

        beta = cfg.bucket_reg_beta
        diff = jnp.abs(bucket_reg.reshape(-1, 4 * side)
                       - off_t.reshape(-1, 4 * side))
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta)
        loss_bucket_reg = cfg.bucket_reg_weight * (
            sl1 * off_w.reshape(-1, 4 * side)).sum() / (
            num_pos * 4 * cfg.offset_topk)

        total = loss_cls + loss_bucket_cls + loss_bucket_reg
        aux = {"loss": total, "loss_cls": loss_cls,
               "loss_bbox_cls": loss_bucket_cls,
               "loss_bbox_reg": loss_bucket_reg, "num_pos": num_pos}
        return total, aux

    def train_step(state: TrainState, batch: Batch, squares, approxes):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  squares, approxes)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    sq_arg = ConstArg(squares_host)
    ap_arg = ConstArg(approx_host)

    def step(state: TrainState, batch: Batch):
        return jfn(state, batch, sq_arg.get(batch.images),
                   ap_arg.get(batch.images))

    return step


def make_sabl_eval_step(model, cfg) -> Callable:
    squares_host, _, _ = _ga_tables(cfg)
    bounds = cfg.level_bounds()
    t = cfg.test
    side = cfg.side_num

    def eval_step(variables, batch: EvalBatch, squares):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bucket_cls, bucket_reg = model.apply(variables, images)
        probs = jax.nn.sigmoid(cls_scores)
        b = probs.shape[0]
        scs, bxs, cfs = [], [], []
        for (s0, s1) in bounds:
            sc = probs[:, s0:s1]
            bc = bucket_cls[:, s0:s1]
            br = bucket_reg[:, s0:s1]
            anc = jnp.broadcast_to(squares[s0:s1][None],
                                   (b, s1 - s0, 4))
            n = s1 - s0
            if n > t.nms_pre:
                mx = sc.max(axis=-1)
                _, idx = jax.lax.top_k(mx, t.nms_pre)
                sc = jnp.take_along_axis(sc, idx[..., None], axis=1)
                bc = jnp.take_along_axis(bc, idx[..., None], axis=1)
                br = jnp.take_along_axis(br, idx[..., None], axis=1)
                anc = jnp.take_along_axis(anc, idx[..., None], axis=1)
            def decode_one(a, c_, r_, shp):
                return bucket2bbox(a, c_, r_, cfg.num_buckets,
                                   cfg.bucket_scale_factor, max_shape=shp)

            boxes, conf = jax.vmap(decode_one)(
                anc, bc, br, batch.img_shapes.astype(jnp.float32))
            scs.append(sc)
            bxs.append(boxes)
            cfs.append(conf)
        scores = jnp.concatenate(scs, axis=1)
        confs = jnp.concatenate(cfs, axis=1)
        boxes = jnp.concatenate(bxs, axis=1) / batch.scale_factors[:, None, :]
        # bucketing-guided rescoring: score_factors multiply cls scores
        scores = scores * confs[..., None]
        return batched_multiclass_nms(
            boxes, scores, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)

    jfn = jax.jit(eval_step)
    sq_arg = ConstArg(squares_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, sq_arg.get(batch.images))

    return step
