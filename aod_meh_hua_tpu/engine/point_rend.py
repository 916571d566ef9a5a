"""PointRend engine: coarse mask + uncertainty-sampled point training,
and subdivision-refinement eval.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/roi_heads/point_rend_roi_head.py:
  - _mask_point_forward_train (:41-60): sample train points per positive
    roi, point head on fine (FPN stride-4) + coarse per-class feats,
    BCE on the gt-class channel.
  - _get_fine_grained_point_feats (:62-85): rel-roi point ->
    feature-pixel point (rel_roi_point_to_rel_img_point), bilinear
    grid_sample with align_corners=False (pixel = p * size - 0.5).
  - _mask_point_forward_test (:87-123): iteratively x2-upsample the
    coarse mask, re-predict the subdivision_num_points most uncertain
    points, scatter the refined logits back in.
* mmdet/models/roi_heads/mask_heads/mask_point_head.py:
  - get_roi_rel_points_train (:212-265): oversample uniform points,
    keep the importance_sample_ratio most uncertain by -|logit_gt|,
    fill the rest with fresh uniform points.
  - get_roi_rel_points_test (:267-300): top-k uncertainty on the grid.
  - get_targets (:106-162): bilinear point_sample of the GT bitmap.
* SimpleRoIAlign (mask_roi_extractor: single stride-4 level, out 14).

TPU redesign notes: the reference refines all C class channels and
selects the detection's class at the end (get_seg_masks); here only the
detected class' channel is refined — pointwise identical output, C x
less memory in the subdivision loop. Point tensors are fixed-size
[N, P, C]; the per-image python loops become vmaps.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.bbox import delta_decode
from ..ops.losses import binary_cross_entropy_with_logits, softmax_cross_entropy
from ..ops.ms_deform_attn import _bilinear_zero_batch
from ..ops.nms import batched_multiclass_nms
from .batch import ConstArg, EvalBatch, prepare_images
from .mask_rcnn import MaskBatch, MaskDetections
from .train import TrainState
from .two_stage import (_extract_rois, _roi, _roi_sample_single,
                        _rpn_targets_single, _stage1, make_proposal_fn)


def simple_roi_align(feat, rois, size: int, stride: int):
    """SimpleRoIAlign: one image, [P, 4] canvas rois over feat [H, W, C]
    -> [P, size, size, C]. Each output cell is ONE bilinear sample at
    its center (point_sample with align_corners=False: feature pixel =
    canvas / stride - 0.5)."""
    u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size

    def one(roi):
        x = roi[0] + u * (roi[2] - roi[0])
        y = roi[1] + u * (roi[3] - roi[1])
        fx = x / stride - 0.5
        fy = y / stride - 0.5
        yy = jnp.repeat(fy, size)
        xx = jnp.tile(fx, size)
        vals = _bilinear_zero_batch(feat, yy, xx)
        return vals.reshape(size, size, -1)

    return jax.vmap(one)(rois)


def _sample_points(feat, rois, rel_points, stride: int):
    """Fine-grained point feats for one image: feat [H, W, C], rois
    [P, 4], rel_points [P, N, 2] (x, y in [0, 1] roi coords) ->
    [P, N, C]."""
    def one(roi, pts):
        x = roi[0] + pts[:, 0] * (roi[2] - roi[0])
        y = roi[1] + pts[:, 1] * (roi[3] - roi[1])
        return _bilinear_zero_batch(feat, y / stride - 0.5, x / stride - 0.5)

    return jax.vmap(one)(rois, rel_points)


def _sample_coarse(maps, rel_points):
    """Point-sample per-roi maps: maps [P, h, w, C], rel_points
    [P, N, 2] in [0, 1]^2 -> [P, N, C] (point_sample semantics:
    pixel = p * size - 0.5, zero padding)."""
    h, w = maps.shape[1], maps.shape[2]

    def one(m, pts):
        return _bilinear_zero_batch(m, pts[:, 1] * h - 0.5,
                                    pts[:, 0] * w - 0.5)

    return jax.vmap(one)(maps, rel_points)


def _sample_gt_raster(gt_boxes, gt_masks, gt_idx, rois, rel_points):
    """Point targets for one image: bilinear sample of the assigned
    gt's box-aligned raster at the rois' canvas points
    (mask_point_head.get_targets via the raster transport)."""
    r = gt_masks.shape[-1]

    def one(roi, box, raster, pts):
        x = roi[0] + pts[:, 0] * (roi[2] - roi[0])
        y = roi[1] + pts[:, 1] * (roi[3] - roi[1])
        bw = jnp.maximum(box[2] - box[0], 1e-3)
        bh = jnp.maximum(box[3] - box[1], 1e-3)
        xs = (x - box[0]) / bw * r - 0.5
        ys = (y - box[1]) / bh * r - 0.5
        return _bilinear_zero_batch(raster[..., None], ys, xs)[:, 0]

    return jax.vmap(one)(rois, gt_boxes[gt_idx], gt_masks[gt_idx], rel_points)


def _grid_points(size: int):
    """The [size*size, 2] (x, y) cell-center grid in [0, 1]^2."""
    u = (np.arange(size, dtype=np.float32) + 0.5) / size
    gx, gy = np.meshgrid(u, u)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def make_point_rend_train_step(model, cfg, tx) -> Callable:
    """One fused jit step: Faster R-CNN RPN + RoI losses, the coarse
    mask BCE, and the importance-sampled point BCE."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    rc = cfg.rcnn
    num_pos_cap = int(rc.sampler_num * rc.pos_fraction)
    n_pts = cfg.num_points
    n_over = int(cfg.num_points * cfg.oversample_ratio)
    n_imp = int(cfg.importance_sample_ratio * cfg.num_points)
    n_rand = n_pts - n_imp
    fine_stride = rc.roi_strides[0]
    c = cfg.num_classes
    s = cfg.mask_size
    grid = _grid_points(s)

    def _mask_fwd(m, feats):
        return m.mask_forward(feats)

    def _point_fwd(m, fine, coarse):
        return m.point_forward(fine, coarse)

    def loss_fn(params, batch_stats, batch: MaskBatch, anchors, key):
        variables = {"params": params, "batch_stats": batch_stats}
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images,
                                              method=_stage1)
        b = rpn_cls.shape[0]

        # ---- RPN + RoI losses (identical to Faster R-CNN) ----
        k_rpn, k_roi, k_pt1, k_pt2 = jax.random.split(key, 4)
        t = jax.vmap(functools.partial(_rpn_targets_single, rpn_cfg=cfg.rpn),
                     in_axes=(0, None, 0, 0, 0))(
            jax.random.split(k_rpn, b), anchors,
            batch.anchor_valid, batch.gt_boxes, batch.gt_valid)
        num_total = jnp.maximum(t.num_samples.sum().astype(jnp.float32), 1.0)
        loss_rpn_cls = (binary_cross_entropy_with_logits(
            rpn_cls, t.is_pos.astype(jnp.float32), reduction="none")
            * t.weights).sum() / num_total
        loss_rpn_bbox = (jnp.abs(rpn_reg - t.bbox_targets)
                         * t.is_pos[..., None]).sum() / num_total

        props, _, prop_valid = proposal_fn(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            anchors, batch.img_shapes,
            cfg.rpn.train_nms_pre, cfg.rpn.train_max_per_img)
        smp = jax.vmap(functools.partial(_roi_sample_single, cfg=cfg))(
            jax.random.split(k_roi, b), props, prop_valid,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid)
        roi_feats = _extract_rois(cfg, feats, smp.rois)
        cls, reg = model.apply(variables, roi_feats, method=_roi)

        labels = smp.labels.reshape(-1)
        label_w = smp.label_weights.reshape(-1)
        avg_cls = jnp.maximum((label_w > 0).sum().astype(jnp.float32), 1.0)
        loss_cls = (softmax_cross_entropy(cls, labels, reduction="none")
                    * label_w).sum() / avg_cls
        sel = jnp.clip(labels, 0, c - 1)
        reg_sel = jnp.take_along_axis(
            reg, jnp.repeat(sel[:, None, None], 4, axis=-1), axis=1)[:, 0]
        pos = smp.is_pos.reshape(-1)
        avg_reg = jnp.maximum(smp.valid.sum().astype(jnp.float32), 1.0)
        loss_bbox = (jnp.abs(reg_sel - smp.bbox_targets.reshape(-1, 4))
                     * pos[:, None]).sum() / avg_reg

        # ---- coarse mask branch on the positive prefix ----
        p = num_pos_cap
        mrois = smp.rois[:, :p]
        mgt = smp.gt_idx[:, :p]
        mfeats = jax.vmap(functools.partial(
            simple_roi_align, size=cfg.mask_roi_size,
            stride=fine_stride))(feats[0], mrois)
        mfeats = mfeats.reshape((-1,) + mfeats.shape[2:])
        coarse = model.apply(variables, mfeats, method=_mask_fwd)
        coarse = coarse.reshape(b, p, s, s, c)
        gridb = jnp.broadcast_to(jnp.asarray(grid)[None], (p,) + grid.shape)
        tvals = jax.vmap(_sample_gt_raster, in_axes=(0, 0, 0, 0, None))(
            batch.gt_boxes, batch.gt_masks, mgt, mrois, gridb)
        mtargets = (tvals.reshape(b, p, s, s) >= 0.5).astype(jnp.float32)
        mlabels = jnp.clip(smp.labels[:, :p], 0, c - 1)
        csel = jnp.take_along_axis(
            coarse, mlabels[:, :, None, None, None], axis=-1)[..., 0]
        mpos = smp.is_pos[:, :p].astype(jnp.float32)
        per_roi = binary_cross_entropy_with_logits(
            csel, mtargets, reduction="none").mean(axis=(2, 3))
        denom = jnp.maximum(mpos.sum(), 1.0)
        loss_mask = (per_roi * mpos).sum() / denom

        # ---- point branch (get_roi_rel_points_train) ----
        rnd = jax.random.uniform(k_pt1, (b * p, n_over, 2))
        cls_map = jax.lax.stop_gradient(csel).reshape(b * p, s, s, 1)
        unc = -jnp.abs(_sample_coarse(cls_map, rnd)[..., 0])
        _, top = jax.lax.top_k(unc, n_imp)
        imp_pts = jnp.take_along_axis(rnd, top[..., None], axis=1)
        rand_pts = jax.random.uniform(k_pt2, (b * p, n_rand, 2))
        pts = jnp.concatenate([imp_pts, rand_pts], axis=1)  # [B*P, n, 2]
        pts_b = pts.reshape(b, p, n_pts, 2)

        fine = jax.vmap(functools.partial(_sample_points,
                                          stride=fine_stride))(
            feats[0], mrois, pts_b)                       # [B, P, n, Cf]
        coarse_pts = _sample_coarse(coarse.reshape(b * p, s, s, c), pts)
        plogits = model.apply(variables, fine.reshape(b * p, n_pts, -1),
                              coarse_pts, method=_point_fwd)
        ptargets = jax.vmap(_sample_gt_raster)(
            batch.gt_boxes, batch.gt_masks, mgt, mrois, pts_b)
        psel = jnp.take_along_axis(
            plogits.reshape(b, p, n_pts, c),
            mlabels[:, :, None, None], axis=-1)[..., 0]
        per_roi_pt = binary_cross_entropy_with_logits(
            psel, ptargets, reduction="none").mean(axis=-1)
        loss_point = (per_roi_pt * mpos).sum() / denom

        total = (loss_rpn_cls + loss_rpn_bbox + loss_cls + loss_bbox
                 + loss_mask + loss_point)
        aux = {"loss": total, "loss_rpn_cls": loss_rpn_cls,
               "loss_rpn_bbox": loss_rpn_bbox, "loss_cls": loss_cls,
               "loss_bbox": loss_bbox, "loss_mask": loss_mask,
               "loss_point": loss_point,
               "num_pos": pos.sum().astype(jnp.float32)}
        return total, aux

    def train_step(state: TrainState, batch: MaskBatch, anchors, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.batch_stats, batch,
                                  anchors, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), aux

    jfn = jax.jit(train_step, donate_argnums=(0,))
    anchors_arg = ConstArg(anchors_host)

    def step(state: TrainState, batch: MaskBatch, key):
        return jfn(state, batch, anchors_arg.get(batch.images), key)

    return step


def refine_mask_logits(model, cfg, variables, feats, canvas_boxes, labels):
    """_mask_point_forward_test (point_rend_roi_head.py:87-123) on det
    boxes in CANVAS coordinates: coarse mask head + subdivision_steps
    rounds of x2 upsample + point-head re-prediction at the most
    uncertain grid cells, refining the det-class channel. Returns the
    refined LOGIT map [B, D, S*scale^steps, S*scale^steps]. Shared by
    the eval step and the TTA mask step (aug_test_mask,
    point_rend_roi_head.py:178-209)."""
    c = cfg.num_classes
    s = cfg.mask_size
    fine_stride = cfg.rcnn.roi_strides[0]
    scale = cfg.subdivision_scale
    b, d = canvas_boxes.shape[:2]

    def _mask_fwd(m, f):
        return m.mask_forward(f)

    def _point_fwd(m, fine, coarse):
        return m.point_forward(fine, coarse)

    mfeats = jax.vmap(functools.partial(
        simple_roi_align, size=cfg.mask_roi_size,
        stride=fine_stride))(feats[0], canvas_boxes)
    mfeats = mfeats.reshape((-1,) + mfeats.shape[2:])
    coarse = model.apply(variables, mfeats, method=_mask_fwd)
    coarse = coarse.reshape(b, d, s, s, c)
    lab = jnp.clip(labels, 0, c - 1)
    cur = jnp.take_along_axis(
        coarse, lab[:, :, None, None, None], axis=-1)[..., 0]  # [B,D,s,s]
    lab_nd = lab.reshape(b * d)

    for step_i in range(cfg.subdivision_steps):
        h0, w0 = cur.shape[2], cur.shape[3]
        h1, w1 = h0 * scale, w0 * scale
        cur = jax.image.resize(cur, (b, d, h1, w1), method="linear")
        if (cfg.subdivision_num_points >= scale * scale * h1 * w1
                and step_i < cfg.subdivision_steps - 1):
            continue
        n_ref = min(cfg.subdivision_num_points, h1 * w1)
        flat = cur.reshape(b * d, h1 * w1)
        _, idx = jax.lax.top_k(-jnp.abs(flat), n_ref)   # most uncertain
        px = ((idx % w1).astype(jnp.float32) + 0.5) / w1
        py = ((idx // w1).astype(jnp.float32) + 0.5) / h1
        pts = jnp.stack([px, py], axis=-1).reshape(b, d, n_ref, 2)
        fine = jax.vmap(functools.partial(
            _sample_points, stride=fine_stride))(
            feats[0], canvas_boxes, pts)                 # [B, D, n, Cf]
        cps = _sample_coarse(coarse.reshape(b * d, s, s, c),
                             pts.reshape(b * d, n_ref, 2))
        plogits = model.apply(
            variables, fine.reshape(b * d, n_ref, -1), cps,
            method=_point_fwd)
        lsel = jnp.take_along_axis(
            plogits, jnp.broadcast_to(lab_nd[:, None, None],
                                      (b * d, n_ref, 1)),
            axis=-1)[..., 0]                             # [B*D, n]
        flat = jax.vmap(lambda m, i, v: m.at[i].set(v))(flat, idx, lsel)
        cur = flat.reshape(b, d, h1, w1)
    return cur


def make_point_rend_eval_step(model, cfg) -> Callable:
    """Box path = Faster R-CNN eval; the coarse 7x7 det-class mask is
    then refined by `subdivision_steps` rounds of x2 upsample +
    point-head re-prediction at the most uncertain grid cells
    (_mask_point_forward_test), refining only the detected class'
    channel (pointwise identical to the reference's all-channel
    scatter followed by class selection)."""
    gen = cfg.build_anchor_generator()
    anchors_host = np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32)
    proposal_fn = make_proposal_fn(cfg)
    t = cfg.test
    c = cfg.num_classes
    s = cfg.mask_size
    fine_stride = cfg.rcnn.roi_strides[0]
    scale = cfg.subdivision_scale

    def _mask_fwd(m, feats):
        return m.mask_forward(feats)

    def _point_fwd(m, fine, coarse):
        return m.point_forward(fine, coarse)

    def eval_step(variables, batch: EvalBatch, anchors):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        feats, rpn_cls, rpn_reg = model.apply(variables, images,
                                              method=_stage1)
        props, _, prop_valid = proposal_fn(
            rpn_cls, rpn_reg, anchors, batch.img_shapes,
            cfg.rpn.test_nms_pre, cfg.rpn.test_max_per_img)
        roi_feats = _extract_rois(cfg, feats, props)
        cls, reg = model.apply(variables, roi_feats, method=_roi)
        b, p = props.shape[:2]
        probs = jax.nn.softmax(cls, axis=-1).reshape(b, p, c + 1)
        boxes = delta_decode(
            props[:, :, None, :], reg.reshape(b, p, c, 4),
            stds=cfg.rcnn.target_stds, max_shape=batch.img_shapes[:, None, :])
        boxes = boxes / batch.scale_factors[:, None, None, :]
        fg = probs[..., :c] * prop_valid[..., None]
        dets = batched_multiclass_nms(
            boxes, fg, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands)
        d = dets.boxes.shape[1]

        # coarse mask + subdivision refinement (shared helper)
        canvas_boxes = dets.boxes * batch.scale_factors[:, None, :]
        cur = refine_mask_logits(model, cfg, variables, feats,
                                 canvas_boxes, dets.labels)

        masks = jax.nn.sigmoid(cur) * dets.valid[:, :, None, None]
        return MaskDetections(dets.boxes, dets.scores, dets.labels,
                              dets.valid, dets.anchor_idx, masks)

    jfn = jax.jit(eval_step)
    anchors_arg = ConstArg(anchors_host)

    def step(variables, batch: EvalBatch):
        return jfn(variables, batch, anchors_arg.get(batch.images))

    return step
