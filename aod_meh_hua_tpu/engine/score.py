"""Pool-scoring engine: the framework's signature path, fully on-device.

Behavioral parity targets (reference, /root/reference):
* mmdet/apis/test.py:90-135 (single_gpu_uncertainty driving the pool)
* mmdet/models/dense_heads/Lambda_L2.py:254-384 (_get_bboxes isUnc
  routing), :343-349 (GetObjectIdx), :489-537 (ComputeObjUnc),
  :597-619 (AggregateObjScaleUnc), :539-569/:636-691 (scale variants)
* mmdet/utils/functions.py:467-476 (getMaxConf)

The reference's scoring loop is host-bound: python triple loops with a
device sync per dict entry (SURVEY.md section 3.2). Here ONE jit region
per batch computes forward -> topk -> decode -> NMS -> membership ->
closed-form Dirichlet MI -> HUA aggregation and emits a single [B]
score vector (+ [B] max-confidence), so the whole 16k-image pool sweep
is device-resident compute with one scalar readback per batch.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.dirichlet import dirichlet_mi_sampled, dirichlet_mutual_information
from ..ops.hua import hua_object_scores, hua_scale_scores, object_membership, parse_agg_spec
from ..ops.nms import batched_multiclass_nms
from ..utils.config import RetinaNetConfig
from .batch import EvalBatch, prepare_images, ConstArg
from .jit_options import score_step_compiler_options
from .postprocess import make_candidate_selector


def _mi_fn(cfg: RetinaNetConfig, key: Optional[jax.Array]):
    """Closed-form MI by default; seeded Monte-Carlo in parity mode.

    In sampled mode the key is shared across the vmapped batch lanes —
    each image's concentrations differ so the draws still differ; the
    estimator stays unbiased per image."""
    if cfg.hua.mi_mode == "sampled":
        assert key is not None, "sampled MI mode needs a PRNG key"
        return functools.partial(
            dirichlet_mi_sampled, key, num_samples=cfg.hua.mi_samples, chunk=cfg.hua.mi_chunk
        )
    return dirichlet_mutual_information


def make_nms_output_core(cfg: RetinaNetConfig, select) -> Callable:
    """The Entropy_NMS scoring core operating on raw head OUTPUTS:
    (cls_scores [B, A, C], bbox_preds [B, A, 4], lambdas [B, A],
    img_shapes [B, 2], scale_factors [B, 4], anchors [A, 4], key) ->
    (unc [B], maxconf [B]).

    Shared by make_score_step (after the model forward) and by
    make_output_scorer (the acquisition-parity oracle entry, which feeds
    synthetic head outputs to exercise topk -> decode -> NMS ->
    membership -> Dirichlet MI -> HUA exactly as production composes
    them — reference chain Lambda_L2.py:254-384 -> :489-537 -> :597-619).
    """
    agg = parse_agg_spec(cfg.hua.agg)
    hua = cfg.hua
    t = cfg.test
    unc_type = {"epistemic": "epistemic", "aleatoric": "aleatoric", "total": "total",
                "shannon": "total"}[hua.unc_type.lower()]

    def core(cls_scores, bbox_preds, lambdas, img_shapes, scale_factors,
             anchors, key: Optional[jax.Array] = None):
        cand = select(anchors, cls_scores, bbox_preds, lambdas, img_shapes)
        # getMaxConf comes from the selector's per-level max (no second
        # full-map softmax pass; ranking-identical, see Candidates.max_prob)
        maxconf = cand.max_prob
        # the reference pool sweep runs rescale=True (apis/test.py:115);
        # membership IoUs are scale-invariant but we match exactly
        boxes = cand.boxes / scale_factors[:, None, :]
        cand = cand._replace(boxes=boxes)
        fg_scores = cand.scores[..., : cfg.num_fg_classes]
        dets = batched_multiclass_nms(
            cand.boxes, fg_scores, t.score_thr, t.nms_iou_thr, t.max_per_img,
            t.pre_nms_cands, fast_topk=getattr(t, "fast_topk", False)
        )
        member = jax.vmap(
            functools.partial(object_membership, score_thr=hua.obj_score_thr, iou_thr=hua.memb_iou_thr)
        )(cand.boxes, dets.boxes, dets.scores, dets.valid)
        unc = jax.vmap(
            functools.partial(
                hua_object_scores,
                level_bounds=cand.bounds, agg=agg,
                fg_score_thr=hua.fg_score_thr, lambda_eps=hua.lambda_eps,
                lambda_scale=hua.lambda_scale, unc_type=unc_type, mi_fn=_mi_fn(cfg, key),
                num_fg_classes=cfg.num_fg_classes,
                agg_order=getattr(hua, "agg_order", "class_first"),
                cls_weight=getattr(hua, "cls_weight", False),
            )
        )(cand.scores, cand.lambdas, member)
        return unc, maxconf

    return core


def make_output_scorer(cfg: RetinaNetConfig) -> Callable:
    """Jitted Entropy_NMS scorer over raw head outputs (no model forward).

    Returns step(cls_scores [B, A, C], bbox_preds [B, A, 4], lambdas
    [B, A], img_shapes [B, 2] int32, scale_factors [B, 4], key=None) ->
    (unc [B], maxconf [B]). Drives the EXACT production composition the
    pool sweep uses; exists so the acquisition-parity oracle can compare
    it against a dynamic-shape numpy transcription of the reference at
    pool scale (tests/reference_oracle.py).
    """
    select, anchors_host = make_candidate_selector(cfg)
    core = make_nms_output_core(cfg, select)
    jfn = jax.jit(core,
                  compiler_options=score_step_compiler_options())
    anchors_arg = ConstArg(anchors_host)

    def step(cls_scores, bbox_preds, lambdas, img_shapes, scale_factors,
             key: Optional[jax.Array] = None):
        anchors = anchors_arg.get(cls_scores)
        if key is not None:
            return jfn(cls_scores, bbox_preds, lambdas, img_shapes,
                       scale_factors, anchors, key)
        return jfn(cls_scores, bbox_preds, lambdas, img_shapes,
                   scale_factors, anchors)

    return step


def make_scale_core(cfg: RetinaNetConfig) -> Callable:
    """The Entropy_ALL / Entropy_NoNMS scoring core on raw head outputs:
    (cls_scores [B, A, C] raw logits over the FULL maps, lambdas [B, A]
    or None, key) -> unc [B]. Entropy_ALL rescales alphas by the
    full-map lambda mean (ComputeScaleUnc, Lambda_L2.py:539-569);
    Entropy_NoNMS passes no L_scores. Shared by make_score_step and
    make_scale_output_scorer (the pool-scale oracle entry)."""
    agg = parse_agg_spec(cfg.hua.agg)
    hua = cfg.hua
    unc_type = {"epistemic": "epistemic", "aleatoric": "aleatoric", "total": "total",
                "shannon": "total"}[hua.unc_type.lower()]
    full_bounds = cfg.level_bounds()

    def core(cls_scores, lambdas, key: Optional[jax.Array] = None):
        mi = _mi_fn(cfg, key)
        with_lambda = lambdas is not None

        def per_image(cls_i, lam_i):
            levels = [jax.nn.softmax(cls_i[s0:s1], axis=-1) for (s0, s1) in full_bounds]
            lams = None
            if with_lambda:
                lams = [lam_i[s0:s1] for (s0, s1) in full_bounds]
            return hua_scale_scores(
                levels, lams, agg, fg_score_thr=hua.fg_score_thr,
                lambda_eps=hua.lambda_eps, lambda_scale=hua.lambda_scale,
                unc_type=unc_type, mi_fn=mi,
                # FG gate over foreground columns only: a no-op for the
                # retina family (no background column) but REQUIRED for
                # SSD, whose softmax includes background at ~0.9 —
                # gating on all columns would enable every level
                # (My_L_ssd_head.py:493 uses alphas[:, :-1])
                num_fg_classes=cfg.num_fg_classes,
            )

        lam_arg = lambdas if with_lambda else jnp.zeros_like(cls_scores[..., 0])
        return jax.vmap(per_image)(cls_scores, lam_arg)

    return core


def make_scale_output_scorer(cfg: RetinaNetConfig) -> Callable:
    """Jitted Entropy_ALL / Entropy_NoNMS scorer over raw head outputs
    (no model forward) — the scale-variant sibling of make_output_scorer,
    driving hua_scale_scores through the EXACT production composition so
    the acquisition oracle can compare it against a numpy transcription
    of ComputeScaleUnc + AggregateScaleUnc at pool scale
    (Lambda_L2.py:539-569 + :636-691). Returns step(cls_scores [B, A, C],
    lambdas [B, A] or None, key=None) -> unc [B]."""
    core = make_scale_core(cfg)
    with_lam = jax.jit(lambda c, l, *k: core(c, l, *k),
                       compiler_options=score_step_compiler_options())
    no_lam = jax.jit(lambda c, *k: core(c, None, *k),
                     compiler_options=score_step_compiler_options())

    def step(cls_scores, lambdas=None, key: Optional[jax.Array] = None):
        extra = (key,) if key is not None else ()
        if lambdas is None:
            return no_lam(cls_scores, *extra)
        return with_lam(cls_scores, lambdas, *extra)

    return step


def make_score_step(model, cfg: RetinaNetConfig) -> Callable:
    """Returns score_step(variables, batch, key=None) -> (unc [B], maxconf [B]).

    Dispatches on cfg.hua.pool: Entropy_NMS (HUA over NMS objects),
    Entropy_ALL / Entropy_NoNMS (scale/class aggregation over full maps;
    NoNMS applies no lambda rescale, matching the reference's pathway
    that passes no L_scores). 'Random' is host-side (al/uncertainty.py).
    """
    select, anchors_host = make_candidate_selector(cfg)
    hua = cfg.hua
    nms_core = make_nms_output_core(cfg, select)
    scale_core = make_scale_core(cfg)

    def _maxconf(cls_scores: jnp.ndarray) -> jnp.ndarray:
        # getMaxConf: per-image max softmax probability over every level
        probs = jax.nn.softmax(cls_scores, axis=-1)
        return probs.reshape(probs.shape[0], -1).max(axis=-1)

    def score_nms(variables, batch: EvalBatch, anchors,
                  key: Optional[jax.Array] = None):
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bbox_preds, lambdas = model.apply(variables, images)
        return nms_core(cls_scores, bbox_preds, lambdas, batch.img_shapes,
                        batch.scale_factors, anchors, key)

    def score_scale(variables, batch: EvalBatch, anchors,
                    key: Optional[jax.Array] = None):
        with_lambda = hua.pool == "Entropy_ALL"
        images = prepare_images(batch.images, batch.img_shapes, cfg)
        cls_scores, bbox_preds, lambdas = model.apply(
            variables, images, with_meh=with_lambda
        )
        unc = scale_core(cls_scores, lambdas if with_lambda else None, key)
        return unc, _maxconf(cls_scores)

    if hua.pool == "Entropy_NMS":
        fn = score_nms
    elif hua.pool in ("Entropy_ALL", "Entropy_NoNMS"):
        fn = score_scale
    else:
        raise ValueError(f"score step does not handle pool {hua.pool!r}")
    jfn = jax.jit(fn, compiler_options=score_step_compiler_options())
    anchors_arg = ConstArg(anchors_host)

    # anchors ride as an argument, not a baked constant — see
    # make_candidate_selector's docstring for the TPU-relay rationale
    def step(variables, batch: EvalBatch, key: Optional[jax.Array] = None):
        anchors = anchors_arg.get(batch.images)
        if key is not None:
            return jfn(variables, batch, anchors, key)
        return jfn(variables, batch, anchors)

    return step
