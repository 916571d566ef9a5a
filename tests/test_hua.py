"""HUA tests: the dense masked implementation is cross-checked against a
direct python transcription of the reference's ragged-dict algorithm
(Lambda_L2.py ComputeObjUnc/AggregateObjScaleUnc), with the closed-form
Dirichlet MI substituted for sampling on both sides."""

import numpy as np
import jax.numpy as jnp
import pytest

from aod_meh_hua_tpu.ops import (
    object_membership,
    hua_object_scores,
    hua_scale_scores,
    parse_agg_spec,
    dirichlet_mutual_information,
)


def _mi_np(alpha):
    from scipy.special import digamma

    alpha = np.maximum(alpha, 1e-20)
    s = alpha.sum(-1, keepdims=True)
    p = alpha / s
    total = -(p * np.log(np.maximum(p, 1e-38))).sum(-1)
    ale = -(p * (digamma(alpha + 1) - digamma(s + 1))).sum(-1)
    return total - ale


def _reference_obj_unc(scores, lam, member, bounds, spec, fg_thr=0.3, eps=1e-7):
    """Transcription of ComputeObjUnc + AggregateObjScaleUnc for one image."""
    agg = {"sum": np.sum, "avg": np.mean, "max": np.max}
    funcs = parse_agg_spec(spec)
    per_scale_obj_cls = {}  # (obj, scale) -> {cls: epi}
    for s_idx, (s0, s1) in enumerate(bounds):
        sc = scores[s0:s1]
        lm = lam[s0:s1]
        mb = member[s0:s1]
        fg = sc.max(1) > fg_thr
        pair = mb & fg[:, None]
        pos_a, pos_o = np.nonzero(pair)
        if len(pos_a) == 0:
            continue
        lam_mean = lm[pos_a].mean()
        lam_p = lam_mean / (lm + eps) * 25.0
        alpha = sc * lam_p[:, None]
        epi = _mi_np(alpha)
        pos_cls = sc.argmax(1)
        for obj in np.unique(pos_o):
            o_mask = pos_o == obj
            for cls in np.unique(pos_cls[pos_a[o_mask]]):
                sel = o_mask & (pos_cls[pos_a] == cls)
                per_scale_obj_cls.setdefault((obj, s_idx), {})[cls] = epi[pos_a[sel]].mean()
    # aggregate class -> scale -> object
    objs = sorted({o for (o, _) in per_scale_obj_cls})
    obj_vals = []
    for o in objs:
        scale_vals = []
        for s_idx in range(len(bounds)):
            d = per_scale_obj_cls.get((o, s_idx))
            if d:
                scale_vals.append(agg[funcs["class"]](np.array(list(d.values()))))
        if scale_vals:
            obj_vals.append(agg[funcs["scale"]](np.array(scale_vals)))
    return agg[funcs["object"]](np.array(obj_vals)) if obj_vals else 0.0


def _make_case(rng, a0=12, a1=8, k=5, c=6):
    bounds = [(0, a0), (a0, a0 + a1)]
    a = a0 + a1
    scores = rng.dirichlet(np.ones(c) * 0.5, size=a).astype(np.float32)
    lam = rng.uniform(0.01, 2.0, a).astype(np.float32)
    member = rng.uniform(0, 1, (a, k)) > 0.6
    return scores, lam, member, bounds


@pytest.mark.parametrize(
    "spec",
    ["objectSum_scaleMax_classSum", "objectAvg_scaleSum_classAvg", "objectMax_scaleAvg_classMax"],
)
def test_hua_object_matches_reference_transcription(rng, spec):
    scores, lam, member, bounds = _make_case(rng)
    want = _reference_obj_unc(scores, lam, member, bounds, spec)
    got = float(
        hua_object_scores(
            jnp.asarray(scores), jnp.asarray(lam), jnp.asarray(member),
            bounds, parse_agg_spec(spec),
        )
    )
    # tolerance bounded by jax's f32 digamma (~1e-4 abs per anchor);
    # the reference's own 500-sample MC noise is ~100x larger
    assert got == pytest.approx(float(want), rel=2e-2, abs=5e-4)


def _collect_obj_scale_cls(scores, lam, member, bounds, fg_thr=0.3, eps=1e-7):
    """ComputeObjUnc's raw (obj, scale) -> {cls: epi} dict for one image
    (shared by the order-ablation transcriptions below)."""
    per_scale_obj_cls = {}
    for s_idx, (s0, s1) in enumerate(bounds):
        sc, lm, mb = scores[s0:s1], lam[s0:s1], member[s0:s1]
        fg = sc.max(1) > fg_thr
        pair = mb & fg[:, None]
        pos_a, pos_o = np.nonzero(pair)
        if len(pos_a) == 0:
            continue
        lam_p = lm[pos_a].mean() / (lm + eps) * 25.0
        epi = _mi_np(sc * lam_p[:, None])
        pos_cls = sc.argmax(1)
        for obj in np.unique(pos_o):
            o_mask = pos_o == obj
            for cls in np.unique(pos_cls[pos_a[o_mask]]):
                sel = o_mask & (pos_cls[pos_a] == cls)
                per_scale_obj_cls.setdefault((obj, s_idx), {})[cls] = epi[pos_a[sel]].mean()
    return per_scale_obj_cls


def _reference_reverse_unc(scores, lam, member, bounds):
    """ChangeOrder + AggregateObjClassScaleUnc (Lambda_L2.py:571-596 +
    :621-633): per object, per class max over scales, sum over classes,
    sum over objects."""
    cells = _collect_obj_scale_cls(scores, lam, member, bounds)
    per_obj_cls = {}  # obj -> {cls: [epi over scales]}
    for (obj, _s), d in cells.items():
        for cls, epi in d.items():
            per_obj_cls.setdefault(obj, {}).setdefault(cls, []).append(epi)
    obj_vals = [
        sum(max(v) for v in by_cls.values()) for by_cls in per_obj_cls.values()
    ]
    return sum(obj_vals) if obj_vals else 0.0


def test_hua_scale_first_matches_reverse_order_transcription(rng):
    scores, lam, member, bounds = _make_case(rng)
    want = _reference_reverse_unc(scores, lam, member, bounds)
    got = float(
        hua_object_scores(
            jnp.asarray(scores), jnp.asarray(lam), jnp.asarray(member),
            bounds, parse_agg_spec("objectSum_scaleMax_classSum"),
            agg_order="scale_first",
        )
    )
    assert got == pytest.approx(float(want), rel=2e-2, abs=5e-4)
    # the ablation must actually change the answer on a case where the
    # reduction orders differ (sum-then-max vs max-then-sum)
    base = float(
        hua_object_scores(
            jnp.asarray(scores), jnp.asarray(lam), jnp.asarray(member),
            bounds, parse_agg_spec("objectSum_scaleMax_classSum"),
        )
    )
    assert got != pytest.approx(base, rel=1e-6)


def test_hua_cls_weight_matches_clsw_transcription(rng):
    """clsW (Lambda_L2.py:616-618): image score x number of distinct
    classes over every (object, scale) cell."""
    scores, lam, member, bounds = _make_case(rng)
    spec = "objectSum_scaleMax_classSum"
    cells = _collect_obj_scale_cls(scores, lam, member, bounds)
    n_cls = len({cls for d in cells.values() for cls in d})
    want = _reference_obj_unc(scores, lam, member, bounds, spec) * n_cls
    got = float(
        hua_object_scores(
            jnp.asarray(scores), jnp.asarray(lam), jnp.asarray(member),
            bounds, parse_agg_spec(spec), cls_weight=True,
        )
    )
    assert n_cls > 1  # the weighting must be exercised
    assert got == pytest.approx(float(want), rel=2e-2, abs=5e-4)


def test_hua_scale_first_empty_scores_zero(rng):
    scores = np.full((10, 6), 0.01, dtype=np.float32)
    lam = rng.uniform(0.1, 1.0, 10).astype(np.float32)
    member = np.ones((10, 3), dtype=bool)
    got = float(
        hua_object_scores(
            jnp.asarray(scores), jnp.asarray(lam), jnp.asarray(member),
            [(0, 10)], parse_agg_spec("objectSum_scaleMax_classSum"),
            agg_order="scale_first", cls_weight=True,
        )
    )
    assert got == 0.0


def test_hua_empty_image_scores_zero(rng):
    scores = np.full((10, 6), 0.01, dtype=np.float32)  # all below fg threshold
    lam = rng.uniform(0.1, 1.0, 10).astype(np.float32)
    member = np.ones((10, 3), dtype=bool)
    got = float(
        hua_object_scores(
            jnp.asarray(scores), jnp.asarray(lam), jnp.asarray(member),
            [(0, 10)], parse_agg_spec("objectSum_scaleMax_classSum"),
        )
    )
    assert got == 0.0


def test_hua_no_membership_scores_zero(rng):
    scores, lam, member, bounds = _make_case(rng)
    member = np.zeros_like(member)
    got = float(
        hua_object_scores(
            jnp.asarray(scores), jnp.asarray(lam), jnp.asarray(member),
            bounds, parse_agg_spec("objectSum_scaleMax_classSum"),
        )
    )
    assert got == 0.0


def test_object_membership():
    cand = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=jnp.float32)
    det = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [100, 100, 110, 110]], dtype=jnp.float32)
    det_scores = jnp.asarray([0.9, 0.1, 0.5])  # second det below obj threshold
    det_valid = jnp.asarray([True, True, False])  # third det invalid
    m = np.asarray(object_membership(cand, det, det_scores, det_valid, 0.3, 0.5))
    assert m[0, 0] and not m[0, 1] and not m[1, 2]


def _reference_scale_unc(level_scores, level_lam, spec, fg_thr=0.3, eps=1e-7):
    funcs = parse_agg_spec(spec)
    agg = {"sum": np.sum, "avg": np.mean, "max": np.max}
    scale_vals = []
    for li, sc in enumerate(level_scores):
        fg = sc.max(1) > fg_thr
        if not fg.any():
            continue
        if level_lam is not None:
            lam = level_lam[li]
            lam_p = lam.mean() / (lam + eps) * 25.0
            alpha = sc * lam_p[:, None]
        else:
            alpha = sc
        epi = _mi_np(alpha)
        cls = alpha.argmax(1)
        vals = []
        for c in np.unique(cls[fg]):
            vals.append(epi[fg & (cls == c)].mean())
        scale_vals.append(agg[funcs["class"]](np.array(vals)))
    return agg[funcs["scale"]](np.array(scale_vals)) if scale_vals else 0.0


@pytest.mark.parametrize("spec", ["scaleAvg_classAvg", "scaleSum_classSum", "scaleAvg_classSum"])
def test_hua_scale_matches_reference_transcription(rng, spec):
    levels = [rng.dirichlet(np.ones(6) * 0.5, size=n).astype(np.float32) for n in (20, 9)]
    lams = [rng.uniform(0.05, 2.0, n).astype(np.float32) for n in (20, 9)]
    want = _reference_scale_unc(levels, lams, spec)
    got = float(
        hua_scale_scores([jnp.asarray(l) for l in levels], [jnp.asarray(l) for l in lams],
                         parse_agg_spec(spec))
    )
    assert got == pytest.approx(float(want), rel=2e-2, abs=5e-4)


def test_parse_agg_spec():
    d = parse_agg_spec("objectSum_scaleMax_classSum")
    assert d == {"object": "sum", "scale": "max", "class": "sum"}
    d2 = parse_agg_spec("scaleAvg_classAvg")
    assert d2 == {"scale": "avg", "class": "avg"}
    with pytest.raises(ValueError):
        parse_agg_spec("scaleFoo_classAvg")
