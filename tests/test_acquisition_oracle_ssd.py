"""SSD acquisition-parity oracle at REAL SSD300 geometry.

The softmax-family sibling of test_acquisition_oracle.py: identical
synthetic head outputs — the full 8732-anchor / 6-level / 21-column
(explicit background) SSD300 geometry, background-dominated softmax
distributions with planted object clusters, binding nms_pre caps on the
first two levels (5776/2166 -> 1000) — fed through:

  (a) the production jitted SSD scoring composition
      (engine/score.py make_output_scorer on SSDConfig: per-level
      fg-ranked topk -> SSD-coder decode -> NMS on background-stripped
      scores -> membership -> Dirichlet MI over all 21 columns -> HUA),
  (b) tests/reference_oracle.py score_image_ssd, a float64 numpy
      transcription of the My_L_ssd_head chain
      (My_L_ssd_head.py:317-543, ignoreBG=False),

asserting per-image score agreement, exact-zero-set identity, rank
agreement, and selection-set parity through update_X_L at the SSD
driver's zeroRate=0.15 (train_SSD.py:42). The SSD-specific semantics
this pins down (all verified against the reference source):

  * top-k ranking by FOREGROUND max while the Dirichlet and the class
    cells use ALL columns including background (a background 'class'
    cell is legal);
  * the per-level skip gates on the full-map FOREGROUND max (:446) but
    the per-anchor pair gate on the ALL-column max (:464) — an
    asymmetry that background-dominated softmax rows make observable
    (bg prob ~0.9 passes the pair gate, fails the level skip);
  * getMaxConf over ALL columns (SSD maxconf ~= the background prob);
  * NMS at the live Config_SSD.py thresholds (0.02/0.5/200).

Pool size is ORACLE_POOL_SSD (default 256; the oracle's python NMS and
the 8732-anchor full-map softmax bound the runtime, not the jit).
"""

import os

import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import SSDConfig
from aod_meh_hua_tpu.engine.score import make_output_scorer
from aod_meh_hua_tpu.engine.postprocess import make_candidate_selector
from aod_meh_hua_tpu.data.splits import update_labeled_set

import reference_oracle as oracle

CFG = SSDConfig()  # full SSD300 geometry; the model itself is not run
POOL = int(os.environ.get("ORACLE_POOL_SSD", "256"))
BATCH = 32
X_S_SIZE = max(8, POOL // 40)
ZERO_RATE = 0.15  # train_SSD.py:42

# background logit offset: e^5.5 ~= 245 vs 20 unit-scale foreground
# columns puts noise fg probs ~3.4 effective sigma below the 0.02 NMS
# threshold (fg AND bg noise both move the softmax ratio), so ~20-60
# (anchor, class) pairs/image pass and the static 1000-candidate NMS
# cap stays far from binding (at 5.0 the measured max was 654 — hot
# enough to graze the cap's comfort margin); planted objects (+6-9 on
# one fg logit) reach ~0.85 > every 0.3 gate.
BG_LOGIT = 5.5


def _gen_image(seed: int):
    """Synthetic SSD head outputs for one pool image. ~35% of images get
    no objects (exact-zero HUA scores, exercising zeroRate)."""
    rng = np.random.RandomState(300_000 + seed)
    bounds = CFG.level_bounds()
    a_total = bounds[-1][1]
    c = CFG.cls_out_channels  # 21 incl. background
    logits = (rng.randn(a_total, c) * 0.35).astype(np.float32)
    logits[:, -1] += BG_LOGIT
    deltas = (rng.randn(a_total, 4) * 0.15).astype(np.float32)
    lams = (np.abs(rng.randn(a_total)) * 0.8 + 0.2).astype(np.float32)

    feats = CFG.featmap_sizes()
    gen = CFG.build_anchor_generator()
    n_obj = rng.poisson(1.2)
    for _ in range(n_obj):
        lvl = rng.choice(len(bounds), p=[0.4, 0.3, 0.15, 0.08, 0.05, 0.02])
        h, w = feats[lvl]
        na = gen.num_base_anchors[lvl]
        y, x = rng.randint(h), rng.randint(w)
        a = rng.randint(na)
        cls = rng.randint(CFG.num_classes)
        boost = rng.uniform(6.0, 9.0)
        s0 = bounds[lvl][0]
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            yy, xx = min(y + dy, h - 1), min(x + dx, w - 1)
            idx = s0 + (yy * w + xx) * na + a
            logits[idx, cls] += boost * rng.uniform(0.75, 1.0)

    # square 300x300 warp (keep_ratio=False), non-unit per-dim rescale
    shape = np.asarray(CFG.canvas, np.int32)
    sw, sh = (0.6, 0.9) if seed % 2 == 0 else (1.25, 0.75)
    sf = np.asarray([sw, sh, sw, sh], np.float32)
    return logits, deltas, lams, shape, sf


def _jit_scores():
    step = make_output_scorer(CFG)
    uncs, confs = [], []
    for b0 in range(0, POOL, BATCH):
        imgs = [_gen_image(i) for i in range(b0, min(b0 + BATCH, POOL))]
        cls = np.stack([i[0] for i in imgs])
        del_ = np.stack([i[1] for i in imgs])
        lam = np.stack([i[2] for i in imgs])
        shp = np.stack([i[3] for i in imgs])
        sf = np.stack([i[4] for i in imgs])
        u, mc = step(cls, del_, lam, shp, sf)
        uncs.append(np.asarray(u))
        confs.append(np.asarray(mc))
    return np.concatenate(uncs), np.concatenate(confs)


def _oracle_scores(n=None):
    _, anchors = make_candidate_selector(CFG)
    bounds = CFG.level_bounds()
    lvl_anchors = [anchors[s0:s1] for (s0, s1) in bounds]
    t = CFG.test
    uncs, confs, pairs = [], [], []
    for i in range(n if n is not None else POOL):
        logits, deltas, lams, shape, sf = _gen_image(i)
        res = oracle.score_image_ssd(
            [logits[s0:s1] for (s0, s1) in bounds],
            [deltas[s0:s1] for (s0, s1) in bounds],
            [lams[s0:s1] for (s0, s1) in bounds],
            lvl_anchors, tuple(shape), sf,
            nms_pre=t.nms_pre, score_thr=t.score_thr,
            nms_iou_thr=t.nms_iou_thr, max_per_img=t.max_per_img,
            obj_score_thr=CFG.hua.obj_score_thr,
            memb_iou_thr=CFG.hua.memb_iou_thr,
            fg_score_thr=CFG.hua.fg_score_thr,
            lambda_eps=CFG.hua.lambda_eps, lambda_scale=CFG.hua.lambda_scale,
            agg=CFG.hua.agg, target_means=CFG.target_means,
            target_stds=CFG.target_stds,
        )
        uncs.append(res["unc"])
        confs.append(res["maxconf"])
        pairs.append(res["n_pairs_over_thr"])
    return np.asarray(uncs), np.asarray(confs), np.asarray(pairs)


@pytest.fixture(scope="module")
def pools():
    jit_u, jit_mc = _jit_scores()
    ora_u, ora_mc, n_pairs = _oracle_scores()
    return jit_u, jit_mc, ora_u, ora_mc, n_pairs


@pytest.mark.full
class TestSSDAcquisitionOracle:
    def test_x64_semantic_exactness(self):
        """Jitted path in float64 == float64 oracle to ~1e-12: the SSD
        composition is semantically exact, like retina's."""
        import jax as _jax

        n = 48
        _jax.config.update("jax_enable_x64", True)
        try:
            step = make_output_scorer(CFG)
            imgs = [_gen_image(i) for i in range(n)]
            u, _ = step(
                np.stack([i[0] for i in imgs]).astype(np.float64),
                np.stack([i[1] for i in imgs]).astype(np.float64),
                np.stack([i[2] for i in imgs]).astype(np.float64),
                np.stack([i[3] for i in imgs]),
                np.stack([i[4] for i in imgs]).astype(np.float64),
            )
            u = np.asarray(u)
        finally:
            _jax.config.update("jax_enable_x64", False)
        ora_u, _, _ = _oracle_scores(n=n)
        np.testing.assert_allclose(u, ora_u, atol=1e-12, rtol=0)

    def test_per_image_scores(self, pools):
        jit_u, _, ora_u, _, _ = pools
        np.testing.assert_allclose(jit_u, ora_u, atol=5e-3)

    def test_zero_sets_identical(self, pools):
        jit_u, _, ora_u, _, _ = pools
        assert (ora_u == 0).sum() > POOL // 8, "pool lost its zero regime"
        np.testing.assert_array_equal(jit_u == 0, ora_u == 0)

    def test_maxconf(self, pools):
        _, jit_mc, _, ora_mc, _ = pools
        # SSD maxconf ~= background prob: numerically tight, near-
        # degenerate across images (reference behavior, getMaxConf over
        # ALL columns)
        np.testing.assert_allclose(jit_mc, ora_mc, rtol=1e-4)
        assert ora_mc.min() > 0.5

    def test_candidate_cap_not_binding(self, pools):
        _, _, _, _, n_pairs = pools
        t = CFG.test
        assert n_pairs.max() < t.pre_nms_cands // 2, (
            f"synthetic pool too hot: {n_pairs.max()} pairs over "
            f"score_thr vs static cap {t.pre_nms_cands}")

    def test_ranking(self, pools):
        jit_u, _, ora_u, _, _ = pools
        nz = ora_u > 0
        ra = np.argsort(np.argsort(jit_u[nz])).astype(np.float64)
        rb = np.argsort(np.argsort(ora_u[nz])).astype(np.float64)
        ra -= ra.mean()
        rb -= rb.mean()
        rho = float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))
        assert rho > 0.9999, rho

    def test_fast_topk_selection_parity(self, pools):
        """test_cfg.fast_topk (approx_max_k, recall 0.99) preserves SSD
        acquisition: the approx top-k's tail-rank misses sit far below
        every behavioral threshold (0.02 NMS, 0.3 gates), so zero sets
        and the selected images must match the exact path. (On-chip the
        flag measured +1.6% on the SSD score step — docs/PERF.md — and
        stays opt-in like retina's.)"""
        import dataclasses

        jit_u, _, _, _, _ = pools
        fcfg = dataclasses.replace(
            CFG, test=dataclasses.replace(CFG.test, fast_topk=True))
        step = make_output_scorer(fcfg)
        uncs = []
        for b0 in range(0, POOL, BATCH):
            imgs = [_gen_image(i) for i in range(b0, min(b0 + BATCH, POOL))]
            u, _ = step(
                np.stack([i[0] for i in imgs]),
                np.stack([i[1] for i in imgs]),
                np.stack([i[2] for i in imgs]),
                np.stack([i[3] for i in imgs]),
                np.stack([i[4] for i in imgs]))
            uncs.append(np.asarray(u))
        fast_u = np.concatenate(uncs)
        np.testing.assert_array_equal(fast_u == 0, jit_u == 0)
        np.testing.assert_allclose(fast_u, jit_u, rtol=0.05, atol=1e-4)
        np.testing.assert_array_equal(
            np.argsort(fast_u)[-X_S_SIZE:], np.argsort(jit_u)[-X_S_SIZE:])

    def test_selection_set_parity(self, pools):
        jit_u, _, ora_u, _, _ = pools
        x_all = np.arange(POOL)
        x_l = np.arange(0)
        sel_jit = update_labeled_set(
            jit_u, x_all, x_l, X_S_SIZE, np.random.RandomState(7),
            zero_rate=ZERO_RATE)[0]
        sel_ora = oracle.update_x_l(
            ora_u, x_all, x_l, X_S_SIZE, ZERO_RATE,
            np.random.RandomState(7))
        diff = np.setxor1d(sel_jit, sel_ora)
        if diff.size:
            # only images within f32 noise of the acquisition boundary
            # may flip
            lo, hi = ora_u[diff].min(), ora_u[diff].max()
            assert hi - lo <= 5e-3, (diff, ora_u[diff])
        assert len(np.intersect1d(sel_jit, sel_ora)) >= len(sel_ora) - 2
