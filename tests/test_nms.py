import numpy as np
import jax.numpy as jnp

from aod_meh_hua_tpu.ops import multiclass_nms, batched_multiclass_nms


def test_suppression_same_class():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=jnp.float32)
    scores = jnp.zeros((3, 2)).at[0, 0].set(0.9).at[1, 0].set(0.8).at[2, 0].set(0.7)
    r = multiclass_nms(boxes, scores, score_thr=0.05, iou_thr=0.5, max_out=10)
    kept = np.asarray(r.valid)
    assert kept.sum() == 2  # box 1 suppressed by box 0
    np.testing.assert_allclose(np.asarray(r.scores)[:2], [0.9, 0.7])
    np.testing.assert_array_equal(np.asarray(r.anchor_idx)[:2], [0, 2])


def test_no_cross_class_suppression():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=jnp.float32)
    scores = jnp.zeros((2, 2)).at[0, 0].set(0.9).at[1, 1].set(0.8)
    r = multiclass_nms(boxes, scores, score_thr=0.05, iou_thr=0.5, max_out=10)
    assert np.asarray(r.valid).sum() == 2
    np.testing.assert_array_equal(np.sort(np.asarray(r.labels)[:2]), [0, 1])


def test_score_threshold():
    boxes = jnp.asarray([[0, 0, 10, 10], [30, 30, 40, 40]], dtype=jnp.float32)
    scores = jnp.zeros((2, 1)).at[0, 0].set(0.9).at[1, 0].set(0.01)
    r = multiclass_nms(boxes, scores, score_thr=0.05, iou_thr=0.5, max_out=10)
    assert np.asarray(r.valid).sum() == 1


def test_anchor_in_multiple_classes():
    # one anchor can yield detections in several classes (per-class expansion)
    boxes = jnp.asarray([[0, 0, 10, 10]], dtype=jnp.float32)
    scores = jnp.asarray([[0.6, 0.5, 0.01]])
    r = multiclass_nms(boxes, scores, score_thr=0.05, iou_thr=0.5, max_out=10)
    assert np.asarray(r.valid).sum() == 2
    np.testing.assert_array_equal(np.asarray(r.labels)[:2], [0, 1])


def test_max_out_and_order():
    n = 50
    boxes = jnp.asarray(
        np.stack([np.arange(n) * 20.0, np.zeros(n), np.arange(n) * 20.0 + 10, np.full(n, 10.0)], -1),
        dtype=jnp.float32,
    )
    scores = jnp.asarray(np.linspace(0.9, 0.1, n)[:, None].astype(np.float32))
    r = multiclass_nms(boxes, scores, score_thr=0.05, iou_thr=0.5, max_out=8)
    assert np.asarray(r.valid).all()
    s = np.asarray(r.scores)
    assert (np.diff(s) <= 1e-6).all()  # descending


def test_batched_matches_single():
    rng = np.random.RandomState(0)
    boxes = rng.uniform(0, 80, (2, 30, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 20, (2, 30, 2)).astype(np.float32)], -1)
    scores = rng.uniform(0, 1, (2, 30, 3)).astype(np.float32)
    rb = batched_multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.5, 20)
    for i in range(2):
        ri = multiclass_nms(jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.05, 0.5, 20)
        np.testing.assert_allclose(np.asarray(rb.scores[i]), np.asarray(ri.scores))
        np.testing.assert_array_equal(np.asarray(rb.labels[i]), np.asarray(ri.labels))


def test_matches_reference_greedy_numpy():
    """Cross-check against a direct numpy transcription of the greedy rule."""
    rng = np.random.RandomState(7)
    n, c = 40, 4
    xy = rng.uniform(0, 60, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 30, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = (rng.uniform(0, 1, (n, c)) ** 2).astype(np.float32)

    def ref_nms(boxes, scores, thr, iou_thr, max_out):
        cands = []
        for a in range(n):
            for cl in range(c):
                if scores[a, cl] > thr:
                    cands.append((scores[a, cl], a, cl))
        cands.sort(key=lambda t: -t[0])
        kept = []
        for s, a, cl in cands:
            ok = True
            for s2, a2, cl2 in kept:
                if cl2 != cl:
                    continue
                b1, b2 = boxes[a], boxes[a2]
                ix = max(0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
                iy = max(0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
                inter = ix * iy
                a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
                a2_ = (b2[2] - b2[0]) * (b2[3] - b2[1])
                if inter / max(a1 + a2_ - inter, 1e-6) > iou_thr:
                    ok = False
                    break
            if ok:
                kept.append((s, a, cl))
            if len(kept) == max_out:
                break
        return kept

    expected = ref_nms(boxes, scores, 0.05, 0.5, 15)
    r = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.5, 15)
    got_n = int(np.asarray(r.valid).sum())
    assert got_n == len(expected)
    for i, (s, a, cl) in enumerate(expected):
        assert np.asarray(r.scores)[i] == np.float32(s)
        assert int(np.asarray(r.anchor_idx)[i]) == a
        assert int(np.asarray(r.labels)[i]) == cl
