"""Inference-API tests: batched and async Detector paths.

Parity targets (reference, /root/reference):
* mmdet/apis/inference.py:89 (inference_detector list input) and :155
  (async_inference_detector) — here the batch path is a single padded
  device step instead of a Python loop, and async delegates to the
  default executor instead of torch.cuda streams.
* tools/deployment/mmdet_handler.py (TorchServe handler receives LISTS
  of requests): serve.py's Batcher coalesces concurrent requests into
  one predict_batch call.
"""

import asyncio
import importlib.util
import os
import threading

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def detector():
    from aod_meh_hua_tpu.api import Detector, init_detector
    from aod_meh_hua_tpu.data.pipeline import PipelineConfig
    from aod_meh_hua_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config()
    model, variables = init_detector(cfg, seed=0)
    # tiny canvases need a resize rule that always fits them (same as
    # serve.py --mini)
    h, w = cfg.canvas
    pipe = PipelineConfig(img_scale=(max(h, w), min(h, w)),
                          canvas=cfg.canvas, device_normalize=True)
    return Detector(cfg, model, variables, pipeline=pipe)


def _images(n=5):
    r = np.random.RandomState(7)
    # landscape + portrait mix so predict_batch's orientation grouping
    # and input-order restoration are both exercised
    shapes = [(40, 80), (36, 70), (80, 40), (50, 90), (70, 36)]
    return [(r.rand(h, w, 3) * 255).astype(np.uint8) for h, w in shapes[:n]]


def test_predict_batch_matches_single(detector):
    """Padded fixed-shape batching must be invisible: per-image results
    equal the single-image path (up to batch-size-dependent XLA
    reduction order, ~1e-7 rel), in input order, across a chunk
    boundary (5 images, max_batch=2 -> 3 chunks)."""
    imgs = _images()
    single = [detector(im) for im in imgs]
    batched = detector.predict_batch(imgs, max_batch=2)
    assert len(batched) == len(imgs)
    for s, b in zip(single, batched):
        assert len(s) == len(b)
        for sc, bc in zip(s, b):
            assert sc.shape == bc.shape
            np.testing.assert_allclose(sc, bc, rtol=1e-5, atol=1e-4)


def test_async_inference_detector(detector):
    from aod_meh_hua_tpu.api import async_inference_detector

    img = _images(n=1)[0]
    sync = detector(img)

    async def go():
        return await asyncio.gather(
            async_inference_detector(detector, img),
            async_inference_detector(detector, img),
        )

    for res in asyncio.run(go()):
        for a, b in zip(sync, res):
            np.testing.assert_array_equal(a, b)


def test_batcher_coalesces_concurrent_requests(detector):
    """serve.py's dynamic batcher: N concurrent callers each get back
    exactly what the direct Detector call returns for their image."""
    spec = importlib.util.spec_from_file_location(
        "serve_mod", os.path.join(REPO, "tools", "deployment", "serve.py"))
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)

    imgs = _images(n=4)
    want = [detector(im) for im in imgs]
    batcher = serve_mod.Batcher(detector, max_batch=4, delay_ms=100.0)
    got = [None] * len(imgs)

    def worker(i):
        got[i] = batcher.predict(imgs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for w, g in zip(want, got):
        assert g is not None
        for a, b in zip(w, g):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_batcher_propagates_errors(detector):
    """A failing batch must wake every waiter with the exception, not
    deadlock them (serve.py returns HTTP 500 from it)."""
    spec = importlib.util.spec_from_file_location(
        "serve_mod2", os.path.join(REPO, "tools", "deployment", "serve.py"))
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)

    class Boom:
        def predict_batch(self, images, max_batch=8):
            raise RuntimeError("boom")

    batcher = serve_mod.Batcher(Boom(), max_batch=2, delay_ms=1.0)
    with pytest.raises(RuntimeError, match="boom"):
        batcher.predict(_images(n=1)[0])


def test_detector_with_uncertainty_six_columns(detector, tmp_path):
    """bbox2tupleresult capability (core/bbox/transforms.py:118): the
    with_uncertainty Detector appends the survivor anchor's FG-score
    Shannon entropy (L_anchor_head.py:478-479) as a 6th column, the
    5-col boxes/scores are unchanged, and show_result renders it."""
    import dataclasses

    from aod_meh_hua_tpu.api import Detector, show_result

    cfg = detector.cfg
    # a permissive score threshold so the untrained net emits detections
    cfg_lo = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, score_thr=1e-4))
    det_u = Detector(cfg_lo, detector.model, detector.variables,
                     pipeline=detector.pipeline, with_uncertainty=True)
    det_p = Detector(cfg_lo, detector.model, detector.variables,
                     pipeline=detector.pipeline)
    img = _images(1)[0]
    res_u, res_p = det_u(img), det_p(img)
    n_dets = sum(len(a) for a in res_u)
    assert n_dets > 0, "threshold too strict: nothing to check"
    for a_u, a_p in zip(res_u, res_p):
        assert a_u.shape[1] == 6 and a_p.shape[1] == 5
        np.testing.assert_allclose(a_u[:, :5], a_p, rtol=1e-6)
        if len(a_u):
            # entropy of a C-way distribution is bounded by log C
            assert (a_u[:, 5] >= 0).all()
            assert (a_u[:, 5] <= np.log(cfg.num_fg_classes) + 1e-4).all()
    out = str(tmp_path / "unc.jpg")
    show_result(img, res_u, out_file=out, score_thr=0.0)
    assert os.path.exists(out)


def test_with_uncertainty_rejects_other_families():
    from types import SimpleNamespace

    from aod_meh_hua_tpu.api import Detector

    with pytest.raises(ValueError, match="retinanet/ssd"):
        Detector(SimpleNamespace(family="fcos"), None, None,
                 with_uncertainty=True)
