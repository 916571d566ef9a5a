#!/usr/bin/env python
"""HTTP detection server — the TPU-native analog of the reference's
TorchServe deployment.

Behavioral parity targets (reference, /root/reference):
* tools/deployment/mmdet2torchserve.py + mmdet_handler.py — package a
  (config, checkpoint) pair behind an HTTP endpoint that accepts image
  bytes (raw or base64) and returns per-detection
  {class_name, bbox [x1, y1, x2, y2], score} rows above a threshold
  (mmdet_handler.py:44-67, threshold 0.5).
* TorchServe's multi-worker + dynamic-batching frontend (batch_size /
  max_batch_delay): here a ThreadingHTTPServer accepts requests
  concurrently (decode/preprocess overlap — cv2 releases the GIL) and a
  single batcher thread coalesces up to --max-batch images within
  --batch-delay-ms into ONE padded device step
  (api.Detector.predict_batch, fixed shape = one compile), which is the
  TPU-correct shape for this: one big MXU launch instead of N small ones.

Usage:
  python tools/deployment/serve.py --family retinanet \
      [--checkpoint ckpt] [--port 8080] [--score-thr 0.5] [--cpu] \
      [--max-batch 8] [--batch-delay-ms 5]
  curl -X POST --data-binary @image.jpg localhost:8080/predictions
"""

import argparse
import base64
import binascii
import json
import os
import queue
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def build_detector(args):
    from aod_meh_hua_tpu.api import Detector, init_detector
    from aod_meh_hua_tpu.utils.config import (RetinaNetConfig, SSDConfig,
                                              ZOO_FAMILIES, tiny_test_config)

    if args.family == "retinanet":
        cfg = tiny_test_config() if args.mini else RetinaNetConfig()
    elif args.family == "ssd":
        cfg = SSDConfig(width_mult=0.125) if args.mini else SSDConfig()
    else:
        full_cls, tiny_fn = ZOO_FAMILIES[args.family]
        cfg = tiny_fn() if args.mini else full_cls()
    model, variables = init_detector(cfg, checkpoint=args.checkpoint)
    pipeline = None
    if args.mini:
        # tiny canvases need a resize rule that always fits them
        from aod_meh_hua_tpu.data.pipeline import PipelineConfig

        h, w = cfg.canvas
        pipeline = PipelineConfig(img_scale=(max(h, w), min(h, w)),
                                  canvas=cfg.canvas, device_normalize=True)
    return Detector(cfg, model, variables, pipeline=pipeline)


class ArchiveDetector:
    """Serve straight from a package_model.py archive: the program is a
    deserialized jax.export artifact (weights baked in), preprocessing
    geometry comes from the MANIFEST — no checkpoint/config files, the
    torchserve `.mar` consumption model. Exposes the same
    predict_batch(images) surface the Batcher drives."""

    def __init__(self, archive_path: str):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        try:
            from package_model import load_archive
        finally:
            sys.path.pop(0)
        self.manifest, self.programs = load_archive(archive_path)
        geo = self.manifest.get("geometry")
        if not geo:
            raise ValueError("archive manifest has no geometry block; "
                             "re-package with the current package_model.py")
        self.geo = geo
        self.batch = int(geo["batch"])
        self.num_fg = int(geo["num_fg_classes"])

    def _prepare(self, img, canvas_hw):
        """Fit-resize + normalize + pad into the given canvas. Unlike
        prepare_sample this also bounds the resize by the canvas itself,
        so a portrait image can be letterboxed into the LANDSCAPE
        program when no portrait artifact was packaged."""
        import cv2

        geo = self.geo
        h0, w0 = img.shape[:2]
        ch, cw = canvas_hw
        if geo["keep_ratio"]:
            long_e = max(geo["img_scale"])
            short_e = min(geo["img_scale"])
            sf = min(long_e / max(h0, w0), short_e / min(h0, w0),
                     ch / h0, cw / w0)
            new_h, new_w = int(h0 * sf + 0.5), int(w0 * sf + 0.5)
        else:
            new_h, new_w = ch, cw
        resized = cv2.resize(img, (new_w, new_h),
                             interpolation=cv2.INTER_LINEAR).astype(np.float32)
        if geo["to_rgb"]:
            resized = resized[..., ::-1]
        resized = (resized - np.asarray(geo["mean"], np.float32)) \
            / np.asarray(geo["std"], np.float32)
        canvas = np.zeros((ch, cw, 3), np.float32)
        canvas[:new_h, :new_w] = resized
        scale = np.array([new_w / w0, new_h / h0] * 2, np.float32)
        return canvas, np.array([new_h, new_w], np.int32), scale

    def predict_batch(self, images, max_batch: int = 8):
        from aod_meh_hua_tpu.engine import EvalBatch, detections_to_per_class

        results = [None] * len(images)
        groups = {}
        for idx, img in enumerate(images):
            h0, w0 = img.shape[:2]
            orient = "landscape" if w0 / h0 > 1 else "portrait"
            if orient not in self.programs:
                orient = "landscape"  # letterbox fallback (_prepare)
            groups.setdefault(orient, []).append(idx)
        ch, cw = self.geo["canvas"]
        for orient, idxs in groups.items():
            canvas_hw = (ch, cw) if orient == "landscape" else (cw, ch)
            prog = self.programs[orient]
            for lo in range(0, len(idxs), self.batch):
                chunk = idxs[lo:lo + self.batch]
                prepped = [self._prepare(images[i], canvas_hw)
                           for i in chunk]
                pad = self.batch - len(chunk)
                imgs = np.stack([p[0] for p in prepped]
                                + [prepped[0][0]] * pad)
                shapes = np.stack([p[1] for p in prepped]
                                  + [prepped[0][1]] * pad)
                scales = np.stack([p[2] for p in prepped]
                                  + [prepped[0][2]] * pad)
                bvalid = np.arange(self.batch) < len(chunk)
                dets = prog.call(EvalBatch(imgs, shapes, scales, bvalid))
                per = detections_to_per_class(dets, self.num_fg,
                                              batch_valid=bvalid)
                for j, i in enumerate(chunk):
                    results[i] = per[j]
        return results


def decode_image(body: bytes):
    """Raw image bytes, or base64 of the same (mmdet_handler.py:33-38)."""
    import cv2

    try:
        body = base64.b64decode(body, validate=True)
    except (binascii.Error, ValueError):
        pass
    arr = np.frombuffer(body, np.uint8)
    return cv2.imdecode(arr, cv2.IMREAD_COLOR)


class Batcher:
    """Coalesce concurrent requests into one padded device batch.

    Requests enqueue (image, Event, slot); the worker drains up to
    max_batch of them, waiting at most delay_ms for stragglers after the
    first arrival, then runs ONE predict_batch call and wakes every
    waiter. TorchServe frontend semantics (batch_size + max_batch_delay)
    without the extra process hop."""

    def __init__(self, detector, max_batch: int = 8, delay_ms: float = 5.0):
        self.detector = detector
        self.max_batch = max(1, max_batch)
        self.delay = delay_ms / 1000.0
        self.q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def predict(self, img):
        done = threading.Event()
        slot = {}
        self.q.put((img, done, slot))
        done.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def _run(self):
        while True:
            items = [self.q.get()]  # block for the first request
            import time

            t0 = time.monotonic()
            while len(items) < self.max_batch:
                remaining = self.delay - (time.monotonic() - t0)
                if remaining <= 0:
                    break
                try:
                    items.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                results = self.detector.predict_batch(
                    [im for im, _, _ in items], max_batch=self.max_batch)
                for (_, done, slot), res in zip(items, results):
                    slot["result"] = res
                    done.set()
            except Exception as e:
                for _, done, slot in items:
                    slot["error"] = e
                    done.set()


def make_handler(batcher, classes, score_thr):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/ping":  # torchserve health endpoint
                self._reply(200, {"status": "Healthy"})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                self._predict()
            except Exception as e:  # keep the connection protocol-clean
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def _predict(self):
            length = int(self.headers.get("Content-Length", 0))
            img = decode_image(self.rfile.read(length)) if length else None
            if img is None:
                self._reply(400, {"error": "undecodable image payload"})
                return
            per_class = batcher.predict(img)
            out = []
            for ci, dets in enumerate(per_class):
                name = classes[ci] if ci < len(classes) else str(ci)
                for row in dets:
                    if float(row[4]) >= score_thr:
                        out.append({"class_name": name,
                                    "bbox": [float(v) for v in row[:4]],
                                    "score": float(row[4])})
            self._reply(200, out)

        def log_message(self, fmt, *a):
            print("[serve]", fmt % a, flush=True)

    return Handler


def main():
    ap = argparse.ArgumentParser()
    from aod_meh_hua_tpu.utils.config import ALL_FAMILIES

    ap.add_argument("--family", default="retinanet",
                    choices=sorted(ALL_FAMILIES))
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--archive", default=None,
                    help="serve a package_model.py archive instead of "
                         "(family, checkpoint) — the .mar consumption mode")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--score-thr", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mini", action="store_true", help="tiny model smoke mode")
    ap.add_argument("--warmup", action="store_true",
                    help="compile the landscape eval step before listening")
    ap.add_argument("--max-batch", type=int, default=8,
                    help="dynamic batcher: max images per device step")
    ap.add_argument("--batch-delay-ms", type=float, default=5.0,
                    help="dynamic batcher: max wait for stragglers after "
                         "the first request (TorchServe max_batch_delay)")
    args = ap.parse_args()

    # platform selection MUST precede any package import: importing the
    # package initializes jax backends, and once the preloaded axon TPU
    # plugin wins default selection a later config change cannot move
    # already-dispatched arrays off the chip (D2H over the relay hangs)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from aod_meh_hua_tpu.data.voc import VOC_CLASSES

    if args.archive:
        detector = ArchiveDetector(args.archive)
        classes = (detector.manifest.get("classes")
                   or VOC_CLASSES[: detector.num_fg])
        max_batch = detector.batch  # the exported program's fixed shape
    else:
        detector = build_detector(args)
        classes = VOC_CLASSES[: detector.cfg.num_fg_classes]
        max_batch = args.max_batch
        if args.warmup:
            h, w = detector.cfg.canvas
            dummy = np.zeros((min(600, h), min(1000, w), 3), np.uint8)
            detector.predict_batch([dummy], max_batch=max_batch)
            print("warmup compile done", flush=True)

    batcher = Batcher(detector, max_batch=max_batch,
                      delay_ms=args.batch_delay_ms)
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 make_handler(batcher, classes, args.score_thr))
    print(f"serving {args.family} on :{args.port} "
          f"(POST image bytes to /predictions, GET /ping; "
          f"batch<= {args.max_batch}, delay {args.batch_delay_ms} ms)",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
