#!/usr/bin/env python
"""Minimal HTTP detection server — the TPU-native analog of the
reference's TorchServe deployment.

Behavioral parity targets (reference, /root/reference):
* tools/deployment/mmdet2torchserve.py + mmdet_handler.py — package a
  (config, checkpoint) pair behind an HTTP endpoint that accepts image
  bytes (raw or base64) and returns per-detection
  {class_name, bbox [x1, y1, x2, y2], score} rows above a threshold
  (mmdet_handler.py:44-67, threshold 0.5).

Here the server is dependency-free (http.server): the model compiles
once at startup (per-orientation eval steps cached by api.Detector) and
every request runs the same jitted NMSResult path as the offline tools.

Usage:
  python tools/deployment/serve.py --family retinanet \
      [--checkpoint ckpt] [--port 8080] [--score-thr 0.5] [--cpu]
  curl -X POST --data-binary @image.jpg localhost:8080/predictions
"""

import argparse
import base64
import binascii
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def build_detector(args):
    from aod_meh_hua_tpu.api import Detector, init_detector
    from aod_meh_hua_tpu.utils.config import (
        ATSSConfig, CascadeRCNNConfig, CenterNetConfig, DETRConfig,
        FasterRCNNConfig, FCOSConfig, GFLConfig, RetinaNetConfig,
        FoveaBoxConfig, PAAConfig, SparseRCNNConfig, SSDConfig, YOLOConfig, YOLOFConfig,
    )

    if args.mini:
        from aod_meh_hua_tpu.utils.config import (
            tiny_atss_config, tiny_cascade_config, tiny_centernet_config,
            tiny_detr_config, tiny_faster_rcnn_config, tiny_fcos_config,
            tiny_gfl_config, tiny_sparse_rcnn_config, tiny_test_config,
            tiny_foveabox_config, tiny_paa_config, tiny_yolo_config, tiny_yolof_config,
        )

        cfg = {"retinanet": tiny_test_config,
               "ssd": lambda: SSDConfig(width_mult=0.125),
               "faster_rcnn": tiny_faster_rcnn_config,
               "cascade_rcnn": tiny_cascade_config, "fcos": tiny_fcos_config,
               "atss": tiny_atss_config, "gfl": tiny_gfl_config,
               "yolov3": tiny_yolo_config, "detr": tiny_detr_config,
               "centernet": tiny_centernet_config,
               "sparse_rcnn": tiny_sparse_rcnn_config,
               "yolof": tiny_yolof_config,
               "foveabox": tiny_foveabox_config,
               "paa": tiny_paa_config}[args.family]()
    else:
        cfg = {"retinanet": RetinaNetConfig, "ssd": SSDConfig,
               "faster_rcnn": FasterRCNNConfig,
               "cascade_rcnn": CascadeRCNNConfig, "fcos": FCOSConfig,
               "atss": ATSSConfig, "gfl": GFLConfig, "yolov3": YOLOConfig,
               "detr": DETRConfig,
               "centernet": CenterNetConfig, "sparse_rcnn": SparseRCNNConfig, "yolof": YOLOFConfig, "foveabox": FoveaBoxConfig, "paa": PAAConfig}[args.family]()
    model, variables = init_detector(cfg, checkpoint=args.checkpoint)
    pipeline = None
    if args.mini:
        # tiny canvases need a resize rule that always fits them
        from aod_meh_hua_tpu.data.pipeline import PipelineConfig

        h, w = cfg.canvas
        pipeline = PipelineConfig(img_scale=(max(h, w), min(h, w)),
                                  canvas=cfg.canvas, device_normalize=True)
    return Detector(cfg, model, variables, pipeline=pipeline)


def decode_image(body: bytes):
    """Raw image bytes, or base64 of the same (mmdet_handler.py:33-38)."""
    import cv2

    try:
        body = base64.b64decode(body, validate=True)
    except (binascii.Error, ValueError):
        pass
    arr = np.frombuffer(body, np.uint8)
    return cv2.imdecode(arr, cv2.IMREAD_COLOR)


def make_handler(detector, classes, score_thr):
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
            per_class = detector(img)
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
    ap.add_argument("--family", default="retinanet",
                    choices=["retinanet", "ssd", "faster_rcnn", "cascade_rcnn",
                             "fcos", "atss", "gfl", "yolov3", "detr",
                             "centernet", "sparse_rcnn", "yolof", "foveabox", "paa"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--score-thr", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mini", action="store_true", help="tiny model smoke mode")
    ap.add_argument("--warmup", action="store_true",
                    help="compile the landscape eval step before listening")
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

    detector = build_detector(args)
    classes = VOC_CLASSES[: detector.cfg.num_fg_classes]
    if args.warmup:
        h, w = detector.cfg.canvas
        dummy = np.zeros((min(600, h), min(1000, w), 3), np.uint8)
        detector(dummy)
        print("warmup compile done", flush=True)

    server = HTTPServer(("0.0.0.0", args.port),
                        make_handler(detector, classes, args.score_thr))
    print(f"serving {args.family} on :{args.port} "
          f"(POST image bytes to /predictions, GET /ping)", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
