#!/usr/bin/env python
"""Package an exported detector into one deployable archive
(reference tools/deployment/mmdet2torchserve.py analog).

The reference bundles (config, checkpoint, handler) into a TorchServe
`.mar` via model_archiver (mmdet2torchserve.py:46-66: a zip with a
MANIFEST plus the model files). The TPU-native deployable unit is the
jax.export StableHLO artifact (tools/deployment/export_model.py) —
self-contained weights+program, loadable from any jax process without
this framework installed. This tool tars that artifact together with a
MANIFEST.json (model name/version/family, class names, score threshold,
canvas/batch geometry) so a serving host gets everything in one file;
`load_archive` is the consumer used by tests and can back serve.py.

Usage:
  python tools/deployment/package_model.py detector_export.bin \
      --output-folder model_store --model-name retinanet_meh \
      [--artifact-portrait p.bin] [--family retinanet] \
      [--model-version 1.0] [--score-thr 0.5] [--force]
"""

import argparse
import io
import json
import os
import sys
import tarfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def package(artifact: str, output_folder: str, model_name: str,
            family: str = "retinanet", model_version: str = "1.0",
            score_thr: float = 0.5, artifact_portrait: str = None,
            classes=None, geometry: dict = None, force: bool = False) -> str:
    """Write {output_folder}/{model_name}.tar; returns its path."""
    os.makedirs(output_folder, exist_ok=True)
    out = os.path.join(output_folder, f"{model_name}.tar")
    if os.path.exists(out) and not force:
        # mmdet2torchserve refuses to clobber without --force (:41-43)
        raise FileExistsError(f"{out} exists; pass --force to overwrite")
    manifest = {
        "model_name": model_name,
        "model_version": model_version,
        "family": family,
        "score_thr": score_thr,
        "runtime": "jax.export/stablehlo",
        "artifacts": {"landscape": "model.bin"},
        "classes": list(classes) if classes is not None else None,
    }
    if artifact_portrait:
        manifest["artifacts"]["portrait"] = "model_portrait.bin"
    if geometry:
        # everything a serving host needs to preprocess without the
        # framework: canvas/img_scale/batch/normalization/num_classes
        manifest["geometry"] = geometry
    with tarfile.open(out, "w") as tf:
        blob = json.dumps(manifest, indent=2).encode()
        info = tarfile.TarInfo("MANIFEST.json")
        info.size = len(blob)
        tf.addfile(info, io.BytesIO(blob))
        tf.add(artifact, arcname="model.bin")
        if artifact_portrait:
            tf.add(artifact_portrait, arcname="model_portrait.bin")
    return out


def load_archive(path: str):
    """Read an archive back: (manifest, {orientation: jax exported fn}).

    Requires jax at load time (the serving host), nothing else — but if
    the framework IS importable, its namedtuple pytrees are registered
    first (deserialization needs the same registrations export made)."""
    from jax import export as jexport

    try:  # pragma: no branch
        from aod_meh_hua_tpu.engine import EvalBatch
        from aod_meh_hua_tpu.engine.mask_rcnn import MaskDetections
        from aod_meh_hua_tpu.ops.nms import NMSResult

        for cls, name in [(EvalBatch, "aod_meh_hua_tpu.EvalBatch"),
                          (NMSResult, "aod_meh_hua_tpu.NMSResult"),
                          (MaskDetections, "aod_meh_hua_tpu.MaskDetections")]:
            try:
                jexport.register_namedtuple_serialization(
                    cls, serialized_name=name)
            except ValueError:
                pass  # already registered in this process
    except ImportError:
        pass  # bare serving host: caller registers its own pytrees

    programs = {}
    with tarfile.open(path, "r") as tf:
        manifest = json.loads(tf.extractfile("MANIFEST.json").read())
        for orientation, member in manifest["artifacts"].items():
            programs[orientation] = jexport.deserialize(
                tf.extractfile(member).read())
    return manifest, programs


def main():
    ap = argparse.ArgumentParser(
        description="Package exported detector into one archive")
    ap.add_argument("artifact", help="exported .bin (export_model.py)")
    ap.add_argument("--artifact-portrait", default=None)
    ap.add_argument("--output-folder", required=True)
    ap.add_argument("--model-name", default=None,
                    help="default: artifact basename (mmdet2torchserve "
                         "uses the checkpoint stem)")
    ap.add_argument("--model-version", default="1.0")
    ap.add_argument("--family", default="retinanet")
    ap.add_argument("--score-thr", type=float, default=0.5)
    ap.add_argument("--voc-classes", action="store_true",
                    help="embed the VOC class list in the manifest")
    ap.add_argument("--batch", type=int, default=1,
                    help="batch size the artifact was exported with")
    ap.add_argument("--mini", action="store_true",
                    help="tiny-config geometry (smoke/test mode)")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    classes = None
    if args.voc_classes:
        from aod_meh_hua_tpu.data import VOC_CLASSES
        classes = VOC_CLASSES
    from aod_meh_hua_tpu.utils.config import (RetinaNetConfig, SSDConfig,
                                              ZOO_FAMILIES, tiny_test_config)
    if args.mini:
        cfg = tiny_test_config()
    elif args.family == "retinanet":
        cfg = RetinaNetConfig()
    elif args.family == "ssd":
        cfg = SSDConfig()
    else:
        cfg = ZOO_FAMILIES[args.family][0]()
    import dataclasses

    from aod_meh_hua_tpu.api import _default_pipeline
    from aod_meh_hua_tpu.data.pipeline import PipelineConfig
    pipe = (PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)
            if args.mini else _default_pipeline(cfg))
    # exported programs are traced on float32 canvases (export_model.py)
    pipe = dataclasses.replace(pipe, device_normalize=False)
    geometry = {
        "canvas": list(pipe.canvas), "img_scale": list(pipe.img_scale),
        "keep_ratio": pipe.keep_ratio, "batch": args.batch,
        "mean": list(pipe.mean), "std": list(pipe.std),
        "to_rgb": pipe.to_rgb, "flip_ratio": 0.0,
        "num_fg_classes": cfg.num_fg_classes,
    }
    name = args.model_name or os.path.splitext(
        os.path.basename(args.artifact))[0]
    out = package(args.artifact, args.output_folder, name,
                  family=args.family, model_version=args.model_version,
                  score_thr=args.score_thr,
                  artifact_portrait=args.artifact_portrait,
                  classes=classes, geometry=geometry, force=args.force)
    print(f"packaged -> {out} ({os.path.getsize(out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
