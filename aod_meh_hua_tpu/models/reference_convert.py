"""Reference-trained detector checkpoints -> our variables pytrees.

The reference trains the two live MEH detectors with torch/mmdet and
saves raw ``state_dict`` snapshots per AL cycle
(``{cfg}_Cycle{c}_Epoch{e}_mycode.pth``, tools/train_RetinaNet.py:213-219).
This module maps those state dicts onto our Flax variable trees so a
reference-trained model can be evaluated/scored by this framework — the
load-bearing half of the mAP / selection-parity runbook (docs/PARITY.md).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/Lambda_L2.py:41-54 — cls_convs/reg_convs/
  L_convs ConvModule stacks + retina_cls/retina_reg/retina_L heads.
* mmdet/models/necks/fpn.py — lateral_convs.{i}.conv / fpn_convs.{i}.conv
  (extra P6/P7 convs live at fpn_convs indices 3,4 for the live
  start_level=1, num_outs=5 config).
* mmdet/models/necks/ssd_neck.py:55-90 — l2_norm + extra_layers.{i} as
  Sequential(1x1 reduce ConvModule, 3x3 ConvModule).
* mmdet/models/dense_heads/My_L_ssd_head.py:102-137 — per-level
  Sequential([Conv2d]) cls/reg/L convs (default stacked_convs=0 path).
* tools/model_converters/*.py — the reference's converter-tool family;
  the key-coverage "Not Convert:" report follows
  detectron2pytorch.py:67-69.

Conv kernels transpose OIHW -> HWIO (Flax NHWC convention); everything
else copies through. All functions take/return host numpy.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from .resnet import convert_torchvision_resnet
from .vgg import convert_mmcv_vgg16


def _conv(sd: Dict[str, np.ndarray], src: str, taken: set) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(np.asarray(sd[src + ".weight"]), (2, 3, 1, 0))}
    taken.add(src + ".weight")
    if src + ".bias" in sd:
        out["bias"] = np.asarray(sd[src + ".bias"])
        taken.add(src + ".bias")
    return out


def _strip(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def unconverted_keys(sd: Dict[str, np.ndarray], taken: set) -> List[str]:
    """Keys the conversion did not consume (num_batches_tracked is torch
    BN bookkeeping with no Flax analog and is ignored silently)."""
    return sorted(k for k in sd if k not in taken
                  and not k.endswith("num_batches_tracked"))


def convert_reference_retinanet(
    sd: Dict[str, np.ndarray],
    stacked_convs: int = 4,
    block_counts: Tuple[int, ...] = (3, 4, 6, 3),
    num_fpn_levels: int = 3,
    num_extra_levels: int = 2,
) -> Tuple[Dict[str, Any], List[str]]:
    """mmdet SSL_L_RetinaNet state_dict -> {'params', 'batch_stats'}.

    Returns (variables, unconverted_key_list). Key layout follows the
    live Config_RetinaNet.py model exactly; `unconverted` is non-empty
    when the checkpoint carries extra modules (report it, don't raise —
    matching the reference converters' "Not Convert:" prints).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    taken: set = set()

    # --- backbone: torchvision-named under the 'backbone.' prefix
    bb_sd = _strip(sd, "backbone.")
    bb_params, bb_stats = convert_torchvision_resnet(bb_sd, block_counts)
    for k in sd:
        if k.startswith("backbone.") and not k.endswith("num_batches_tracked"):
            taken.add(k)  # convert_torchvision_resnet consumes the full resnet

    # --- neck: lateral_convs / fpn_convs (+extra at the tail)
    neck: Dict[str, Any] = {}
    for i in range(num_fpn_levels):
        neck[f"lateral_{i}"] = _conv(sd, f"neck.lateral_convs.{i}.conv", taken)
        neck[f"fpn_{i}"] = _conv(sd, f"neck.fpn_convs.{i}.conv", taken)
    for e in range(num_extra_levels):
        neck[f"extra_{e}"] = _conv(sd, f"neck.fpn_convs.{num_fpn_levels + e}.conv", taken)

    # --- head: 4x ConvModule towers + 3 prediction convs
    head: Dict[str, Any] = {}
    for branch in ("cls_convs", "reg_convs", "L_convs"):
        head[branch] = {
            f"conv_{i}": _conv(sd, f"bbox_head.{branch}.{i}.conv", taken)
            for i in range(stacked_convs)
        }
    for pred in ("retina_cls", "retina_reg", "retina_L"):
        head[pred] = _conv(sd, f"bbox_head.{pred}", taken)

    variables = {
        "params": {"backbone": bb_params, "neck": neck, "head": head},
        "batch_stats": {"backbone": bb_stats},
    }
    return variables, unconverted_keys(sd, taken)


def convert_reference_ssd(
    sd: Dict[str, np.ndarray],
    num_levels: int = 6,
    num_extra_layers: int = 4,
) -> Tuple[Dict[str, Any], List[str]]:
    """mmdet SSD_L_SingleStageDetector state_dict -> {'params'}.

    Live Config_SSD.py geometry: VGG16 backbone (features.*), SSDNeck
    (l2_norm + 4 extra 1x1/3x3 pairs), MyLSSDHead with one Conv2d per
    (level, branch) — Sequential index 0 (My_L_ssd_head.py:130-137).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    taken: set = set()

    bb_sd = _strip(sd, "backbone.")
    bb_params = convert_mmcv_vgg16(bb_sd)
    for k in sd:
        if k.startswith("backbone.features."):
            taken.add(k)

    neck: Dict[str, Any] = {}
    if "neck.l2_norm.weight" in sd:
        neck["l2_norm"] = {"scale": np.asarray(sd["neck.l2_norm.weight"])}
        taken.add("neck.l2_norm.weight")
    for i in range(num_extra_layers):
        neck[f"extra_{i}_reduce"] = _conv(sd, f"neck.extra_layers.{i}.0.conv", taken)
        neck[f"extra_{i}_conv"] = _conv(sd, f"neck.extra_layers.{i}.1.conv", taken)

    head: Dict[str, Any] = {}
    for lvl in range(num_levels):
        head[f"cls_{lvl}"] = _conv(sd, f"bbox_head.cls_convs.{lvl}.0", taken)
        head[f"reg_{lvl}"] = _conv(sd, f"bbox_head.reg_convs.{lvl}.0", taken)
        head[f"L_{lvl}"] = _conv(sd, f"bbox_head.L_convs.{lvl}.0", taken)

    variables = {"params": {"backbone": bb_params, "neck": neck, "head": head}}
    return variables, unconverted_keys(sd, taken)


def export_reference_retinanet(variables: Dict[str, Any],
                               stacked_convs: int = 4) -> Dict[str, np.ndarray]:
    """Inverse of convert_reference_retinanet for the neck/head (and the
    backbone via torchvision naming): our variables -> an mmdet-style
    state_dict of numpy arrays. Used by tests to round-trip-check the
    mapping and by tooling that wants to hand weights BACK to the
    reference stack."""
    p = variables["params"]
    s = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    def put_conv(dst: str, leaf: Dict[str, np.ndarray]) -> None:
        sd[dst + ".weight"] = np.transpose(np.asarray(leaf["kernel"]), (3, 2, 0, 1))
        if "bias" in leaf:
            sd[dst + ".bias"] = np.asarray(leaf["bias"])

    def put_bn(dst: str, leaf_p: Dict[str, np.ndarray], leaf_s: Dict[str, np.ndarray]) -> None:
        sd[dst + ".weight"] = np.asarray(leaf_p["scale"])
        sd[dst + ".bias"] = np.asarray(leaf_p["bias"])
        sd[dst + ".running_mean"] = np.asarray(leaf_s["mean"])
        sd[dst + ".running_var"] = np.asarray(leaf_s["var"])

    bb_p, bb_s = p["backbone"], s["backbone"]
    put_conv("backbone.conv1", bb_p["conv1"])
    put_bn("backbone.bn1", bb_p["bn1"], bb_s["bn1"])
    for name in bb_p:
        if not name.startswith("layer"):
            continue
        stage_block, b = name.rsplit("_", 1)
        dst = f"backbone.{stage_block}.{b}"
        for i in (1, 2, 3):
            put_conv(f"{dst}.conv{i}", bb_p[name][f"conv{i}"])
            put_bn(f"{dst}.bn{i}", bb_p[name][f"bn{i}"], bb_s[name][f"bn{i}"])
        if "downsample_conv" in bb_p[name]:
            put_conv(f"{dst}.downsample.0", bb_p[name]["downsample_conv"])
            put_bn(f"{dst}.downsample.1", bb_p[name]["downsample_bn"],
                   bb_s[name]["downsample_bn"])

    neck = p["neck"]
    lat = sorted(int(k.split("_")[1]) for k in neck if k.startswith("lateral_"))
    for i in lat:
        put_conv(f"neck.lateral_convs.{i}.conv", neck[f"lateral_{i}"])
        put_conv(f"neck.fpn_convs.{i}.conv", neck[f"fpn_{i}"])
    n_lat = len(lat)
    for e in sorted(int(k.split("_")[1]) for k in neck if k.startswith("extra_")):
        put_conv(f"neck.fpn_convs.{n_lat + e}.conv", neck[f"extra_{e}"])

    head = p["head"]
    for branch in ("cls_convs", "reg_convs", "L_convs"):
        for i in range(stacked_convs):
            put_conv(f"bbox_head.{branch}.{i}.conv", head[branch][f"conv_{i}"])
    for pred in ("retina_cls", "retina_reg", "retina_L"):
        put_conv(f"bbox_head.{pred}", head[pred])
    return sd
