"""mmdet-1.x -> 2.x checkpoint key/channel surgery (numpy).

Transcribes the semantics of the reference's two upgraders so legacy
checkpoints can be fed to models/reference_convert.py:

* tools/model_converters/upgrade_model_version.py — class-channel
  reorder (1.x softmax heads put background FIRST; 2.x puts it LAST:
  `reorder_cls_channel` :45-63), regression-group truncation for
  class-aware fc_reg/rpn_reg (`truncate_reg_channel` :89-110 — note the
  reference's own bias/weight asymmetry: bias keeps the first C-1
  groups, weight drops group 0; reproduced verbatim), mask conv_logits
  truncation (`truncate_cls_channel` :66-86), the two-stage
  `roi_head.` prefix (:143-145), the <=0.5.3 RetinaNet
  `cls_convs.N.{weight,bias}` -> `cls_convs.N.conv.*` rename
  (:171-179), SSD cls_convs reorder (:181-184), and the <2.5.0 RPN
  class-order unification (:132-138 — rpn_cls joins the reorder set,
  rpn_reg leaves the truncate set).
* tools/model_converters/upgrade_ssd_version.py — VGG-SSD layout moves
  (:27-38): `...extra.<i>.*` -> `neck.extra_layers.<i//2>.<i%2>.conv.*`,
  `l2_norm` -> `neck.l2_norm.weight`, and bbox_head conv lists gaining
  the ConvModule `.0` segment.

Everything operates on {key: np.ndarray} state dicts (the form
pretrained.load_torch_state_dict returns), so no torch is needed.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

HEAD_PREFIXES = ("bbox_head", "mask_head", "semantic_head", "grid_head",
                 "mask_iou_head")  # upgrade_model_version.py:11-13


def reorder_cls_channel(val: np.ndarray, num_classes: int = 81) -> np.ndarray:
    """Move the background channel from index 0 (1.x) to last (2.x)."""
    if val.ndim == 1:  # bias
        return np.concatenate([val[1:], val[:1]], axis=0)
    out_channels, in_channels = val.shape[:2]
    if out_channels != num_classes and out_channels % num_classes == 0:
        # conv_cls for softmax output: anchors x classes interleaved
        new = val.reshape(-1, num_classes, in_channels, *val.shape[2:])
        new = np.concatenate([new[:, 1:], new[:, :1]], axis=1)
        return new.reshape(val.shape)
    if out_channels == num_classes:  # fc_cls
        return np.concatenate([val[1:], val[:1]], axis=0)
    return val  # agnostic | retina_cls | rpn_cls


def truncate_cls_channel(val: np.ndarray, num_classes: int = 81) -> np.ndarray:
    """Drop the background mask channel (conv_logits)."""
    if val.ndim == 1:
        return val[:num_classes - 1] if val.shape[0] % num_classes == 0 else val
    out_channels, in_channels = val.shape[:2]
    if out_channels % num_classes == 0:
        new = val.reshape(num_classes, in_channels, *val.shape[2:])[1:]
        return new.reshape(-1, *val.shape[1:])
    return val


def truncate_reg_channel(val: np.ndarray, num_classes: int = 81) -> np.ndarray:
    """Drop the background regression group (fc_reg / rpn_reg)."""
    if val.ndim == 1:
        if val.shape[0] % num_classes == 0:
            # reference keeps the FIRST C-1 groups for the bias (:94-96)
            return val.reshape(num_classes, -1)[:num_classes - 1].reshape(-1)
        return val
    out_channels, in_channels = val.shape[:2]
    if out_channels % num_classes == 0:
        # ... but drops group 0 for the weight (:103-106)
        new = val.reshape(num_classes, -1, in_channels, *val.shape[2:])[1:]
        return new.reshape(-1, *val.shape[1:])
    return val


def upgrade_state_dict(sd: Dict[str, np.ndarray], num_classes: int = 81,
                       is_two_stage: bool = False, is_ssd: bool = False,
                       reg_cls_agnostic: bool = False,
                       upgrade_retina: bool = False,
                       upgrade_rpn: bool = True,
                       verbose: bool = False) -> Dict[str, np.ndarray]:
    """upgrade_model_version.py:112-188 convert(), torch-free."""
    cls_pat = (r"(conv_cls|retina_cls|rpn_cls|fc_cls|fcos_cls|fovea_cls)"
               r"\.(weight|bias)" if upgrade_rpn else
               r"(conv_cls|retina_cls|fc_cls|fcos_cls|fovea_cls)"
               r"\.(weight|bias)")
    reg_pat = (r"(fc_reg)\.(weight|bias)" if upgrade_rpn
               else r"(fc_reg|rpn_reg)\.(weight|bias)")
    out: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        new_key, new_val = key, val
        if is_two_stage and any(key.startswith(h) for h in HEAD_PREFIXES):
            new_key = f"roi_head.{key}"
        if re.search(cls_pat, new_key):
            if verbose:
                print(f"reorder cls channels of {new_key}")
            new_val = reorder_cls_channel(val, num_classes)
        if re.search(reg_pat, new_key) and not reg_cls_agnostic:
            if verbose:
                print(f"truncate regression channels of {new_key}")
            new_val = truncate_reg_channel(val, num_classes)
        if re.search(r"(conv_logits)\.(weight|bias)", new_key):
            if verbose:
                print(f"truncate mask prediction channels of {new_key}")
            new_val = truncate_cls_channel(val, num_classes)
        m = re.search(r"(cls_convs|reg_convs)\.\d\.(weight|bias)", key)
        if m is not None and upgrade_retina:
            # 1.x RetinaNet used bare Conv2d; 2.x wraps in ConvModule
            param = m.groups()[1]
            out[key.replace(param, f"conv.{param}")] = val
            continue
        if re.search(r"(cls_convs)\.\d\.(weight|bias)", key) and is_ssd:
            new_val = reorder_cls_channel(new_val, num_classes)
        out[new_key] = new_val
    return out


def upgrade_ssd_state_dict(
        sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """upgrade_ssd_version.py:21-39 convert(): legacy VGG-SSD layout ->
    2.x SSDNeck layout."""
    out: Dict[str, np.ndarray] = {}
    for key, value in sd.items():
        if "extra" in key:
            layer_idx = int(key.split(".")[2])
            new_key = ("neck.extra_layers.{}.{}.conv.".format(
                layer_idx // 2, layer_idx % 2) + key.split(".")[-1])
        elif "l2_norm" in key:
            new_key = "neck.l2_norm.weight"
        elif "bbox_head" in key:
            new_key = key[:21] + ".0" + key[21:]
        else:
            new_key = key
        out[new_key] = value
    return out
