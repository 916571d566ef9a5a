"""mmcv-style config loading for the reference's upstream zoo configs.

The reference keeps ~70 upstream mmdet-2.13 config families
(`/root/reference/configs/atss ... yolof`), all plain-python files
loaded through `mmcv.Config.fromfile` with `_base_` inheritance
(mmcv/utils/config.py: `_file2dict` + `_merge_a_into_b`, including the
`_delete_=True` wholesale-replace rule and the duplicate-base-key
error). A user of the reference points the CLI at one of those files;
this module gives the same entry point here:

    load_mmdet_config(path)        -> fully-merged plain dict
    resolve_zoo_family(cfg)        -> our family key ('atss', ...)
    map_reference_zoo_config(path) -> ReferenceZooConfig(family, model
                                      dataclass, train settings, notes)

Dispatch covers every model config directory in the reference; the
honored field set is the core geometry/losses/test_cfg/schedule subset
each family dataclass exposes — everything else lands in `.notes` so
nothing is silently dropped (same loud-warning contract as
utils/config.py:load_reference_config for the two live AL configs).
"""

from __future__ import annotations

import dataclasses
import os
import runpy
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

__all__ = [
    "load_mmdet_config",
    "resolve_zoo_family",
    "map_reference_zoo_config",
    "ReferenceZooConfig",
]


# ------------------------------------------------------------------ #
# mmcv Config machinery (_base_ + _delete_)
# ------------------------------------------------------------------ #

def _exec_config(path: str) -> Dict[str, Any]:
    ns = runpy.run_path(path)
    return {k: v for k, v in ns.items()
            if not k.startswith("__") and not callable(v)
            and not isinstance(v, type(os))}


def merge_into(a: Dict, b: Dict) -> Dict:
    """mmcv Config._merge_a_into_b: merge a INTO b (a wins). A child
    dict with `_delete_=True` replaces the base value wholesale."""
    b = dict(b)
    for k, v in a.items():
        if isinstance(v, dict) and k in b and not v.pop("_delete_", False):
            if not isinstance(b[k], dict):
                raise TypeError(
                    f"cannot merge dict {k!r} into {type(b[k]).__name__} "
                    f"(add _delete_=True to replace, mmcv semantics)")
            b[k] = merge_into(v, b[k])
        else:
            b[k] = v
    return b


def _strip_delete(d):
    if isinstance(d, dict):
        return {k: _strip_delete(v) for k, v in d.items() if k != "_delete_"}
    if isinstance(d, (list, tuple)):
        return type(d)(_strip_delete(v) for v in d)
    return d


# mmdet-2.13's configs/_base_/default_runtime.py, which the reference
# fork DELETED while keeping ~500 zoo configs that `_base_` it (their
# mmcv load fails upstream too). Synthesized here so those files load.
_DEFAULT_RUNTIME: Dict[str, Any] = {
    "checkpoint_config": {"interval": 1},
    "log_config": {"interval": 50, "hooks": [{"type": "TextLoggerHook"}]},
    "custom_hooks": [{"type": "NumClassCheckHook"}],
    "dist_params": {"backend": "nccl"},
    "log_level": "INFO",
    "load_from": None,
    "resume_from": None,
    "workflow": [("train", 1)],
}


def load_mmdet_config(path: str) -> Dict[str, Any]:
    """Config.fromfile for a plain-python mmdet config: resolve the
    `_base_` chain (paths relative to the file), error on duplicate
    keys across sibling bases, merge the child on top."""
    path = os.path.abspath(path)
    if not os.path.exists(path) and \
            os.path.basename(path) == "default_runtime.py":
        return dict(_DEFAULT_RUNTIME)
    cfg = _exec_config(path)
    base = cfg.pop("_base_", None)
    if base is None:
        return _strip_delete(cfg)
    if isinstance(base, str):
        base = [base]
    merged_base: Dict[str, Any] = {}
    for rel in base:
        sub = load_mmdet_config(os.path.join(os.path.dirname(path), rel))
        dup = merged_base.keys() & sub.keys()
        if dup:
            raise KeyError(
                f"duplicate keys {sorted(dup)} across _base_ files of "
                f"{path} (mmcv raises here too)")
        merged_base.update(sub)
    return _strip_delete(merge_into(cfg, merged_base))


# ------------------------------------------------------------------ #
# family dispatch
# ------------------------------------------------------------------ #

def _g(d: Optional[Dict], *keys, default=None):
    cur = d or {}
    for k in keys:
        if not isinstance(cur, dict):
            return default
        cur = cur.get(k)
        if cur is None:
            return default
    return cur


def resolve_zoo_family(cfg: Dict[str, Any]) -> Tuple[str, List[str]]:
    """Map a merged reference config dict onto one of our family keys
    (utils.config.ALL_FAMILIES). Returns (family, notes); raises
    ValueError for a config with no 'model'."""
    model = cfg.get("model")
    if not isinstance(model, dict) or "type" not in model:
        raise ValueError("config has no model.type — not a model config")
    notes: List[str] = []
    mtype = model["type"]
    bht = _g(model, "bbox_head", "type", default="")
    backbone_t = _g(model, "backbone", "type", default="")
    neck = model.get("neck")
    neck_t = neck.get("type", "") if isinstance(neck, dict) else ""
    neck_list_types = ([n.get("type", "") for n in neck]
                       if isinstance(neck, list) else [])
    roi_t = _g(model, "roi_head", "type", default="")

    def _note(msg):
        notes.append(msg)

    direct = {
        "ATSS": "atss", "AutoAssign": "autoassign", "CenterNet": "centernet",
        "DETR": "detr", "DeformableDETR": "deformable_detr",
        "FCOS": "fcos", "NASFCOS": "nas_fcos", "FOVEA": "foveabox",
        "FSAF": "fsaf", "GFL": "gfl", "GridRCNN": "grid_rcnn",
        "KnowledgeDistillationSingleStageDetector": "ld",
        "MaskScoringRCNN": "mask_scoring_rcnn", "PAA": "paa",
        "PointRend": "point_rend", "RepPointsDetector": "reppoints",
        "SCNet": "scnet", "SparseRCNN": "sparse_rcnn",
        "TridentFasterRCNN": "tridentnet", "VFNet": "vfnet",
        "YOLACT": "yolact", "YOLOV3": "yolov3", "YOLOF": "yolof",
        "FastRCNN": "fast_rcnn",
        # the two live AL families route to load_reference_config but
        # resolve here too so every reference config file maps
        "SSL_L_RetinaNet": "retinanet",
        "SSD_L_SingleStageDetector": "ssd",
    }
    if mtype in direct:
        fam = direct[mtype]
        if fam == "fast_rcnn" and _g(model, "rpn_head", "type") == "CascadeRPNHead":
            _note("crpn_fast_rcnn: Cascade-RPN proposals arrive via the "
                  "standard --proposal-file contract here")
        return fam, notes
    if mtype == "CornerNet":
        return ("centripetalnet" if bht == "CentripetalHead"
                else "cornernet"), notes
    if mtype == "RPN":
        return ("cascade_rpn" if _g(model, "rpn_head", "type") ==
                "CascadeRPNHead" else "rpn"), notes
    if mtype == "HybridTaskCascade":
        if "DetectoRS" in backbone_t or neck_t == "RFP":
            _note("DetectoRS-HTC: mapped to the cascade DetectoRS family "
                  "(HTC mask/semantic branches not modeled on the RFP trunk)")
            return "detectors", notes
        return "htc", notes
    if mtype == "CascadeRCNN":
        if "DetectoRS" in backbone_t or neck_t == "RFP":
            return "detectors", notes
        if _g(model, "roi_head", "mask_head") is not None:
            _note("cascade_mask_rcnn: cascade box stages modeled; the "
                  "per-stage mask branch is the htc family's territory")
        return "cascade_rcnn", notes
    if mtype == "MaskRCNN":
        loss_cls = _g(model, "roi_head", "bbox_head", "loss_cls", "type",
                      default="")
        return ("seesaw" if loss_cls == "SeesawLoss" else "mask_rcnn"), notes
    if mtype == "RetinaNet":
        by_head = {
            "FreeAnchorRetinaHead": "free_anchor",
            "PISARetinaHead": "pisa_retinanet",
            "GARetinaHead": "guided_anchor",
            "SABLRetinaHead": "sabl",
            "RetinaSepBNHead": "nasfpn",
            "LDHead": "ld",
        }
        if bht in by_head:
            return by_head[bht], notes
        if neck_t == "NASFPN":
            return "nasfpn", notes
        if _g(model, "bbox_head", "loss_cls", "type") == "GHMC":
            return "ghm", notes
        _note("plain (no-MEH) RetinaNet: the live retinanet family with "
              "use_meh off and the configured loss_cls")
        return "retinanet", notes
    if mtype == "SingleStageDetector":
        if "SSD" in bht:
            if bht == "PISASSDHead":
                _note("pisa_ssd: ISR-P/CARL on SSD not modeled; plain "
                      "ssd family (pisa variants exist for retina/rcnn)")
            return "ssd", notes
        raise ValueError(f"SingleStageDetector with bbox_head {bht!r} "
                         f"has no family mapping")
    if mtype == "FasterRCNN":
        if roi_t == "DoubleHeadRoIHead":
            return "double_head_rcnn", notes
        if roi_t == "DynamicRoIHead":
            return "dynamic_rcnn", notes
        if roi_t == "PISARoIHead":
            return "pisa_faster_rcnn", notes
        if _g(model, "roi_head", "bbox_roi_extractor", "type") == \
                "GenericRoIExtractor":
            return "groie", notes
        if "BFP" in neck_list_types:
            return "libra_rcnn", notes
        if neck_t == "PAFPN":
            return "pafpn", notes
        if neck_t == "FPG":
            return "fpg", notes
        if neck_t == "FPN_CARAFE":
            return "carafe", notes
        if backbone_t == "HRNet" or neck_t == "HRFPN":
            return "hrnet", notes
        if backbone_t == "ResNeSt":
            return "resnest", notes
        if _g(model, "backbone", "conv_cfg", "type") == "ConvWS":
            return "gn_ws", notes
        plugins = _g(model, "backbone", "plugins", default=[]) or []
        if any(_g(p, "cfg", "type") == "GeneralizedAttention"
               for p in plugins):
            return "empirical_attention", notes
        if _g(model, "rpn_head", "type") == "CascadeRPNHead":
            _note("crpn_faster_rcnn: trained here as faster_rcnn; the "
                  "cascade_rpn family covers the CRPN proposal stage")
        if _g(model, "rpn_head", "type") == "GARPNHead":
            _note("ga_faster_rcnn: guided-anchoring RPN not modeled for "
                  "two-stage; the guided_anchor family covers GA-Retina")
        return "faster_rcnn", notes
    raise ValueError(f"model.type {mtype!r} has no family mapping")


# ------------------------------------------------------------------ #
# field honoring
# ------------------------------------------------------------------ #

_BLOCK_COUNTS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def _ceil32(x: float) -> int:
    return int(-(-int(x) // 32) * 32)


def _find_img_scale(cfg: Dict) -> Optional[Tuple[int, int]]:
    pipe = cfg.get("test_pipeline") or _g(cfg, "data", "test", "pipeline")
    for step in pipe or []:
        if step.get("type") == "MultiScaleFlipAug":
            s = step.get("img_scale")
            if isinstance(s, list):
                s = s[len(s) // 2]  # middle scale of an ms-test sweep
            if s:
                return tuple(s)
    return None


class ReferenceZooConfig(NamedTuple):
    family: str
    model: Any            # family config dataclass instance
    train: Dict[str, Any]  # lr/momentum/wd/epochs/lr_steps/warmup/batch/clip
    notes: List[str]      # everything resolved-but-not-honored
    raw: Dict[str, Any]   # the fully merged reference dict


def _dataclass_updates(cfg: Dict, target) -> Tuple[Dict[str, Any], List[str]]:
    """Universal reference-key -> dataclass-field extraction: applies
    only to fields the target dataclass actually has; missing targets
    become notes."""
    model = cfg["model"]
    bh = model.get("bbox_head") or {}
    rbh = _g(model, "roi_head", "bbox_head") or {}
    if isinstance(rbh, list):  # cascade: per-stage heads share geometry
        rbh = rbh[0] if rbh else {}
    ag = bh.get("anchor_generator") or _g(model, "rpn_head",
                                          "anchor_generator") or {}
    coder = bh.get("bbox_coder") or {}
    loss_cls = bh.get("loss_cls") or {}
    norm = cfg.get("img_norm_cfg") or {}
    cand: Dict[str, Any] = {}
    if "num_classes" in bh:
        cand["num_classes"] = bh["num_classes"]
    elif "num_classes" in rbh:
        cand["num_classes"] = rbh["num_classes"]
    depth = _g(model, "backbone", "depth")
    if depth in _BLOCK_COUNTS:
        cand["block_counts"] = _BLOCK_COUNTS[depth]
    fs = _g(model, "backbone", "frozen_stages")
    if fs is not None:
        cand["frozen_stages"] = fs
    neck = model.get("neck")
    if isinstance(neck, dict) and "out_channels" in neck:
        cand["fpn_channels"] = neck["out_channels"]
    for src, dst in (("stacked_convs", "stacked_convs"),
                     ("feat_channels", "feat_channels")):
        if src in bh:
            cand[dst] = bh[src]
    if "strides" in ag:
        cand["strides"] = tuple(ag["strides"])
    if "ratios" in ag:
        cand["ratios"] = tuple(float(r) for r in ag["ratios"])
    for src in ("octave_base_scale", "scales_per_octave"):
        if src in ag:
            cand[src] = ag[src]
    if "target_means" in coder:
        cand["target_means"] = tuple(coder["target_means"])
    if "target_stds" in coder:
        cand["target_stds"] = tuple(coder["target_stds"])
    if "gamma" in loss_cls:
        cand["focal_gamma"] = loss_cls["gamma"]
    if "alpha" in loss_cls:
        cand["focal_alpha"] = loss_cls["alpha"]
    if "mean" in norm:
        cand["img_mean"] = tuple(norm["mean"])
        cand["img_std"] = tuple(norm["std"])
        cand["img_to_rgb"] = bool(norm.get("to_rgb", True))
    scale = _find_img_scale(cfg)
    if scale:
        lo, hi = sorted((_ceil32(scale[0]), _ceil32(scale[1])))
        cand["canvas"] = (lo, hi)  # (h, w) landscape; for_orientation flips
    names = {f.name for f in dataclasses.fields(target)}
    updates = {k: v for k, v in cand.items() if k in names}
    notes = [f"unhonored field {k}={v!r} (no {type(target).__name__}.{k})"
             for k, v in cand.items() if k not in names]
    # test_cfg -> the nested TestCfg every family shares
    tc = model.get("test_cfg") or {}
    if isinstance(tc, dict) and "test" in names and hasattr(target, "test"):
        rcnn = tc.get("rcnn") if isinstance(tc.get("rcnn"), dict) else None
        src = rcnn or tc
        t = target.test
        tkw = {}
        if "nms_pre" in tc:
            tkw["nms_pre"] = tc["nms_pre"]
        if "score_thr" in src:
            tkw["score_thr"] = src["score_thr"]
        if "max_per_img" in src:
            tkw["max_per_img"] = src["max_per_img"]
        iou = _g(src, "nms", "iou_threshold")
        if iou is not None:
            tkw["nms_iou_thr"] = iou
        if tkw:
            updates["test"] = dataclasses.replace(t, **tkw)
    return updates, notes


def _train_settings(cfg: Dict) -> Dict[str, Any]:
    opt = cfg.get("optimizer") or {}
    lrc = cfg.get("lr_config") or {}
    out = {
        "optimizer": str(opt.get("type", "SGD")).lower(),
        "lr": opt.get("lr", 0.02),
        "momentum": opt.get("momentum", 0.9),
        "weight_decay": opt.get("weight_decay", 1e-4),
        "epochs": (_g(cfg, "runner", "max_epochs")
                   or cfg.get("total_epochs") or 12),
        "lr_steps": tuple(lrc.get("step", ()) or ()),
        "warmup_iters": (lrc.get("warmup_iters", 0)
                         if lrc.get("warmup") else 0),
        "warmup_ratio": lrc.get("warmup_ratio", 1.0),
        "batch_size": _g(cfg, "data", "samples_per_gpu", default=2),
        "grad_clip": _g(cfg, "optimizer_config", "grad_clip", "max_norm"),
    }
    mult = _g(opt, "paramwise_cfg", "custom_keys", "backbone", "lr_mult")
    if mult is not None:
        out["backbone_lr_mult"] = mult
    return out


def map_reference_zoo_config(path_or_cfg, mini: bool = False
                             ) -> ReferenceZooConfig:
    """Reference zoo config file -> (family, our config dataclass with
    the core fields honored, train settings, notes). mini=True keeps
    the family's tiny smoke geometry (num_classes still honored) —
    the CLI's --mini contract."""
    cfg = (load_mmdet_config(path_or_cfg) if isinstance(path_or_cfg, str)
           else path_or_cfg)
    family, notes = resolve_zoo_family(cfg)
    from .config import (ZOO_FAMILIES, RetinaNetConfig, SSDConfig,
                         tiny_test_config)
    if family == "retinanet":
        # plain upstream RetinaNet: the live family with MEH off and the
        # configured loss (the AL monolithic configs go through
        # load_reference_config instead, which honors every AL key)
        base = tiny_test_config() if mini else RetinaNetConfig()
        base = dataclasses.replace(
            base, use_meh=bool(cfg["model"]["type"] == "SSL_L_RetinaNet"),
            cls_loss=("edl_softmax_focal"
                      if "SSL" in cfg["model"]["type"] else "focal"))
    elif family == "ssd":
        base = (SSDConfig(width_mult=0.125, max_gt=8) if mini
                else SSDConfig())
        base = dataclasses.replace(
            base, use_meh=bool(cfg["model"]["type"] == "SSD_L_SingleStageDetector"))
    else:
        full_cls, tiny_fn = ZOO_FAMILIES[family]
        base = tiny_fn() if mini else full_cls()
    updates, extra = _dataclass_updates(cfg, base)
    if mini:  # tiny geometry wins; classes still honored for the data
        updates = {k: v for k, v in updates.items() if k == "num_classes"}
    model = dataclasses.replace(base, **updates) if updates else base
    return ReferenceZooConfig(family, model, _train_settings(cfg),
                              notes + extra, cfg)
