"""Data layer: VOC datasets, deterministic preprocessing, fixed-shape batching.

TPU-first replacement for the reference's mmcv pipeline + DataContainer
collate (SURVEY.md section 2.8): every sample is resized keep-ratio,
normalized, and padded into ONE static canvas so the jitted steps compile
once; GT pads to max_gt with validity masks; per-image anchor-validity
masks are precomputed on the host.
"""

from .voc import VOCDataset, VOC_CLASSES, ConcatVOC
from .pipeline import PipelineConfig, prepare_sample
from .loader import TrainLoader, EvalLoader
from .canvas_cache import CanvasCache, open_canvas_cache
from .coco import CocoDataset, COCO_CLASSES
from .lvis import LVISDataset, eval_lvis_map
from .extra_datasets import (DEEPFASHION_CLASSES, DeepFashionDataset,
                             WIDERFaceDataset)
from .wrappers import ClassBalancedDataset
from .instaboost import instaboost, instaboost_from_cfg
from .albu import Albu, albu_from_cfg
from .splits import (init_split, init_split_all, init_split_disjoint,
                     init_split_double, update_labeled_set,
                     update_labeled_set_plain, update_labeled_set_reselect,
                     save_cycle_state, load_cycle_state)
