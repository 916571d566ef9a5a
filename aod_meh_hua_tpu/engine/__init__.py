"""Train / eval / score engine: one jit-compiled step per pipeline.

The reference's Runner + hooks + dual-optimizer machinery (SURVEY.md
section 2.3) collapses into three pure functions over pytrees:
train_step (supervised + MEH phases fused in a single backward),
eval_step (forward -> decode -> NMS), and score_step (forward -> NMS ->
Dirichlet MI -> HUA), each built once per config and jit-compiled.
"""

from .batch import Batch, EvalBatch
from .train import TrainState, create_train_state, make_train_step, schedule_lr
from .eval import make_eval_step, detections_to_per_class
from .score import make_score_step
from .two_stage import (
    make_cascade_train_step,
    make_cascade_eval_step,
    make_faster_rcnn_train_step,
    make_faster_rcnn_eval_step,
    make_proposal_fn,
)
from .fcos import make_fcos_train_step, make_fcos_eval_step
from .atss import make_atss_train_step, make_atss_eval_step
from .gfl import make_gfl_train_step, make_gfl_eval_step
from .yolo import make_yolo_train_step, make_yolo_eval_step
