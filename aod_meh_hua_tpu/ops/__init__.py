"""Core detection numerics: pure-jax, static-shape, fully vmappable.

Parity bedrock for the framework (see SURVEY.md section 7 build order,
stage 1). Every function here mirrors the observable numerics of an
mmdet-2.13 primitive used by the reference AL pipeline, re-expressed as
fixed-shape tensor programs that XLA can fuse and tile onto the MXU/VPU.
"""

from .bbox import bbox_overlaps, delta_encode, delta_decode, bbox_area
from .anchors import (AnchorGenerator, SSDAnchorGenerator,
                      YOLOAnchorGenerator, anchor_valid_flags)
from .assigner import (max_iou_assign, anchor_targets, atss_assign,
                       region_assign)
from .losses import (
    sigmoid_focal_loss,
    edl_softmax_focal_loss,
    edl_relu_loss,
    l1_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
    weight_reduce_loss,
)
from .losses import (
    binary_cross_entropy_with_logits,
    quality_focal_loss,
    distribution_focal_loss,
    iou_loss,
    giou_loss,
    diou_loss,
    ciou_loss,
)
from .nms import multiclass_nms, batched_multiclass_nms, grouped_nms
from .roi_align import roi_align, multilevel_roi_align, map_roi_levels
from .sampler import random_sample_pos_neg, SampleResult
from .points import (
    fcos_points,
    fcos_targets_single,
    centerness_target,
    distance2bbox,
)
from .dirichlet import dirichlet_mutual_information, dirichlet_mi_sampled
from .hungarian import hungarian_match
from .corner_pool import corner_pool
from .hua import (
    object_membership,
    lambda_rescale,
    hua_object_scores,
    hua_scale_scores,
    parse_agg_spec,
)
