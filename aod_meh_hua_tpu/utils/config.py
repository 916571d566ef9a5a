"""Config dataclasses + a loader for reference-style config files.

The reference wires everything through mmcv Config dicts + registries
(configs/_base_/Config_RetinaNet.py, Config_SSD.py). Here configs are
plain frozen dataclasses consumed by explicit constructors — the XLA-
friendly shape — with `load_reference_config` providing compatibility
with the reference's plain-python config files at the CLI layer.
"""

from __future__ import annotations

import dataclasses
import runpy
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class AnchorConfig:
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    octave_base_scale: int = 4
    scales_per_octave: int = 3

    @property
    def num_anchors(self) -> int:
        return len(self.ratios) * self.scales_per_octave


@dataclass(frozen=True)
class TestCfg:
    """Post-processing config (reference test_cfg, Config_RetinaNet.py:79-85)."""

    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100
    pre_nms_cands: int = 1000  # static candidate cap for fixed-shape NMS
    # per-level top-k via jax.lax.approx_max_k (TPU partial reduction,
    # recall ~0.99) instead of the exact full sort. Tail-rank candidate
    # misses are selection-neutral in practice (100 NMS survivors of
    # 1000); parity/eval tests run exact mode (default False).
    fast_topk: bool = False


@dataclass(frozen=True)
class HUACfg:
    """Uncertainty scoring config (Config_RetinaNet.py:14-19 + Lambda_L2.py)."""

    pool: str = "Entropy_NMS"           # Random | Entropy_ALL | Entropy_NMS | Entropy_NoNMS
    unc_type: str = "epistemic"          # epistemic | aleatoric | total
    agg: str = "objectSum_scaleMax_classSum"
    # ablation surface (Lambda_L2.py:571-633): aggregation order
    # ('class_first' = AggregateObjScaleUnc, 'scale_first' = ChangeOrder
    # + AggregateObjClassScaleUnc) and the clsW class-count weighting
    agg_order: str = "class_first"
    cls_weight: bool = False
    obj_score_thr: float = 0.3           # GetObjectIdx score_thr (driver flag score_thr)
    memb_iou_thr: float = 0.5            # GetObjectIdx iou_thr
    fg_score_thr: float = 0.3            # FG anchor confidence gate
    lambda_eps: float = 1e-7
    lambda_scale: float = 25.0
    mi_mode: str = "closed"              # closed | sampled (parity mode)
    mi_samples: int = 500
    mi_chunk: int = 50


@dataclass(frozen=True)
class RetinaNetConfig:
    """MEH-RetinaNet (reference Config_RetinaNet.py model dict)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)   # (H, W): keep-ratio (1000, 600) resize + /32 pad
    # backbone (ResNet-50-FPN); block_counts/width shrink for unit tests
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    # neck
    fpn_channels: int = 256
    # head
    stacked_convs: int = 4
    feat_channels: int = 256
    anchor: AnchorConfig = field(default_factory=AnchorConfig)
    # bbox coder
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    # assigner (train_cfg)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    gt_max_assign_all: bool = True
    # losses
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    cls_loss: str = "edl_softmax_focal"  # edl_softmax_focal | focal | edl_focal
    bbox_loss: str = "l1"
    meh_loss: str = "l2"                 # l2 (Lambda_L2) | l1 (Lambda_L1) | msle (Lambda_MSLE)
    meh_loss_weight: float = 5.0         # Lambda_L2.py:241 final *5
    use_meh: bool = True                 # False = Lambda_L2Net_NoL ablation
    # data batching
    max_gt: int = 64
    # image normalization (img_norm_cfg, Config_RetinaNet.py:99-100) —
    # used on-device when batches arrive as uint8 (4x less infeed traffic)
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    # dtype
    compute_dtype: str = "float32"       # float32 | bfloat16
    # MC-dropout baseline: channel dropout after every ReLU when > 0
    # (the reference's append_dropout surgery, functions.py:492-505)
    mc_dropout: float = 0.0
    # rematerialize backbone blocks in the backward pass (jax.checkpoint):
    # trades ~25% extra FLOPs for activation memory -> larger train batches
    remat: bool = False
    # stem as space-to-depth 4x4 conv (mathematically identical to the
    # 7x7/2 conv, same param layout; better MXU utilization on TPU)
    stem_s2d: bool = False
    # backbone convs as dynamic int8 PTQ (models/quant.py) — SCORING/EVAL
    # mode only (v5e int8 MXU peak is 2x bf16); gated by the acquisition
    # parity test before any production use
    backbone_int8: bool = False
    # backbone 1x1 convs as reshaped matmuls (models/resnet.py
    # Conv1x1Matmul): MEASURED DEAD END on-chip (292.6 vs 320.6 img/s
    # e2e, 2026-08-19) — keep False; superseded by fused_blocks
    conv1x1_matmul: bool = False
    # whole-bottleneck Pallas fusion for the HBM-bandwidth-bound C2/C3
    # stride-1 blocks (ops/fused_block.py; exact math, identical param
    # tree). SCORING/EVAL ONLY — the kernel defines no VJP. Takes
    # precedence over conv1x1_matmul/backbone_int8 inside fused blocks.
    fused_blocks: bool = False
    # which backbone stages the fused path covers when fused_blocks is
    # on (stride-1, >=128-channel blocks only; see models/resnet.py)
    fused_stages: Tuple[bool, ...] = (True, True, False, False)
    test: TestCfg = field(default_factory=TestCfg)
    hua: HUACfg = field(default_factory=HUACfg)

    family = "retinanet"

    @property
    def backbone_channels(self) -> Tuple[int, ...]:
        w = self.stem_width
        return (4 * w, 8 * w, 16 * w, 32 * w)  # C2..C5 bottleneck expansions

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes  # 'relu'/'sigmoid' activation: no BG channel

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.anchor.strides, ratios=self.anchor.ratios,
            octave_base_scale=self.anchor.octave_base_scale,
            scales_per_octave=self.anchor.scales_per_octave,
        )

    def for_orientation(self, orientation: str) -> "RetinaNetConfig":
        """Per-orientation variant: `canvas` is landscape; portrait
        batches compile against the transposed canvas (the TPU analog of
        the reference's aspect-ratio-grouped batching + per-batch pad)."""
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        assert h % 32 == 0 and w % 32 == 0, "canvas must be divisible by 32"
        sizes = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        for _ in range(len(self.anchor.strides) - 3):
            ph, pw = sizes[-1]
            sizes.append(((ph + 1) // 2, (pw + 1) // 2))
        return sizes

    def level_bounds(self):
        """Static (start, end) anchor offsets per level (full maps)."""
        a = self.anchor.num_anchors
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            n = h * w * a
            bounds.append((off, off + n))
            off += n
        return bounds

    def topk_level_bounds(self):
        """Static (start, end) offsets after per-level nms_pre top-k."""
        a = self.anchor.num_anchors
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            n = min(h * w * a, self.test.nms_pre)
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class SSDAnchorCfg:
    strides: Tuple[int, ...] = (8, 16, 32, 64, 100, 300)
    ratios: Tuple[Tuple[float, ...], ...] = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))
    basesize_ratio_range: Tuple[float, float] = (0.15, 0.9)
    input_size: int = 300


@dataclass(frozen=True)
class SSDConfig:
    """MEH-SSD300-VGG16 (reference Config_SSD.py model dict).

    One fixed square canvas (the reference warps with keep_ratio=False,
    Config_SSD.py:106), so no orientation bucketing.
    """

    num_classes: int = 20
    input_size: int = 300
    # backbone: VGG16; width_mult shrinks channels for unit tests
    width_mult: float = 1.0
    neck_out_channels: Tuple[int, ...] = (512, 1024, 512, 256, 256, 256)
    level_strides: Tuple[int, ...] = (2, 2, 1, 1)
    level_paddings: Tuple[int, ...] = (1, 1, 0, 0)
    l2_norm_scale: float = 20.0
    anchor: SSDAnchorCfg = field(default_factory=SSDAnchorCfg)
    # bbox coder
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    # assigner (train_cfg): neg threshold 0.5, single-anchor low-quality
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.0
    gt_max_assign_all: bool = False
    # losses: OHEM CE (neg:pos = 3) + smooth L1
    neg_pos_ratio: int = 3
    smoothl1_beta: float = 1.0
    meh_loss: str = "l2"
    meh_loss_weight: float = 2.0        # My_L_ssd_head.py:224 final *2
    meh_weighted: bool = False          # loss_single_L without mineW kwarg
    use_meh: bool = True
    max_gt: int = 64
    # img_norm_cfg (Config_SSD.py:87): caffe-style std = 1
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.02, nms_iou_thr=0.5, max_per_img=200))
    hua: HUACfg = field(default_factory=HUACfg)

    family = "ssd"

    @property
    def canvas(self) -> Tuple[int, int]:
        return (self.input_size, self.input_size)

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes + 1  # explicit background class

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def for_orientation(self, orientation: str) -> "SSDConfig":
        return self  # square warp: one canvas for both orientations

    def build_anchor_generator(self):
        from ..ops.anchors import SSDAnchorGenerator

        return SSDAnchorGenerator(
            strides=self.anchor.strides, ratios=self.anchor.ratios,
            basesize_ratio_range=self.anchor.basesize_ratio_range,
            input_size=self.anchor.input_size,
        )

    def featmap_sizes(self):
        sizes = {300: [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)],
                 512: [(64, 64), (32, 32), (16, 16), (8, 8), (6, 6), (4, 4), (1, 1)]}
        return sizes[self.input_size]

    def level_bounds(self):
        gen = self.build_anchor_generator()
        bounds, off = [], 0
        for (h, w), a in zip(self.featmap_sizes(), gen.num_base_anchors):
            n = h * w * a
            bounds.append((off, off + n))
            off += n
        return bounds

    def topk_level_bounds(self):
        gen = self.build_anchor_generator()
        bounds, off = [], 0
        for (h, w), a in zip(self.featmap_sizes(), gen.num_base_anchors):
            n = min(h * w * a, self.test.nms_pre)
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class RPNCfg:
    """RPN anchors / targets / proposal settings
    (configs/_base_/models/faster_rcnn_r50_fpn.py rpn_head + train_cfg.rpn
    + *_cfg.rpn_proposal)."""

    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_scale: int = 8
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # assigner (train_cfg.rpn.assigner)
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.3
    min_pos_iou: float = 0.3
    # sampler (RandomSampler num=256, pos_fraction=0.5; neg_pos_ub >= 0
    # caps negatives at neg_pos_ub * num_pos — Libra sets 5)
    sampler_num: int = 256
    pos_fraction: float = 0.5
    neg_pos_ub: int = -1
    # proposal generation
    train_nms_pre: int = 2000
    train_max_per_img: int = 1000
    test_nms_pre: int = 1000
    test_max_per_img: int = 1000
    nms_iou_thr: float = 0.7

    @property
    def num_anchors(self) -> int:
        return len(self.ratios)


@dataclass(frozen=True)
class RCNNCfg:
    """RoI head settings (roi_head + train_cfg.rcnn)."""

    # assigner (match_low_quality=False)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.5
    # sampler (num=512, pos_fraction=0.25, add_gt_as_proposals=True)
    sampler_num: int = 512
    pos_fraction: float = 0.25
    # RoIAlign (output_size=7, strides 4-32, finest_scale=56); the
    # reference's sampling_ratio=0 is adaptive — fixed 2 here (static shapes)
    roi_size: int = 7
    sampling_ratio: int = 2
    finest_scale: int = 56
    roi_strides: Tuple[int, ...] = (4, 8, 16, 32)
    fc_channels: int = 1024
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)


@dataclass(frozen=True)
class FasterRCNNConfig:
    """Faster R-CNN R50-FPN, VOC classes (the upstream two-stage family
    the reference keeps registered; configs/pascal_voc/ uses the same
    1000x600 keep-ratio scale as RetinaNet)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    fpn_channels: int = 256
    rpn: RPNCfg = field(default_factory=RPNCfg)
    rcnn: RCNNCfg = field(default_factory=RCNNCfg)
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    # "dcn"/"mdcn": deformable conv2 in backbone stages c3-c5
    # (reference configs/dcn/faster_rcnn_r50_fpn_{dconv,mdconv}_c3-c5_*)
    backbone_dcn: Optional[str] = None
    # GCNet ContextBlock ratio (1/4 or 1/16) after conv3 in c3-c5
    # (reference configs/gcnet/mask_rcnn_r50_fpn_r{4,16}_gcb_c3-c5_*)
    backbone_gcb_ratio: Optional[float] = None
    # resnet | resnext | res2net | regnet (models/backbones.py; the
    # reference's configs/{resnext x101,res2net,regnet}/ variants)
    backbone_type: str = "resnet"
    resnext_groups: int = 32
    resnext_base_width: int = 4
    res2net_scales: int = 4
    res2net_base_width: int = 26
    regnet_arch: str = "regnetx_3.2gf"
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.5, max_per_img=100,
        pre_nms_cands=1000))

    family = "faster_rcnn"

    @property
    def backbone_channels(self) -> Tuple[int, ...]:
        w = self.stem_width
        return (4 * w, 8 * w, 16 * w, 32 * w)

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def for_orientation(self, orientation: str) -> "FasterRCNNConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def build_anchor_generator(self):
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.rpn.anchor_strides, ratios=self.rpn.ratios,
            octave_base_scale=self.rpn.anchor_scale, scales_per_octave=1,
        )

    def featmap_sizes(self):
        h, w = self.canvas
        assert h % 32 == 0 and w % 32 == 0, "canvas must be divisible by 32"
        sizes = [(h // 4, w // 4), (h // 8, w // 8), (h // 16, w // 16),
                 (h // 32, w // 32)]
        for _ in range(len(self.rpn.anchor_strides) - 4):
            ph, pw = sizes[-1]
            sizes.append(((ph + 1) // 2, (pw + 1) // 2))
        return sizes

    def level_bounds(self):
        a = self.rpn.num_anchors
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            n = h * w * a
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class CascadeRCNNConfig(FasterRCNNConfig):
    """Cascade R-CNN R50-FPN (reference
    configs/_base_/models/cascade_rcnn_r50_fpn.py): the Faster R-CNN
    trunk with three progressively tighter RoI stages
    (pos thr 0.5/0.6/0.7, stds 0.1/0.05/0.033, class-agnostic reg,
    stage loss weights 1/0.5/0.25)."""

    num_stages: int = 3
    stage_pos_iou_thrs: Tuple[float, ...] = (0.5, 0.6, 0.7)
    stage_stds: Tuple[Tuple[float, ...], ...] = (
        (0.1, 0.1, 0.2, 0.2),
        (0.05, 0.05, 0.1, 0.1),
        (0.033, 0.033, 0.067, 0.067),
    )
    stage_loss_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)

    family = "cascade_rcnn"


@dataclass(frozen=True)
class HTCConfig(CascadeRCNNConfig):
    """Hybrid Task Cascade (reference configs/htc/htc_r50_fpn_1x_coco.py
    + roi_heads/htc_roi_head.py): the cascade trunk with per-stage mask
    heads (info flow through conv_res), a fused semantic branch at
    stride 8 (CE weight .2) added to both bbox and mask RoI features,
    and interleaved mask training on the refined, re-sampled boxes."""

    mask_roi_size: int = 14
    mask_size: int = 28
    mask_convs: int = 4
    mask_channels: int = 256
    gt_mask_raster: int = 56
    seg_classes: int = 183
    seg_ignore: int = 255
    seg_loss_weight: float = 0.2

    family = "htc"


@dataclass(frozen=True)
class SCNetConfig(HTCConfig):
    """SCNet (reference configs/scnet/scnet_r50_fpn_1x_coco.py +
    roi_heads/scnet_roi_head.py): the HTC trunk where the per-stage mask
    heads collapse to ONE 12-conv (residual-block) mask head run after
    the last bbox stage, fed by the relayed positive shared-fc features
    (feature_relay_head) and a global-context vector (glbctx_head,
    multilabel BCE x3) fused into every RoI; semantic fusion as HTC."""

    mask_res_blocks: int = 6     # 12 convs, conv_to_res=True
    glbctx_loss_weight: float = 3.0

    family = "scnet"


@dataclass(frozen=True)
class MaskRCNNConfig(FasterRCNNConfig):
    """Mask R-CNN R50-FPN (reference
    configs/_base_/models/mask_rcnn_r50_fpn.py): the Faster R-CNN trunk
    plus an FCN mask head — RoIAlign 14 on the sampled positives,
    4 convs + deconv + 1x1 to per-class 28x28 masks, BCE on the gt-class
    channel. gt_mask_raster is the TPU transport redesign: per-gt
    box-aligned rasters instead of full-resolution bitmaps (see
    engine/mask_rcnn.py docstring)."""

    mask_roi_size: int = 14
    mask_size: int = 28
    mask_convs: int = 4
    mask_channels: int = 256
    gt_mask_raster: int = 56

    family = "mask_rcnn"


@dataclass(frozen=True)
class SeesawMaskRCNNConfig(MaskRCNNConfig):
    """Seesaw-loss Mask R-CNN (reference configs/seesaw_loss/
    mask_rcnn_r50_fpn_random_seesaw_loss_mstrain_2x_lvis_v1.py +
    losses/seesaw_loss.py): long-tailed instance segmentation — the
    classifier grows a 2-way objectness pair (C+2 channels), the class
    CE runs on positives only with the seesaw mitigation (p=0.8) /
    compensation (q=2.0) log-weights from cross-step cumulative class
    counts, and eval rescores softmax(classes) * p(pos)."""

    seesaw_p: float = 0.8
    seesaw_q: float = 2.0
    seesaw_eps: float = 1e-2

    family = "seesaw"

    @property
    def cls_channels(self) -> int:
        return self.num_classes + 2


@dataclass(frozen=True)
class PointRendConfig(MaskRCNNConfig):
    """PointRend (reference configs/point_rend/point_rend_r50_caffe_
    fpn_mstrain_1x_coco.py + roi_heads/point_rend_roi_head.py +
    mask_heads/{coarse_mask_head,mask_point_head}.py): the Mask R-CNN
    trunk where the FCN mask head is replaced by a 7x7 CoarseMaskHead
    (SimpleRoIAlign 14 on the stride-4 level, downsample conv + 2 FCs)
    plus a point head (3-layer point MLP) trained on uncertainty-
    importance-sampled points and applied at eval through iterative
    subdivision refinement of the coarse mask."""

    mask_roi_size: int = 14   # SimpleRoIAlign output on the P2 level
    mask_size: int = 7        # coarse head output (14 // downsample 2)
    coarse_fcs: int = 2
    coarse_fc_channels: int = 1024
    coarse_channels: int = 256
    point_fcs: int = 3
    point_fc_channels: int = 256
    # train_cfg.rcnn (point_rend config): num_points 14*14,
    # oversample 3, importance 0.75
    num_points: int = 196
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    # test_cfg.rcnn: 5 subdivision steps of x2 from 7 -> 224,
    # 28*28 refined points per step
    subdivision_steps: int = 5
    subdivision_num_points: int = 784
    subdivision_scale: int = 2

    family = "point_rend"


@dataclass(frozen=True)
class MaskScoringRCNNConfig(MaskRCNNConfig):
    """Mask Scoring R-CNN (reference
    configs/ms_rcnn/ms_rcnn_r50_fpn_1x_coco.py +
    mmdet/models/roi_heads/mask_heads/maskiou_head.py): Mask R-CNN plus
    a MaskIoU head — 4 convs (last stride 2) + 2 FCs -> per-class mask
    IoU, L2 loss weight 0.5 on positives whose IoU target is > 0; eval
    reports mask_score = bbox_score * maskiou[label]."""

    maskiou_convs: int = 4
    maskiou_fcs: int = 2
    maskiou_fc_channels: int = 1024
    mask_thr_binary: float = 0.5
    maskiou_loss_weight: float = 0.5

    family = "mask_scoring_rcnn"


@dataclass(frozen=True)
class RPNOnlyConfig(FasterRCNNConfig):
    """Proposal-only RPN (reference mmdet/models/detectors/rpn.py +
    configs/rpn/rpn_r50_fpn_1x_coco.py): backbone + FPN + RPNHead
    trained alone on class-agnostic gt boxes; eval emits the proposals
    as single-class detections and is scored by AR@k proposal recall
    (fast_eval_recall)."""

    family = "rpn"

    @property
    def num_fg_classes(self) -> int:
        return 1


@dataclass(frozen=True)
class GRoIEFasterRCNNConfig(FasterRCNNConfig):
    """Faster R-CNN with the Generic RoI Extractor (reference
    configs/groie/faster_rcnn_r50_fpn_groie_1x_coco.py +
    roi_heads/roi_extractors/generic_roi_extractor.py): RoIAlign the
    SAME rois from EVERY pyramid level (no finest_scale routing), a
    shared 5x5 pre-conv per level, sum aggregation, and a
    GeneralizedAttention ('0100', 6 heads, kv_stride 2) post module."""

    roi_extractor: str = "groie"

    family = "groie"


@dataclass(frozen=True)
class EmpiricalAttentionConfig(FasterRCNNConfig):
    """Faster R-CNN with GeneralizedAttention blocks after conv2 in
    backbone stages c4-c5 (reference configs/empirical_attention/
    faster_rcnn_r50_fpn_attention_{0010,1111}_1x_coco.py — the
    attention_type mask selects the energy terms; the default '0010'
    keeps only the bias-&-key-content term)."""

    backbone_attention: str = "0010"

    family = "empirical_attention"


@dataclass(frozen=True)
class GNWSFasterRCNNConfig(FasterRCNNConfig):
    """Faster R-CNN with GroupNorm + Weight Standardization everywhere
    (reference configs/gn+ws/faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py:
    ConvWS + GN(32) in backbone and FPN, Shared4Conv1FCBBoxHead RoI
    head). weight_standardize=False gives the plain-GN 'gn' family."""

    weight_standardize: bool = True

    family = "gn_ws"


@dataclass(frozen=True)
class FPGFasterRCNNConfig(FasterRCNNConfig):
    """Faster R-CNN with the Feature Pyramid Grids neck (reference
    configs/fpg/faster_rcnn_r50_fpg_crop640_50e_coco.py +
    mmdet/models/necks/fpg.py): 9 stacked bottom-up pathway stages over
    a 5-level grid with lateral / same-up / across-down / skip
    transitions (all act-conv-norm), staircase skip_inds."""

    neck_type: str = "fpg"
    fpg_stack_times: int = 9

    family = "fpg"


@dataclass(frozen=True)
class HRNetFasterRCNNConfig(FasterRCNNConfig):
    """Faster R-CNN with the HRNetV2p backbone + HRFPN neck (reference
    configs/hrnet/faster_rcnn_hrnetv2p_w{18,32}_1x_coco.py +
    mmdet/models/backbones/hrnet.py + necks/hrfpn.py): parallel
    multi-resolution branches with exchange units instead of a serial
    trunk; the neck concatenates all branches at stride 4 and avg-pools
    the pyramid."""

    backbone_type: str = "hrnet"
    neck_type: str = "hrfpn"
    hrnet_width: int = 32
    hrnet_stage_modules: Tuple[int, ...] = (1, 4, 3)
    hrnet_num_blocks: int = 4
    hrnet_stage1_blocks: int = 4
    hrnet_stem_width: int = 64

    family = "hrnet"


@dataclass(frozen=True)
class ResNeStFasterRCNNConfig(FasterRCNNConfig):
    """Faster R-CNN with the ResNeSt split-attention backbone (reference
    configs/resnest/faster_rcnn_s50_fpn_syncbn-backbone+head_*.py +
    mmdet/models/backbones/resnest.py): radix-2 split-attention conv2,
    deep V1d stem, avg-down shortcuts."""

    backbone_type: str = "resnest"
    resnest_radix: int = 2

    family = "resnest"


@dataclass(frozen=True)
class DetectoRSConfig(CascadeRCNNConfig):
    """DetectoRS (reference configs/detectors/
    detectors_cascade_rcnn_r50_1x_coco.py + mmdet/models/backbones/
    detectors_resnet.py + necks/rfp.py): Cascade R-CNN with Switchable
    Atrous Convolution in backbone stages 2-4 and a 2-step Recursive
    Feature Pyramid (FPN -> ASPP feedback -> a second rfp-backbone
    unroll -> the same FPN -> zero-init sigmoid-gated fusion)."""

    stage_with_sac: Tuple[bool, ...] = (False, True, True, True)
    rfp_steps: int = 2
    aspp_out_channels: int = 64  # x4 branches = fpn_channels

    family = "detectors"


@dataclass(frozen=True)
class TridentNetConfig(FasterRCNNConfig):
    """TridentNet (reference configs/tridentnet/
    tridentnet_r50_caffe_1x_coco.py + mmdet/models/backbones/
    trident_resnet.py + detectors/trident_faster_rcnn.py +
    roi_heads/trident_roi_head.py): a C4 Faster R-CNN whose stage-3
    conv2s share ONE kernel applied at dilations (1, 2, 3) — three
    scale-specialized branches riding the batch axis at train time
    (gts replicated branch-major), with only branch test_branch_idx=1
    run at eval. RoI head = single-level RoIAlign 14 on C4 + the conv5
    ResLayer (stride 2) + avg-pool BBoxHead (faster_rcnn_r50_caffe_c4).
    Caffe normalization (BGR, std 1)."""

    block_counts: Tuple[int, ...] = (3, 4, 6)
    head_blocks: int = 3
    trident_dilations: Tuple[int, ...] = (1, 2, 3)
    test_branch_idx: int = 1
    c4_stride: int = 16
    anchor_scales: Tuple[float, ...] = (2.0, 4.0, 8.0, 16.0, 32.0)
    rpn: RPNCfg = field(default_factory=lambda: RPNCfg(
        anchor_strides=(16,), ratios=(0.5, 1.0, 2.0),
        train_nms_pre=4000, train_max_per_img=500,
        test_nms_pre=2000, test_max_per_img=1000))
    rcnn: RCNNCfg = field(default_factory=lambda: RCNNCfg(
        sampler_num=128, pos_fraction=0.5, roi_size=14, roi_strides=(16,)))
    img_mean: Tuple[float, ...] = (103.530, 116.280, 123.675)
    img_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    img_to_rgb: bool = False

    family = "tridentnet"

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self.rpn.ratios) * len(self.anchor_scales)

    def build_anchor_generator(self):
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(strides=self.rpn.anchor_strides,
                               ratios=self.rpn.ratios,
                               scales=self.anchor_scales)

    def featmap_sizes(self):
        h, w = self.canvas
        assert h % 32 == 0 and w % 32 == 0
        return [(h // self.c4_stride, w // self.c4_stride)]

    def level_bounds(self):
        (h, w), = self.featmap_sizes()
        return [(0, h * w * self.num_anchors_per_cell)]


@dataclass(frozen=True)
class CascadeRPNConfig(RPNOnlyConfig):
    """Cascade RPN (reference configs/cascade_rpn/
    crpn_r50_caffe_fpn_1x_coco.py + mmdet/models/dense_heads/
    cascade_rpn_head.py): two-stage anchor refinement with a single
    square anchor per cell — stage 0 adapts features with a dilated
    conv and regresses on region-assigned anchors (IoU loss on decoded
    boxes, no cls); stage 1 runs an anchor-offset deform conv on the
    bridged features over the refined anchors (MaxIoU .7/.7/.3 +
    RandomSampler 256, BCE + IoU loss). Proposal NMS iou 0.8."""

    rpn: RPNCfg = field(default_factory=lambda: RPNCfg(
        ratios=(1.0,), pos_iou_thr=0.7, neg_iou_thr=0.7, min_pos_iou=0.3,
        sampler_num=256, pos_fraction=0.5, nms_iou_thr=0.8,
        train_nms_pre=2000, train_max_per_img=2000,
        test_nms_pre=2000, test_max_per_img=2000))
    s0_stds: Tuple[float, ...] = (0.1, 0.1, 0.5, 0.5)
    s1_stds: Tuple[float, ...] = (0.05, 0.05, 0.1, 0.1)
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5
    stage0_dilation: int = 3

    family = "cascade_rpn"


@dataclass(frozen=True)
class FastRCNNConfig(FasterRCNNConfig):
    """Fast R-CNN (reference mmdet/models/detectors/fast_rcnn.py +
    configs/fast_rcnn/fast_rcnn_r50_fpn_1x_coco.py): backbone + FPN +
    RoI head consuming EXTERNALLY supplied proposals (the reference's
    proposal_file .pkls; here fixed-width [B, P, 4] arrays with a valid
    mask). num_proposals is P, the per-image proposal slot count."""

    num_proposals: int = 512

    family = "fast_rcnn"


@dataclass(frozen=True)
class LibraRCNNConfig(FasterRCNNConfig):
    """Libra R-CNN (reference
    configs/libra_rcnn/libra_faster_rcnn_r50_fpn_1x_coco.py +
    mmdet/models/necks/bfp.py + core/bbox/samplers/
    {instance_balanced_pos,iou_balanced_neg}_sampler.py +
    models/losses/balanced_l1_loss.py): Faster R-CNN plus a Balanced
    Feature Pyramid after the FPN, the IoU-balanced CombinedSampler in
    the RoI head, Balanced L1 bbox regression, and RPN neg_pos_ub=5."""

    bfp_refine_level: int = 2
    bfp_refine_type: str = "non_local"
    num_bins: int = 3
    balanced_l1_alpha: float = 0.5
    balanced_l1_gamma: float = 1.5
    balanced_l1_beta: float = 1.0
    rpn: RPNCfg = field(default_factory=lambda: RPNCfg(neg_pos_ub=5))

    family = "libra_rcnn"


@dataclass(frozen=True)
class PAFPNFasterRCNNConfig(FasterRCNNConfig):
    """Faster R-CNN with the Path Aggregation FPN (reference
    configs/pafpn/faster_rcnn_r50_pafpn_1x_coco.py +
    mmdet/models/necks/pafpn.py): the only delta is the neck's extra
    bottom-up path."""

    neck_type: str = "pafpn"

    family = "pafpn"


@dataclass(frozen=True)
class DynamicRCNNConfig(FasterRCNNConfig):
    """Dynamic R-CNN (reference
    configs/dynamic_rcnn/dynamic_rcnn_r50_fpn_1x_coco.py +
    mmdet/models/roi_heads/dynamic_roi_head.py): Faster R-CNN whose RoI
    assigner IoU threshold and SmoothL1 beta adapt to the training
    statistics every update_iter_interval iterations; proposal NMS at
    IoU 0.85."""

    iou_topk: int = 75
    beta_topk: int = 10
    update_iter_interval: int = 100
    initial_iou: float = 0.4
    initial_beta: float = 1.0
    rpn: RPNCfg = field(default_factory=lambda: RPNCfg(nms_iou_thr=0.85))

    family = "dynamic_rcnn"


@dataclass(frozen=True)
class DoubleHeadRCNNConfig(FasterRCNNConfig):
    """Double-Head R-CNN (reference
    configs/double_heads/dh_faster_rcnn_r50_fpn_1x_coco.py +
    mmdet/models/roi_heads/double_roi_head.py + bbox_heads/
    double_bbox_head.py): the RoI head splits into a convolutional
    regression branch (BasicResBlock + 4 bottlenecks, fed 1.3x-rescaled
    RoIs) and a fully connected classification branch; both losses at
    weight 2.0."""

    reg_roi_scale_factor: float = 1.3
    dh_num_convs: int = 4
    dh_num_fcs: int = 2
    dh_conv_out: int = 1024
    dh_fc_out: int = 1024
    cls_loss_weight: float = 2.0
    bbox_loss_weight: float = 2.0

    family = "double_head_rcnn"


@dataclass(frozen=True)
class FreeAnchorConfig:
    """FreeAnchor RetinaNet R50-FPN, VOC classes (reference
    configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py +
    mmdet/models/dense_heads/free_anchor_retina_head.py): standard
    retina head/anchors, but assignment is learned — each gt owns a bag
    of its pre_anchor_topk highest-IoU anchors and the loss maximizes a
    mean-max matching likelihood instead of hard targets."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    fpn_channels: int = 256
    stacked_convs: int = 4
    feat_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    # FreeAnchor bag settings (free_anchor_retina_head.py:39-42)
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    focal_gamma: float = 2.0
    focal_alpha: float = 0.5
    smooth_l1_beta: float = 0.11
    bbox_loss_weight: float = 0.75
    max_gt: int = 64
    # fpn | nasfpn (models/fpn.py NASFPN, configs/nas_fpn/)
    neck_type: str = "fpn"
    nasfpn_stack_times: int = 7
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.5, max_per_img=100))

    family = "free_anchor"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    @property
    def num_anchors(self) -> int:
        return len(self.ratios) * self.scales_per_octave

    @property
    def pos_iou_thr(self) -> float:
        return 0.5

    @property
    def neg_iou_thr(self) -> float:
        return 0.4

    def build_anchor_generator(self):
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.strides, ratios=self.ratios,
            octave_base_scale=self.octave_base_scale,
            scales_per_octave=self.scales_per_octave,
        )

    def for_orientation(self, orientation: str) -> "FreeAnchorConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        assert h % 32 == 0 and w % 32 == 0, "canvas must be divisible by 32"
        sizes = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        for _ in range(len(self.strides) - 3):
            ph, pw = sizes[-1]
            sizes.append(((ph + 1) // 2, (pw + 1) // 2))
        return sizes

    def level_bounds(self):
        a = self.num_anchors
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            n = h * w * a
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class GHMConfig(FreeAnchorConfig):
    """GHM RetinaNet (reference
    configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py +
    mmdet/models/losses/ghm_loss.py): the plain retina model with
    MaxIoU-0.5/0.4 targets at stds 1.0, trained with GHMC / GHMR —
    gradient-density-harmonized classification and regression losses
    whose EMA bin counts live in batch_stats (engine/ghm.py)."""

    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    ghmc_bins: int = 30
    ghmc_momentum: float = 0.75
    ghmr_mu: float = 0.02
    ghmr_bins: int = 10
    ghmr_momentum: float = 0.7
    ghmr_weight: float = 10.0

    family = "ghm"


@dataclass(frozen=True)
class YOLACTConfig:
    """YOLACT (reference configs/yolact/yolact_r50_1x8_coco.py +
    mmdet/models/dense_heads/yolact_head.py): SSD-style OHEM anchor
    head with a tanh mask-coefficient branch, a P3 protonet (32
    prototypes at stride 4), instance masks = sigmoid(protos @ coeffs)
    cropped by boxes, and an auxiliary per-class semantic BCE at P3.
    The 550-pixel geometry is replaced by a /32-divisible canvas."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (544, 544)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 0  # yolact does not freeze the stem
    fpn_channels: int = 256
    feat_channels: int = 256
    num_head_convs: int = 1
    num_protos: int = 32
    proto_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    base_sizes: Tuple[int, ...] = (8, 16, 32, 64, 128)
    anchor_scale: float = 3.0
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    neg_pos_ratio: int = 3
    bbox_loss_weight: float = 1.5
    mask_loss_weight: float = 6.125
    max_masks_train: int = 100
    gt_mask_raster: int = 56
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.5, max_per_img=100))

    family = "yolact"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    @property
    def num_anchors(self) -> int:
        return len(self.ratios)

    def build_anchor_generator(self):
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.strides, ratios=self.ratios,
            scales=(self.anchor_scale,), base_sizes=self.base_sizes,
            octave_base_scale=int(self.anchor_scale), scales_per_octave=1,
            center_offset=0.5,
        )

    def for_orientation(self, orientation: str) -> "YOLACTConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        sizes = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        for _ in range(len(self.strides) - 3):
            ph, pw = sizes[-1]
            sizes.append(((ph + 1) // 2, (pw + 1) // 2))
        return sizes

    def level_bounds(self):
        a = self.num_anchors
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            n = h * w * a
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class GridRCNNConfig(FasterRCNNConfig):
    """Grid R-CNN (reference configs/grid_rcnn/grid_rcnn_r50_fpn_
    gn-head_2x_coco.py + roi_heads/grid_roi_head.py + mask_heads/
    grid_head.py): cls-only RoI head; box geometry from a 9-point grid
    heatmap head (8 GN convs at 576ch, neighbor fusion, grouped
    deconvs to 28x28 sub-region maps) trained on jittered positives and
    decoded by boundary voting. RPN bbox loss here is plain L1 (the
    reference's SmoothL1 beta 1/9 — equal above |x| = 1/9)."""

    grid_points: int = 9
    grid_convs: int = 8
    grid_point_channels: int = 64
    grid_roi_size: int = 14
    grid_pos_radius: int = 1
    grid_loss_weight: float = 15.0

    family = "grid_rcnn"


@dataclass(frozen=True)
class NASFPNRetinaNetConfig(FreeAnchorConfig):
    """RetinaNet + NAS-FPN (reference configs/nas_fpn/retinanet_r50_
    nasfpn_crop640_50e_coco.py): the plain retina head/targets trained
    with focal + L1 (engine/retina_zoo.py), the searched merge-cell
    pyramid as the neck (stack_times 7)."""

    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    neck_type: str = "nasfpn"

    family = "nasfpn"


@dataclass(frozen=True)
class CARAFEFasterRCNNConfig(FasterRCNNConfig):
    """Faster R-CNN with CARAFE top-down upsampling (reference
    configs/carafe/faster_rcnn_r50_fpn_carafe_1x_coco.py +
    mmdet/models/necks/fpn_carafe.py + the mmcv CARAFE op)."""

    neck_type: str = "carafe_fpn"

    family = "carafe"


@dataclass(frozen=True)
class PISAFasterRCNNConfig(FasterRCNNConfig):
    """PISA Faster R-CNN (reference configs/pisa/pisa_faster_rcnn_r50_
    fpn_1x_coco.py + roi_heads/pisa_roi_head.py + samplers/
    score_hlr_sampler.py): ScoreHLR negative sampling/weighting (one
    extra no-grad RoI pass), ISR-P positive reweighting and CARL in the
    RoI loss; RPN proposals widened to 2000 train/test."""

    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2
    hlr_k: float = 0.5
    hlr_bias: float = 0.0
    hlr_score_thr: float = 0.05
    hlr_iou_thr: float = 0.5
    rpn: RPNCfg = field(default_factory=lambda: RPNCfg(
        train_nms_pre=2000, train_max_per_img=2000,
        test_nms_pre=2000, test_max_per_img=2000,
        sampler_num=256))
    rcnn: RCNNCfg = field(default_factory=lambda: RCNNCfg(
        sampler_num=512, pos_fraction=0.25))

    family = "pisa_faster_rcnn"


@dataclass(frozen=True)
class PISARetinaNetConfig(FreeAnchorConfig):
    """PISA RetinaNet (reference configs/pisa/pisa_retinanet_r50_fpn_1x
    _coco.py + mmdet/models/losses/pisa_loss.py + dense_heads/
    pisa_retinanet_head.py): the plain retina model and targets, with
    ISR-P importance reweighting of positive cls weights and the CARL
    classification-aware regression loss (engine/pisa.py)."""

    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    smooth_l1_beta: float = 0.11
    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2

    family = "pisa_retinanet"


@dataclass(frozen=True)
class GARetinaNetConfig(FreeAnchorConfig):
    """GA-RetinaNet (reference
    configs/guided_anchoring/ga_retinanet_r50_fpn_1x_coco.py +
    mmdet/models/dense_heads/{ga_retina_head,guided_anchor_head}.py):
    ONE square anchor per cell (square generator scales [4], ratios
    [1.0]); 9 approx anchors per cell drive the shape assignment
    (ApproxMaxIoUAssigner pos .5 / neg .4 / min_pos .4); loc branch is
    a focal-loss objectness over center/ignore regions; shape branch
    trains with BoundedIoU on decoded anchors; cls/reg train on the
    predicted (guided) anchors with the base retina assigner overridden
    to neg_iou_thr .5 / min_pos_iou 0 and SmoothL1 beta .04, all at
    coder stds 1.0."""

    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    square_scale: int = 4  # == approx octave_base_scale (asserted upstream)
    loc_filter_thr: float = 0.01
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5
    ga_pos_iou_thr: float = 0.5
    ga_neg_iou_thr: float = 0.4
    ga_min_pos_iou: float = 0.4
    ga_sampler_num: int = 256
    ga_pos_fraction: float = 0.5
    cls_pos_iou_thr: float = 0.5
    cls_neg_iou_thr: float = 0.5
    smooth_l1_beta: float = 0.04
    loc_focal_gamma: float = 2.0
    loc_focal_alpha: float = 0.25
    bounded_iou_beta: float = 0.2

    family = "guided_anchor"

    @property
    def num_anchors(self) -> int:
        return 1  # one square / guided anchor per cell

    @property
    def approxs_per_cell(self) -> int:
        return len(self.ratios) * self.scales_per_octave

    def build_anchor_generator(self):
        """The SQUARE generator — defines the A axis everywhere
        (anchor_valid flags, level bounds, head outputs)."""
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.strides, ratios=(1.0,),
            scales=(float(self.square_scale),),
            octave_base_scale=self.square_scale, scales_per_octave=1,
        )

    def build_approx_generator(self):
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.strides, ratios=self.ratios,
            octave_base_scale=self.octave_base_scale,
            scales_per_octave=self.scales_per_octave,
        )


@dataclass(frozen=True)
class SABLRetinaNetConfig(GARetinaNetConfig):
    """SABL RetinaNet (reference configs/sabl/sabl_retinanet_r50_fpn_
    1x_coco.py + dense_heads/sabl_retina_head.py + core/bbox/coder/
    bucketing_bbox_coder.py): GA-style square/approx anchor duality,
    but boundaries localize by per-side bucket classification (14
    buckets at 3x proposal scale) + fine within-bucket offsets, with
    bucketing-guided rescoring at eval (engine/sabl.py)."""

    num_buckets: int = 14
    bucket_scale_factor: float = 3.0
    offset_topk: int = 2
    offset_upperbound: float = 1.0
    bucket_cls_weight: float = 1.5
    bucket_reg_weight: float = 1.5
    bucket_reg_beta: float = 1.0 / 9.0
    ga_min_pos_iou: float = 0.0  # sabl assigner min_pos_iou 0

    family = "sabl"

    @property
    def side_num(self) -> int:
        return (self.num_buckets + 1) // 2


@dataclass(frozen=True)
class FCOSConfig:
    """FCOS R50-FPN, VOC classes (the upstream anchor-free family the
    reference keeps registered; configs/fcos/*_r50_caffe_fpn_gn-head)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    fpn_channels: int = 256
    stacked_convs: int = 4
    feat_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, 1e8))
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.5, max_per_img=100))

    family = "fcos"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        """Point-compatible 1-anchor generator: FCOS itself is anchor-free
        (the loss never reads anchor_valid), but the shared TrainLoader
        derives per-image pad-validity flags from a generator — one anchor
        per cell aligns 1:1 with the point table."""
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.strides, ratios=(1.0,),
            octave_base_scale=8, scales_per_octave=1,
        )

    def for_orientation(self, orientation: str) -> "FCOSConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        assert h % 32 == 0 and w % 32 == 0, "canvas must be divisible by 32"
        sizes = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        for _ in range(len(self.strides) - 3):
            ph, pw = sizes[-1]
            sizes.append(((ph + 1) // 2, (pw + 1) // 2))
        return sizes

    def level_bounds(self):
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            n = h * w
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class AutoAssignConfig:
    """AutoAssign R50-FPN, VOC classes (the upstream differentiable-
    assignment family the fork keeps registered;
    configs/autoassign/autoassign_r50_fpn_8x2_1x_coco.py: GIoU loss
    weight 5, pos/neg/center loss weights 0.25/0.75/0.75, test NMS 0.6)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    fpn_channels: int = 256
    stacked_convs: int = 4
    feat_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    giou_loss_weight: float = 5.0
    pos_loss_weight: float = 0.25
    neg_loss_weight: float = 0.75
    center_loss_weight: float = 0.75
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.6, max_per_img=100))

    family = "autoassign"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        """Point-compatible 1-anchor generator (see FCOSConfig): the loss
        is anchor-free; the loader only needs pad-validity flags."""
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.strides, ratios=(1.0,),
            octave_base_scale=8, scales_per_octave=1,
        )

    def for_orientation(self, orientation: str) -> "AutoAssignConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        assert h % 32 == 0 and w % 32 == 0, "canvas must be divisible by 32"
        sizes = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        for _ in range(len(self.strides) - 3):
            ph, pw = sizes[-1]
            sizes.append(((ph + 1) // 2, (pw + 1) // 2))
        return sizes

    def level_bounds(self):
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            n = h * w
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class FSAFConfig:
    """FSAF R50-FPN, VOC classes (the upstream feature-selective
    anchor-free family the fork keeps registered;
    configs/fsaf/fsaf_r50_fpn_1x_coco.py: one stride-sized square anchor
    per cell, TBLRBBoxCoder normalizer 4.0, CenterRegionAssigner
    pos/neg scale 0.2, IoULoss eps 1e-6, grad clip max_norm 10)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    fpn_channels: int = 256
    stacked_convs: int = 4
    feat_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    pos_scale: float = 0.2
    neg_scale: float = 0.2
    min_pos_iof: float = 0.01
    tblr_normalizer: float = 4.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.5, max_per_img=100))

    family = "fsaf"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        """fsaf config: octave_base_scale=1, scales_per_octave=1,
        ratios [1.0] — one stride-sized square anchor per cell."""
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.strides, ratios=(1.0,),
            octave_base_scale=1, scales_per_octave=1,
        )

    def for_orientation(self, orientation: str) -> "FSAFConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        assert h % 32 == 0 and w % 32 == 0, "canvas must be divisible by 32"
        sizes = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        for _ in range(len(self.strides) - 3):
            ph, pw = sizes[-1]
            sizes.append(((ph + 1) // 2, (pw + 1) // 2))
        return sizes

    def level_bounds(self):
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            n = h * w
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class ATSSConfig:
    """ATSS R50-FPN, VOC classes (the upstream adaptive-assignment family
    the reference keeps registered; configs/atss/atss_r50_fpn_1x_coco.py:
    one anchor per cell at octave scale 8, GIoU loss weight 2, topk 9)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    fpn_channels: int = 256
    stacked_convs: int = 4
    feat_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 8
    ratios: Tuple[float, ...] = (1.0,)
    atss_topk: int = 9
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    giou_loss_weight: float = 2.0
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.6, max_per_img=100))

    family = "atss"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def for_orientation(self, orientation: str) -> "ATSSConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def build_anchor_generator(self):
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.strides, ratios=self.ratios,
            octave_base_scale=self.octave_base_scale, scales_per_octave=1,
        )

    def featmap_sizes(self):
        h, w = self.canvas
        assert h % 32 == 0 and w % 32 == 0, "canvas must be divisible by 32"
        sizes = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        for _ in range(len(self.strides) - 3):
            ph, pw = sizes[-1]
            sizes.append(((ph + 1) // 2, (pw + 1) // 2))
        return sizes

    def level_bounds(self):
        a = len(self.ratios)
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            n = h * w * a
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class GFLConfig(ATSSConfig):
    """GFL R50-FPN (reference configs/gfl/gfl_r50_fpn_1x_coco.py): ATSS
    geometry + quality focal loss (beta 2) + distribution regression
    over {0..reg_max} with DFL weight 0.25 and GIoU weight 2."""

    reg_max: int = 16
    qfl_beta: float = 2.0
    dfl_loss_weight: float = 0.25

    family = "gfl"


@dataclass(frozen=True)
class LDConfig(GFLConfig):
    """Localization Distillation (reference configs/ld/
    ld_r18_gflv1_r101_fpn_coco_1x.py + detectors/kd_one_stage.py +
    dense_heads/ld_head.py + losses/kd_loss.py): a GFL student whose
    box-distribution logits additionally match a frozen GFL teacher's
    via temperature-10 KL on the positive anchors (weight 0.25). The
    reference pairs an r18 student with an r101 teacher; here both are
    bottleneck ResNets (student keeps the family default depth, teacher
    depth set by teacher_block_counts)."""

    ld_loss_weight: float = 0.25
    ld_temperature: float = 10.0
    teacher_block_counts: Tuple[int, ...] = (3, 4, 23, 3)  # r101

    family = "ld"

    def teacher_config(self) -> "LDConfig":
        return dataclasses.replace(
            self, block_counts=self.teacher_block_counts)


@dataclass(frozen=True)
class NASFCOSConfig(FCOSConfig):
    """NAS-FCOS (reference configs/nas_fcos/
    nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco.py +
    dense_heads/nasfcos_head.py + necks/nasfcos_fpn.py): the FCOS
    criterion with the searched 7-ConcatCell FPN and the searched
    "dconv3x3, conv3x3, dconv3x3, conv1x1" GN towers."""

    family = "nas_fcos"


@dataclass(frozen=True)
class VFNetConfig(ATSSConfig):
    """VFNet R50-FPN (reference configs/vfnet/vfnet_r50_fpn_1x_coco.py):
    ATSS assignment + varifocal IoU-aware cls loss + star-shaped
    deformable refinement; 3 stacked tower convs, GIoU 1.5 (initial) /
    2.0 (refine), reg_denom bbox normalization."""

    stacked_convs: int = 3
    reg_denoms: Tuple[float, ...] = (64, 128, 256, 512, 1024)
    gradient_mul: float = 0.1
    vfl_alpha: float = 0.75
    vfl_gamma: float = 2.0
    bbox_loss_weight: float = 1.5
    bbox_refine_loss_weight: float = 2.0

    family = "vfnet"


@dataclass(frozen=True)
class YOLOConfig:
    """YOLOv3 Darknet-53 608x608 (reference
    configs/yolo/yolov3_d53_mstrain-608_273e_coco.py, VOC classes)."""

    num_classes: int = 20
    input_size: int = 608
    block_counts: Tuple[int, ...] = (1, 2, 8, 8, 4)
    stem_width: int = 32
    frozen_stages: int = 0  # YOLO trains everything (incl. BN)
    neck_channels: Tuple[int, ...] = (512, 256, 128)
    head_channels: Tuple[int, ...] = (1024, 512, 256)
    # coarse-to-fine anchor sizes / strides (32, 16, 8)
    base_sizes: Tuple[Tuple[Tuple[int, int], ...], ...] = (
        ((116, 90), (156, 198), (373, 326)),
        ((30, 61), (62, 45), (59, 119)),
        ((10, 13), (16, 30), (33, 23)),
    )
    strides: Tuple[int, ...] = (32, 16, 8)
    # GridAssigner thresholds
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.0
    # loss weights (loss_xy / loss_wh scale 2)
    xy_loss_weight: float = 2.0
    wh_loss_weight: float = 2.0
    max_gt: int = 64
    # img_norm_cfg: mean 0, std 255, rgb
    img_mean: Tuple[float, ...] = (0.0, 0.0, 0.0)
    img_std: Tuple[float, ...] = (255.0, 255.0, 255.0)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    conf_thr: float = 0.005
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.45, max_per_img=100))

    family = "yolov3"

    @property
    def canvas(self) -> Tuple[int, int]:
        return (self.input_size, self.input_size)

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def for_orientation(self, orientation: str) -> "YOLOConfig":
        return self  # square canvas

    def build_anchor_generator(self):
        from ..ops.anchors import YOLOAnchorGenerator

        return YOLOAnchorGenerator(base_sizes=self.base_sizes, strides=self.strides)

    def featmap_sizes(self):
        s = self.input_size
        return [(s // st, s // st) for st in self.strides]

    def level_bounds(self):
        gen = self.build_anchor_generator()
        bounds, off = [], 0
        for (h, w), a in zip(self.featmap_sizes(), gen.num_base_anchors):
            n = h * w * a
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class PAAConfig:
    """PAA R50-FPN, VOC classes (upstream family the fork keeps
    registered; configs/paa/paa_r50_fpn_1x_coco.py — the ATSS model
    geometry with probabilistic GMM assignment; the centerness branch
    doubles as the IoU prediction)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    fpn_channels: int = 256
    stacked_convs: int = 4
    feat_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: int = 8
    ratios: Tuple[float, ...] = (1.0,)
    paa_topk: int = 9
    score_voting: bool = True
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    giou_loss_weight: float = 1.3
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.6, max_per_img=100))

    family = "paa"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.strides, ratios=self.ratios,
            octave_base_scale=self.octave_base_scale, scales_per_octave=1,
        )

    def for_orientation(self, orientation: str) -> "PAAConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        sizes = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        for _ in range(len(self.strides) - 3):
            ph, pw = sizes[-1]
            sizes.append(((ph + 1) // 2, (pw + 1) // 2))
        return sizes

    def level_bounds(self):
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            n = h * w * len(self.ratios)
            bounds.append((off, off + n))
            off += n
        return bounds


@dataclass(frozen=True)
class FoveaBoxConfig:
    """FoveaBox R50-FPN, VOC classes (upstream family the fork keeps
    registered; configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    fpn_channels: int = 256
    stacked_convs: int = 4
    feat_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    base_edge_list: Tuple[int, ...] = (16, 32, 64, 128, 256)
    scale_ranges: Tuple[Tuple[float, float], ...] = (
        (1, 64), (32, 128), (64, 256), (128, 512), (256, 2048))
    sigma: float = 0.4
    focal_gamma: float = 1.5
    focal_alpha: float = 0.4
    smooth_l1_beta: float = 0.11
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.5, max_per_img=100))

    family = "foveabox"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        """Loader-compatibility 1-point generator (FoveaBox is
        point-based; the loss never reads anchor_valid — FCOSConfig
        note)."""
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=self.strides, ratios=(1.0,),
            octave_base_scale=8, scales_per_octave=1,
        )

    def for_orientation(self, orientation: str) -> "FoveaBoxConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        sizes = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        for _ in range(len(self.strides) - 3):
            ph, pw = sizes[-1]
            sizes.append(((ph + 1) // 2, (pw + 1) // 2))
        return sizes

    def level_bounds(self):
        bounds, off = [], 0
        for (h, w) in self.featmap_sizes():
            bounds.append((off, off + h * w))
            off += h * w
        return bounds


@dataclass(frozen=True)
class YOLOFConfig:
    """YOLOF R50-C5, VOC classes (upstream family the fork keeps
    registered; configs/yolof/yolof_r50_c5_8x8_1x_coco.py)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    encoder_channels: int = 512
    encoder_mid_channels: int = 128
    encoder_dilations: Tuple[int, ...] = (2, 4, 6, 8)
    # single stride-32 level, ratio 1, scales 1..16 (base size 32)
    stride: int = 32
    anchor_scales: Tuple[float, ...] = (1.0, 2.0, 4.0, 8.0, 16.0)
    ctr_clamp: float = 32.0
    # UniformAssigner
    match_times: int = 4
    pos_ignore_thr: float = 0.15
    neg_ignore_thr: float = 0.7
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.6, max_per_img=100))

    family = "yolof"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=(self.stride,), ratios=(1.0,),
            octave_base_scale=1, scales_per_octave=1,
            scales=self.anchor_scales,
        )

    def for_orientation(self, orientation: str) -> "YOLOFConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        return [(h // self.stride, w // self.stride)]

    def level_bounds(self):
        (h, w), = self.featmap_sizes()
        return [(0, h * w * len(self.anchor_scales))]


@dataclass(frozen=True)
class SparseRCNNConfig:
    """Sparse R-CNN R50-FPN, VOC classes (upstream family the fork keeps
    registered; configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x_coco.py)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    fpn_channels: int = 256
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    num_proposals: int = 100
    num_stages: int = 6
    stage_loss_weights: Tuple[float, ...] = (1.0,) * 6
    num_heads: int = 8
    ffn_dim: int = 2048
    dyn_feat: int = 64
    roi_size: int = 7
    finest_scale: int = 56
    target_stds: Tuple[float, ...] = (0.5, 0.5, 1.0, 1.0)
    # matcher = loss weights (FocalLossCost 2 / BBoxL1Cost 5 / IoUCost 2)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    cls_cost_weight: float = 2.0
    l1_cost_weight: float = 5.0
    giou_cost_weight: float = 2.0
    cls_loss_weight: float = 2.0
    l1_loss_weight: float = 5.0
    giou_loss_weight: float = 2.0
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    # no NMS; top max_per_img over (proposal, class) sigmoid scores
    test: TestCfg = field(default_factory=lambda: TestCfg(
        score_thr=0.0, max_per_img=100))

    family = "sparse_rcnn"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        """Loader-compatibility 1-point generator (proposals are
        learnable; the loss never reads anchor_valid)."""
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=(self.strides[0],), ratios=(1.0,),
            octave_base_scale=8, scales_per_octave=1,
        )

    def for_orientation(self, orientation: str) -> "SparseRCNNConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        return [(h // s, w // s) for s in self.strides[:1]]

    def level_bounds(self):
        (h, w), = self.featmap_sizes()
        return [(0, h * w)]


@dataclass(frozen=True)
class CenterNetConfig:
    """CenterNet ResNet-18 512x512, VOC classes (upstream family the
    fork keeps registered; configs/centernet/centernet_resnet18_140e_coco.py
    = the use_dcn=False variant)."""

    num_classes: int = 20
    input_size: int = 512
    block_counts: Tuple[int, ...] = (2, 2, 2, 2)
    stem_width: int = 64
    frozen_stages: int = 0  # norm_eval=False: everything trains (incl. BN)
    deconv_filters: Tuple[int, ...] = (256, 128, 64)
    feat_channel: int = 64
    out_stride: int = 4
    gaussian_min_overlap: float = 0.3
    wh_loss_weight: float = 0.1
    offset_loss_weight: float = 1.0
    local_maximum_kernel: int = 3
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    # topk 100 straight off the heatmap; no box NMS (test_cfg topk=100,
    # local_maximum_kernel=3, max_per_img=100)
    test: TestCfg = field(default_factory=lambda: TestCfg(
        score_thr=0.0, max_per_img=100))

    family = "centernet"

    @property
    def canvas(self) -> Tuple[int, int]:
        return (self.input_size, self.input_size)

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        """Loader-compatibility 1-point generator (CenterNet is
        keypoint-based; the loss never reads anchor_valid)."""
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=(self.out_stride,), ratios=(1.0,),
            octave_base_scale=4, scales_per_octave=1,
        )

    def for_orientation(self, orientation: str) -> "CenterNetConfig":
        return self  # square canvas

    def featmap_sizes(self):
        s = self.input_size // self.out_stride
        return [(s, s)]

    def level_bounds(self):
        (h, w), = self.featmap_sizes()
        return [(0, h * w)]


@dataclass(frozen=True)
class RepPointsConfig(ATSSConfig):
    """RepPoints moment R50-FPN (reference configs/reppoints/
    reppoints_moment_r50_fpn_1x_coco.py + dense_heads/
    reppoints_head.py defaults): point sets via deformable sampling,
    PointAssigner init stage + MaxIoU refine stage, 'moment' transform."""

    stacked_convs: int = 3
    point_feat_channels: int = 256
    num_points: int = 9
    gradient_mul: float = 0.1
    point_base_scale: int = 4
    init_pos_num: int = 1          # PointAssigner(scale=4, pos_num=1)
    smooth_l1_beta: float = 0.11
    init_loss_weight: float = 0.5
    refine_loss_weight: float = 1.0
    test: TestCfg = field(default_factory=lambda: TestCfg(
        nms_pre=1000, score_thr=0.05, nms_iou_thr=0.5, max_per_img=100))

    family = "reppoints"


@dataclass(frozen=True)
class CornerNetConfig:
    """CornerNet Hourglass-104 (reference configs/cornernet/
    cornernet_hourglass104_mstest_*.py + dense_heads/corner_head.py):
    paired-corner keypoints with corner pooling, associative
    embeddings, and soft-NMS."""

    num_classes: int = 20
    input_size: int = 512          # reference crops 511; /128-divisible here
    num_stacks: int = 2
    hourglass_depth: int = 5
    stage_channels: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2, 2, 4)
    stem_width: int = 128
    frozen_stages: int = 0         # hourglass trains from scratch, BN live
    out_stride: int = 4
    corner_emb_channels: int = 1
    pull_weight: float = 0.25
    push_weight: float = 0.25
    corner_topk: int = 100
    local_maximum_kernel: int = 3
    distance_threshold: float = 0.5
    num_dets: int = 1000
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    test: TestCfg = field(default_factory=lambda: TestCfg(
        score_thr=0.0, max_per_img=100))

    family = "cornernet"

    @property
    def canvas(self) -> Tuple[int, int]:
        return (self.input_size, self.input_size)

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        """Loader-compatibility 1-point generator (corner keypoints;
        the loss never reads anchor_valid)."""
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=(self.out_stride,), ratios=(1.0,),
            octave_base_scale=4, scales_per_octave=1,
        )

    def for_orientation(self, orientation: str) -> "CornerNetConfig":
        return self  # square canvas

    def featmap_sizes(self):
        s = self.input_size // self.out_stride
        return [(s, s)]

    def level_bounds(self):
        (h, w), = self.featmap_sizes()
        return [(0, h * w)]


@dataclass(frozen=True)
class CentripetalNetConfig(CornerNetConfig):
    """CentripetalNet (reference configs/centripetalnet/
    centripetalnet_hourglass104_mstest_16x6_210e_coco.py +
    mmdet/models/dense_heads/centripetal_head.py): the CornerNet
    hourglass/corner-pool trunk with the embedding branch replaced by
    guiding-shift-driven deform feature adaption and centripetal-shift
    corner pairing."""

    corner_emb_channels: int = 0

    family = "centripetalnet"


@dataclass(frozen=True)
class DETRConfig:
    """DETR R50, VOC classes (upstream family the fork keeps registered;
    configs/detr/detr_r50_8x2_150e_coco.py + dense_heads/detr_head.py
    defaults)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    # transformer (detr_r50 config: embed 256, 8 heads, ffn 2048, 6+6)
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_queries: int = 100
    num_reg_fcs: int = 2
    dropout: float = 0.1
    # loss/matcher weights — shared by assert in detr_head.py:108-118
    cls_weight: float = 1.0
    l1_weight: float = 5.0
    giou_weight: float = 2.0
    bg_cls_weight: float = 0.1
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    # DETR's test_cfg has no score threshold or NMS (detr_head.py:78)
    test: TestCfg = field(default_factory=lambda: TestCfg(
        score_thr=0.0, max_per_img=100))

    family = "detr"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        """Loader-compatibility 1-point generator (DETR is query-based;
        the loss never reads anchor_valid — see FCOSConfig note)."""
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=(32,), ratios=(1.0,),
            octave_base_scale=8, scales_per_octave=1,
        )

    def for_orientation(self, orientation: str) -> "DETRConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        h, w = self.canvas
        return [(h // 32, w // 32)]

    def level_bounds(self):
        (h, w), = self.featmap_sizes()
        return [(0, h * w)]


@dataclass(frozen=True)
class DeformableDETRConfig:
    """Deformable DETR R50, VOC classes (configs/deformable_detr/
    deformable_detr_r50_16x2_50e_coco.py + deformable_detr_head.py +
    mmcv MultiScaleDeformableAttention defaults; as_two_stage=False,
    with_box_refine=False)."""

    num_classes: int = 20
    canvas: Tuple[int, int] = (608, 1024)
    block_counts: Tuple[int, ...] = (3, 4, 6, 3)
    stem_width: int = 64
    frozen_stages: int = 1
    # transformer (embed 256, 8 heads, FFN 1024, 6+6, 300 queries,
    # 4 levels x 4 sampling points)
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 1024
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_queries: int = 300
    num_reg_fcs: int = 2
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1
    pe_offset: float = -0.5      # SinePositionalEncoding(offset=-0.5)
    # sigmoid focal cls (gamma 2, alpha 0.25, weight 2.0) + L1 5 + GIoU 2;
    # the matcher reuses the same weights (FocalLossCost/BBoxL1Cost/IoUCost)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    cls_weight: float = 2.0
    l1_weight: float = 5.0
    giou_weight: float = 2.0
    max_gt: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    img_to_rgb: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    stem_s2d: bool = False
    # test_cfg = dict(max_per_img=100), sigmoid scores, no NMS
    test: TestCfg = field(default_factory=lambda: TestCfg(
        score_thr=0.0, max_per_img=100))

    family = "deformable_detr"

    @property
    def num_fg_classes(self) -> int:
        return self.num_classes

    def build_anchor_generator(self):
        """Loader-compatibility 1-point generator (query-based family;
        the loss never reads anchor_valid — see FCOSConfig note)."""
        from ..ops.anchors import AnchorGenerator

        return AnchorGenerator(
            strides=(32,), ratios=(1.0,),
            octave_base_scale=8, scales_per_octave=1,
        )

    def for_orientation(self, orientation: str) -> "DeformableDETRConfig":
        h, w = self.canvas
        land = (max(h, w) == w)
        if (orientation == "landscape") == land:
            return self
        return dataclasses.replace(self, canvas=(w, h))

    def featmap_sizes(self):
        # loader-compat shim paired with the 1-point generator above;
        # the model derives its real 4-level shapes from the tensors
        h, w = self.canvas
        return [(h // 32, w // 32)]

    def level_bounds(self):
        (h, w), = self.featmap_sizes()
        return [(0, h * w)]


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer/schedule (Config_RetinaNet.py:89-94 + driver overrides)."""

    lr: float = 0.001
    momentum: float = 0.9
    weight_decay: float = 1e-4
    batch_size: int = 2
    seed: int = 20
    # reference schedule: outer_epoch x epoch_ratio[0] inner epochs; lr
    # drops x0.1 at lr_step_epoch of the FINAL outer epoch only
    outer_epoch: int = 2
    epoch_ratio: Tuple[int, ...] = (3, 1)
    lr_step_epoch: int = 2
    # DETR trains with AdamW (configs/detr/detr_r50: lr 1e-4, wd 1e-4,
    # backbone lr_mult 0.1, grad clip 0.1); every other family uses the
    # reference's torch-exact SGD
    optimizer: str = "sgd"
    backbone_lr_mult: float = 1.0
    grad_clip: Optional[float] = None
    # linear warmup (SSD config: 500 iters, ratio 1e-3; Config_SSD.py:158-162)
    warmup_iters: int = 0
    warmup_ratio: float = 1e-3
    # full train-state snapshot every N inner epochs (0 = off) for
    # mid-cycle preemption resume (reference checkpoint_config interval=3
    # + cfg.resume_from, apis/train_Lambda.py:72-75)
    ckpt_interval: int = 1


@dataclass(frozen=True)
class ALConfig:
    """Active-learning loop (Config_RetinaNet.py:156-166 + driver flags)."""

    cycles: Tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6)
    x_l_0_size: int = 16551 // 20
    x_s_size: int = 16551 // 40
    x_l_repeat: int = 2
    x_u_repeat: int = 2
    zero_rate: float = 0.15              # train_RetinaNet.py:39
    use_max_conf: str = "False"          # False | min | max
    eval_interval: int = 3
    # pool-scoring / eval batch size, decoupled from the train batch (the
    # reference's scorer builds its own dataloader over cfg.data.test,
    # tools/train_RetinaNet.py:221-246); 64 is the bench.py sweet spot
    score_batch_size: int = 64
    # run the pool-scoring backbone in dynamic-int8 PTQ (models/quant.py;
    # v5e int8 MXU peak is 2x bf16). SCORING only — train/eval stay in
    # compute_dtype. Gated by the acquisition parity test
    # (tests/test_learnability.py::test_int8_scoring_preserves_acquisition)
    int8_scoring: bool = False


def _cfg_get(ns: dict, path: str, default=None):
    cur = ns
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return default
    return cur


# top-level keys the loader understands (or knowingly ignores because the
# TPU rebuild subsumes them: log/dist/runner plumbing is host-loop code here)
_KNOWN_TOP_KEYS = {
    "checkpoint_config", "log_config", "custom_hooLoks", "custom_hooks",
    "dist_params", "log_level", "load_from", "resume_from", "workflow",
    "uncertainty_pool", "uncertainty_type", "uncertainty_pool2",
    "input_size", "model", "optimizer", "optimizer_config", "lr_config",
    "runner", "dataset_type", "data_root", "img_norm_cfg",
    "train_pipeline", "test_pipeline", "data", "evaluation",
    "X_S_size", "X_L_0_size", "cycles", "epoch_ratio", "outer_epoch",
    "X_L_repeat", "X_U_repeat", "train_cfg", "k",
}

_LOSS_CLS_MAP = {
    "EDL_Softmax_FocalLoss": "edl_softmax_focal",
    "EDL_FocalLoss": "edl_focal",
    "EDL_ReLU": "edl_relu",
    "FocalLoss": "focal",
    "MyFocalLoss": "focal",
}


def _warn(msg: str):
    import warnings

    warnings.warn(f"load_reference_config: {msg}", stacklevel=3)


def reference_data_roots(ns: dict):
    """Extract (voc07, voc12) dataset roots from a loaded reference
    config's data.train.dataset.img_prefix / data_root
    (Config_RetinaNet.py:98,133-139). Returns (voc07, voc12-or-None)."""
    prefixes = _cfg_get(ns, "data.train.dataset.img_prefix") or \
        _cfg_get(ns, "data.train.img_prefix")
    if prefixes is None and ns.get("data_root"):
        root = ns["data_root"]
        prefixes = [root + "VOC2007/", root + "VOC2012/"]
    if prefixes is None:
        return None, None
    if isinstance(prefixes, str):
        prefixes = [prefixes]
    voc07 = next((p.rstrip("/") for p in prefixes if "2007" in p), None)
    voc12 = next((p.rstrip("/") for p in prefixes if "2012" in p), None)
    return voc07, voc12


def load_reference_config(path: str):
    """Load a reference-style plain-python config file.

    Executes the file (the mmcv Config.fromfile semantic for the two live
    monolithic configs, Config_RetinaNet.py / Config_SSD.py) and maps
    every AL-relevant key onto the dataclasses above; dispatches on
    model.type to build a RetinaNetConfig or SSDConfig. Unrecognized
    top-level keys and un-honorable settings warn loudly; an optimizer
    or classification loss the engine cannot reproduce raises.
    Returns (model_cfg, TrainConfig, ALConfig, raw namespace).
    """
    ns = runpy.run_path(path)
    for key in sorted(k for k in ns if not k.startswith("__")):
        if key not in _KNOWN_TOP_KEYS and not callable(ns[key]) \
                and not isinstance(ns[key], type(runpy)):
            _warn(f"unrecognized top-level key {key!r} is ignored")

    model = ns.get("model", {})
    mtype = str(model.get("type", "SSL_L_RetinaNet"))
    if "SSD" in mtype.upper():
        family = "ssd"
    elif "RETINANET" in mtype.upper():
        family = "retinanet"
    else:
        raise ValueError(
            f"model.type {mtype!r}: the reference-config loader maps the two "
            f"live AL configs (Config_RetinaNet.py / Config_SSD.py). Zoo "
            f"families (FasterRCNN/CascadeRCNN/FCOS/ATSS) are configured via "
            f"their dataclasses + tools/train_detector.py, not mmcv-style "
            f"_base_-inheriting config files.")
    ag = _cfg_get(model, "bbox_head.anchor_generator", {}) or {}
    test_cfg = model.get("test_cfg", {}) or {}
    train_cfg = model.get("train_cfg", {}) or {}
    assigner = train_cfg.get("assigner", {}) or {}
    coder = _cfg_get(model, "bbox_head.bbox_coder", {}) or {}
    loss_cls = _cfg_get(model, "bbox_head.loss_cls", {}) or {}
    nms = test_cfg.get("nms", {}) or {}
    neck = model.get("neck", {}) or {}

    hua = HUACfg(
        pool=ns.get("uncertainty_pool", "Entropy_NMS"),
        unc_type=ns.get("uncertainty_type", "Epistemic").lower(),
        agg=ns.get("uncertainty_pool2", "objectSum_scaleMax_classSum"),
    )

    if family == "ssd":
        tcfg_defaults = dict(max_per_img=200, score_thr=0.02)
        model_cfg = SSDConfig(
            num_classes=_cfg_get(model, "bbox_head.num_classes", 20),
            input_size=ns.get("input_size", ag.get("input_size", 300)),
            neck_out_channels=tuple(neck.get("out_channels",
                                             (512, 1024, 512, 256, 256, 256))),
            level_strides=tuple(neck.get("level_strides", (2, 2, 1, 1))),
            level_paddings=tuple(neck.get("level_paddings", (1, 1, 0, 0))),
            l2_norm_scale=neck.get("l2_norm_scale", 20.0),
            anchor=SSDAnchorCfg(
                strides=tuple(ag.get("strides", (8, 16, 32, 64, 100, 300))),
                ratios=tuple(tuple(r) for r in ag.get(
                    "ratios", ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)))),
                basesize_ratio_range=tuple(ag.get("basesize_ratio_range", (0.15, 0.9))),
                input_size=ag.get("input_size", ns.get("input_size", 300)),
            ),
            target_means=tuple(coder.get("target_means", (0.0,) * 4)),
            target_stds=tuple(coder.get("target_stds", (0.1, 0.1, 0.2, 0.2))),
            pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
            neg_iou_thr=assigner.get("neg_iou_thr", 0.5),
            min_pos_iou=assigner.get("min_pos_iou", 0.0),
            gt_max_assign_all=assigner.get("gt_max_assign_all", False),
            neg_pos_ratio=train_cfg.get("neg_pos_ratio", 3),
            smoothl1_beta=train_cfg.get("smoothl1_beta", 1.0),
            test=TestCfg(
                nms_pre=test_cfg.get("nms_pre", 1000),
                score_thr=test_cfg.get("score_thr", tcfg_defaults["score_thr"]),
                nms_iou_thr=nms.get("iou_threshold", 0.5),
                max_per_img=test_cfg.get("max_per_img", tcfg_defaults["max_per_img"]),
            ),
            hua=hua,
        )
    else:
        if loss_cls:
            lc_type = loss_cls.get("type", "EDL_Softmax_FocalLoss")
            if lc_type not in _LOSS_CLS_MAP:
                raise ValueError(
                    f"loss_cls.type {lc_type!r} has no TPU engine equivalent "
                    f"(known: {sorted(_LOSS_CLS_MAP)})")
            cls_loss = _LOSS_CLS_MAP[lc_type]
        else:
            cls_loss = "edl_softmax_focal"
        model_cfg = RetinaNetConfig(
            num_classes=_cfg_get(model, "bbox_head.num_classes", 20),
            frozen_stages=_cfg_get(model, "backbone.frozen_stages", 1),
            fpn_channels=neck.get("out_channels", 256),
            stacked_convs=_cfg_get(model, "bbox_head.stacked_convs", 4),
            feat_channels=_cfg_get(model, "bbox_head.feat_channels", 256),
            anchor=AnchorConfig(
                strides=tuple(ag.get("strides", (8, 16, 32, 64, 128))),
                ratios=tuple(ag.get("ratios", (0.5, 1.0, 2.0))),
                octave_base_scale=ag.get("octave_base_scale", 4),
                scales_per_octave=ag.get("scales_per_octave", 3),
            ),
            target_means=tuple(coder.get("target_means", (0.0,) * 4)),
            target_stds=tuple(coder.get("target_stds", (1.0,) * 4)),
            pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
            neg_iou_thr=assigner.get("neg_iou_thr", 0.4),
            min_pos_iou=assigner.get("min_pos_iou", 0.0),
            gt_max_assign_all=assigner.get("gt_max_assign_all", True),
            cls_loss=cls_loss,
            focal_gamma=loss_cls.get("gamma", 2.0),
            focal_alpha=loss_cls.get("alpha", 0.25),
            test=TestCfg(
                nms_pre=test_cfg.get("nms_pre", 1000),
                score_thr=test_cfg.get("score_thr", 0.05),
                nms_iou_thr=nms.get("iou_threshold", 0.5),
                max_per_img=test_cfg.get("max_per_img", 100),
            ),
            hua=hua,
        )

    opt = ns.get("optimizer", {})
    if opt.get("type", "SGD") != "SGD":
        raise ValueError(
            f"optimizer.type {opt.get('type')!r}: the engine implements the "
            f"reference's SGD(momentum, wd) exactly; other optimizers would "
            f"silently change training semantics")
    lr_cfg = ns.get("lr_config", {}) or {}
    if lr_cfg.get("policy", "step") != "step":
        _warn(f"lr_config.policy {lr_cfg.get('policy')!r} unsupported; using 'step'")
    steps = lr_cfg.get("step", [2])
    if len(steps) > 1:
        _warn(f"lr_config.step {steps}: only the first step epoch is honored "
              f"(the AL schedule re-inits per run; train_RetinaNet.py:179-200)")
    warmup = lr_cfg.get("warmup")
    if warmup not in (None, "linear"):
        _warn(f"lr_config.warmup {warmup!r} unsupported; using linear")
    opt_cfg = ns.get("optimizer_config", {}) or {}
    train = TrainConfig(
        lr=opt.get("lr", 0.001),
        momentum=opt.get("momentum", 0.9),
        weight_decay=opt.get("weight_decay", 1e-4),
        batch_size=_cfg_get(ns, "data.samples_per_gpu", 2),
        outer_epoch=ns.get("outer_epoch", 2),
        epoch_ratio=tuple(ns.get("epoch_ratio", (3, 1))),
        lr_step_epoch=steps[0],
        grad_clip=(opt_cfg.get("grad_clip") or {}).get("max_norm")
        if isinstance(opt_cfg.get("grad_clip"), dict) else opt_cfg.get("grad_clip"),
        warmup_iters=lr_cfg.get("warmup_iters", 0) if warmup else 0,
        warmup_ratio=lr_cfg.get("warmup_ratio", 1e-3),
    )
    al = ALConfig(
        cycles=tuple(ns.get("cycles", range(7))),
        x_l_0_size=ns.get("X_L_0_size", 16551 // 20),
        x_s_size=ns.get("X_S_size", 16551 // 40),
        # X_L_repeat overrides RepeatDataset times (active_datasets.py:63)
        x_l_repeat=ns.get("X_L_repeat", 2),
        x_u_repeat=ns.get("X_U_repeat", 2),
        eval_interval=_cfg_get(ns, "evaluation.interval", 3),
    )
    return model_cfg, train, al, ns


def tiny_faster_rcnn_config(**overrides) -> FasterRCNNConfig:
    """A shrunken Faster R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return FasterRCNNConfig(**base)


def tiny_libra_config(**overrides) -> LibraRCNNConfig:
    """A shrunken Libra R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64, neg_pos_ub=5),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return LibraRCNNConfig(**base)


def tiny_pafpn_config(**overrides) -> PAFPNFasterRCNNConfig:
    """A shrunken PAFPN Faster R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return PAFPNFasterRCNNConfig(**base)


def tiny_dynamic_rcnn_config(**overrides) -> DynamicRCNNConfig:
    """A shrunken Dynamic R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64, nms_iou_thr=0.85),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        iou_topk=8,
        beta_topk=2,
        update_iter_interval=4,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return DynamicRCNNConfig(**base)


def tiny_double_head_config(**overrides) -> DoubleHeadRCNNConfig:
    """A shrunken Double-Head R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        dh_num_convs=1,
        dh_num_fcs=1,
        dh_conv_out=16,
        dh_fc_out=32,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return DoubleHeadRCNNConfig(**base)


def tiny_mask_rcnn_config(**overrides) -> MaskRCNNConfig:
    """A shrunken Mask R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        mask_convs=2,
        mask_channels=8,
        mask_size=14,
        mask_roi_size=7,
        gt_mask_raster=28,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return MaskRCNNConfig(**base)


def tiny_seesaw_config(**overrides) -> SeesawMaskRCNNConfig:
    """A shrunken seesaw-loss Mask R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        mask_convs=2,
        mask_channels=8,
        mask_size=14,
        mask_roi_size=7,
        gt_mask_raster=28,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return SeesawMaskRCNNConfig(**base)


def tiny_point_rend_config(**overrides) -> PointRendConfig:
    """A shrunken PointRend for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        mask_roi_size=14,
        mask_size=7,
        coarse_fcs=2,
        coarse_fc_channels=64,
        coarse_channels=8,
        point_fcs=3,
        point_fc_channels=16,
        num_points=32,
        subdivision_steps=2,
        subdivision_num_points=64,
        gt_mask_raster=28,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return PointRendConfig(**base)


def tiny_mask_scoring_config(**overrides) -> MaskScoringRCNNConfig:
    """A shrunken Mask Scoring R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        mask_convs=2,
        mask_channels=8,
        mask_size=14,
        mask_roi_size=7,
        gt_mask_raster=28,
        maskiou_convs=2,
        maskiou_fc_channels=32,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return MaskScoringRCNNConfig(**base)


def tiny_rpn_config(**overrides) -> RPNOnlyConfig:
    """A shrunken proposal-only RPN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return RPNOnlyConfig(**base)


def tiny_fast_rcnn_config(**overrides) -> FastRCNNConfig:
    """A shrunken Fast R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        num_proposals=64,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return FastRCNNConfig(**base)


def tiny_trident_config(**overrides) -> TridentNetConfig:
    """A shrunken TridentNet for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1),
        head_blocks=1,
        stem_width=8,
        num_classes=6,
        max_gt=8,
        anchor_scales=(1.0, 2.0, 4.0),
        rpn=RPNCfg(anchor_strides=(16,), ratios=(0.5, 1.0, 2.0),
                   train_nms_pre=96, train_max_per_img=48,
                   test_nms_pre=96, test_max_per_img=48, sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, pos_fraction=0.5, roi_size=14,
                     roi_strides=(16,)),
        test=TestCfg(nms_pre=48, pre_nms_cands=48, max_per_img=20),
    )
    base.update(overrides)
    return TridentNetConfig(**base)


def tiny_cascade_rpn_config(**overrides) -> CascadeRPNConfig:
    """A shrunken Cascade RPN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(ratios=(1.0,), pos_iou_thr=0.7, neg_iou_thr=0.7,
                   min_pos_iou=0.3, sampler_num=64, nms_iou_thr=0.8,
                   train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return CascadeRPNConfig(**base)


def tiny_fcos_config(**overrides) -> FCOSConfig:
    """A shrunken FCOS for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        regress_ranges=((-1, 16), (16, 32), (32, 64), (64, 128), (128, 1e8)),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return FCOSConfig(**base)


def tiny_nasfcos_config(**overrides) -> NASFCOSConfig:
    """A shrunken NAS-FCOS for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        regress_ranges=((-1, 16), (16, 32), (32, 64), (64, 128), (128, 1e8)),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return NASFCOSConfig(**base)


def tiny_vfnet_config(**overrides) -> VFNetConfig:
    """A shrunken VFNet for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return VFNetConfig(**base)


def tiny_autoassign_config(**overrides) -> AutoAssignConfig:
    """A shrunken AutoAssign for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return AutoAssignConfig(**base)


def tiny_fsaf_config(**overrides) -> FSAFConfig:
    """A shrunken FSAF for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return FSAFConfig(**base)


def tiny_free_anchor_config(**overrides) -> FreeAnchorConfig:
    """A shrunken FreeAnchor for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        pre_anchor_topk=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return FreeAnchorConfig(**base)


def tiny_ghm_config(**overrides) -> GHMConfig:
    """A shrunken GHM RetinaNet for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return GHMConfig(**base)


def tiny_sabl_config(**overrides) -> SABLRetinaNetConfig:
    """A shrunken SABL RetinaNet for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return SABLRetinaNetConfig(**base)


def tiny_grid_rcnn_config(**overrides) -> GridRCNNConfig:
    """A shrunken Grid R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        grid_point_channels=8,  # conv_out 72, still divisible by GN 36
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return GridRCNNConfig(**base)


def tiny_nasfpn_config(**overrides) -> NASFPNRetinaNetConfig:
    """A shrunken NAS-FPN RetinaNet for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        nasfpn_stack_times=2,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return NASFPNRetinaNetConfig(**base)


def tiny_carafe_config(**overrides) -> CARAFEFasterRCNNConfig:
    """A shrunken CARAFE Faster R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return CARAFEFasterRCNNConfig(**base)


def tiny_pisa_rcnn_config(**overrides) -> PISAFasterRCNNConfig:
    """A shrunken PISA Faster R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, pos_fraction=0.25, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return PISAFasterRCNNConfig(**base)


def tiny_pisa_config(**overrides) -> PISARetinaNetConfig:
    """A shrunken PISA RetinaNet for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return PISARetinaNetConfig(**base)


def tiny_ga_config(**overrides) -> GARetinaNetConfig:
    """A shrunken GA-RetinaNet for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        ga_sampler_num=64,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return GARetinaNetConfig(**base)


def tiny_gfl_config(**overrides) -> GFLConfig:
    """A shrunken GFL for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        reg_max=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return GFLConfig(**base)


def tiny_ld_config(**overrides) -> LDConfig:
    """A shrunken LD (GFL student + teacher) for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        teacher_block_counts=(1, 1, 2, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        reg_max=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return LDConfig(**base)


def tiny_yolo_config(**overrides) -> YOLOConfig:
    """A shrunken YOLOv3 for fast CPU unit tests."""
    base = dict(
        input_size=64,
        block_counts=(1, 1, 1, 1, 1),
        stem_width=8,
        neck_channels=(32, 16, 8),
        head_channels=(32, 16, 8),
        base_sizes=(
            ((32, 24), (24, 32), (40, 40)),
            ((16, 12), (12, 16), (20, 20)),
            ((8, 6), (6, 8), (10, 10)),
        ),
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20,
                     nms_iou_thr=0.45),
    )
    base.update(overrides)
    return YOLOConfig(**base)


def tiny_paa_config(**overrides) -> PAAConfig:
    """A shrunken PAA for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        strides=(8, 16, 32),
        paa_topk=4,
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20,
                     nms_iou_thr=0.6),
    )
    base.update(overrides)
    return PAAConfig(**base)


def tiny_foveabox_config(**overrides) -> FoveaBoxConfig:
    """A shrunken FoveaBox for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        strides=(8, 16, 32),
        base_edge_list=(16, 32, 64),
        scale_ranges=((1, 24), (12, 48), (24, 1000)),
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return FoveaBoxConfig(**base)


def tiny_yolof_config(**overrides) -> YOLOFConfig:
    """A shrunken YOLOF for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        encoder_channels=16,
        encoder_mid_channels=8,
        stride=32,
        anchor_scales=(0.5, 1.0, 2.0),
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=24, max_per_img=12,
                     nms_iou_thr=0.6),
    )
    base.update(overrides)
    return YOLOFConfig(**base)


def tiny_sparse_rcnn_config(**overrides) -> SparseRCNNConfig:
    """A shrunken Sparse R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_proposals=12,
        num_stages=2,
        stage_loss_weights=(1.0, 1.0),
        num_heads=4,
        ffn_dim=32,
        dyn_feat=8,
        num_classes=6,
        max_gt=8,
        test=TestCfg(score_thr=0.0, max_per_img=12),
    )
    base.update(overrides)
    return SparseRCNNConfig(**base)


def tiny_centernet_config(**overrides) -> CenterNetConfig:
    """A shrunken CenterNet for fast CPU unit tests."""
    base = dict(
        input_size=64,
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        deconv_filters=(16, 8, 8),
        feat_channel=8,
        num_classes=6,
        max_gt=8,
        test=TestCfg(score_thr=0.0, max_per_img=20),
    )
    base.update(overrides)
    return CenterNetConfig(**base)


def tiny_detr_config(**overrides) -> DETRConfig:
    """A shrunken DETR for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        embed_dim=32,
        num_heads=4,
        ffn_dim=64,
        num_encoder_layers=2,
        num_decoder_layers=2,
        num_queries=12,
        num_classes=6,
        max_gt=8,
        test=TestCfg(score_thr=0.0, max_per_img=12),
    )
    base.update(overrides)
    return DETRConfig(**base)


def tiny_deformable_detr_config(**overrides) -> DeformableDETRConfig:
    """A shrunken Deformable DETR for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        embed_dim=32,
        num_heads=4,
        ffn_dim=64,
        num_encoder_layers=2,
        num_decoder_layers=2,
        num_queries=12,
        num_points=2,
        num_classes=6,
        max_gt=8,
        test=TestCfg(score_thr=0.0, max_per_img=12),
    )
    base.update(overrides)
    return DeformableDETRConfig(**base)


def tiny_yolact_config(**overrides) -> YOLACTConfig:
    """A shrunken YOLACT for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        feat_channels=16,
        num_protos=8,
        proto_channels=8,
        num_classes=6,
        max_gt=8,
        max_masks_train=16,
        gt_mask_raster=28,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return YOLACTConfig(**base)


def tiny_htc_config(**overrides) -> HTCConfig:
    """A shrunken HTC for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        mask_convs=2,
        mask_channels=8,
        mask_size=14,
        mask_roi_size=7,
        gt_mask_raster=28,
        seg_classes=7,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return HTCConfig(**base)


def tiny_scnet_config(**overrides) -> SCNetConfig:
    """A shrunken SCNet for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        mask_res_blocks=2,
        mask_channels=8,
        mask_size=14,
        mask_roi_size=7,
        gt_mask_raster=28,
        seg_classes=7,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return SCNetConfig(**base)


def tiny_cascade_config(**overrides) -> CascadeRCNNConfig:
    """A shrunken Cascade R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return CascadeRCNNConfig(**base)


def tiny_gn_ws_config(**overrides) -> GNWSFasterRCNNConfig:
    """A shrunken GN+WS Faster R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return GNWSFasterRCNNConfig(**base)


def tiny_fpg_config(**overrides) -> FPGFasterRCNNConfig:
    """A shrunken FPG Faster R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        fpg_stack_times=5,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return FPGFasterRCNNConfig(**base)


def tiny_groie_config(**overrides) -> GRoIEFasterRCNNConfig:
    """A shrunken GRoIE Faster R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return GRoIEFasterRCNNConfig(**base)


def tiny_empirical_attention_config(**overrides) -> EmpiricalAttentionConfig:
    """A shrunken empirical-attention Faster R-CNN for CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        backbone_attention="1111",  # exercise every energy term
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return EmpiricalAttentionConfig(**base)


def tiny_hrnet_config(**overrides) -> HRNetFasterRCNNConfig:
    """A shrunken HRNet Faster R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        hrnet_width=4,
        hrnet_stage_modules=(1, 1, 1),
        hrnet_num_blocks=1,
        hrnet_stage1_blocks=1,
        hrnet_stem_width=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return HRNetFasterRCNNConfig(**base)


def tiny_resnest_config(**overrides) -> ResNeStFasterRCNNConfig:
    """A shrunken ResNeSt Faster R-CNN for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return ResNeStFasterRCNNConfig(**base)


def tiny_detectors_config(**overrides) -> DetectoRSConfig:
    """A shrunken DetectoRS for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        aspp_out_channels=4,
        num_classes=6,
        max_gt=8,
        rpn=RPNCfg(train_nms_pre=256, train_max_per_img=64,
                   test_nms_pre=256, test_max_per_img=64,
                   sampler_num=64),
        rcnn=RCNNCfg(sampler_num=32, fc_channels=32),
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return DetectoRSConfig(**base)


def tiny_atss_config(**overrides) -> ATSSConfig:
    """A shrunken ATSS for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20),
    )
    base.update(overrides)
    return ATSSConfig(**base)


def tiny_reppoints_config(**overrides) -> RepPointsConfig:
    """A shrunken RepPoints for fast CPU unit tests."""
    base = dict(
        canvas=(64, 128),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        point_feat_channels=16,
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=128, max_per_img=20,
                     nms_iou_thr=0.5),
    )
    base.update(overrides)
    return RepPointsConfig(**base)


def tiny_centripetalnet_config(**overrides) -> "CentripetalNetConfig":
    """A shrunken CentripetalNet for fast CPU unit tests."""
    base = dict(
        input_size=64,
        num_stacks=1,
        hourglass_depth=2,
        stage_channels=(8, 8, 16),
        stage_blocks=(1, 1, 1),
        stem_width=8,
        num_classes=6,
        max_gt=8,
        corner_topk=20,
        num_dets=64,
        test=TestCfg(score_thr=0.0, max_per_img=20),
    )
    base.update(overrides)
    return CentripetalNetConfig(**base)


def tiny_cornernet_config(**overrides) -> CornerNetConfig:
    """A shrunken CornerNet for fast CPU unit tests."""
    base = dict(
        input_size=64,
        num_stacks=1,
        hourglass_depth=2,
        stage_channels=(8, 8, 16),
        stage_blocks=(1, 1, 1),
        stem_width=8,
        num_classes=6,
        max_gt=8,
        corner_topk=20,
        num_dets=64,
        test=TestCfg(score_thr=0.0, max_per_img=20),
    )
    base.update(overrides)
    return CornerNetConfig(**base)


def tiny_test_config(**overrides) -> RetinaNetConfig:
    """A shrunken RetinaNet for fast CPU unit tests."""
    base = dict(
        canvas=(128, 256),
        block_counts=(1, 1, 1, 1),
        stem_width=8,
        fpn_channels=16,
        stacked_convs=1,
        feat_channels=16,
        num_classes=6,
        max_gt=8,
        test=TestCfg(nms_pre=200, pre_nms_cands=256, max_per_img=20),
    )
    base.update(overrides)
    return RetinaNetConfig(**base)


# --- Zoo family registry -------------------------------------------------
# family name -> (full-size config class, tiny test-config factory). The
# single source of truth for every CLI's --family list (train_detector,
# get_flops, benchmark, export_model, serve): the reference enumerates
# families through its config directory + registry
# (mmdet/models/builder.py DETECTORS registry); here the registry is
# explicit so a new family lands in every tool by being added ONCE.
ZOO_FAMILIES = {
    "faster_rcnn": (FasterRCNNConfig, tiny_faster_rcnn_config),
    "libra_rcnn": (LibraRCNNConfig, tiny_libra_config),
    "pafpn": (PAFPNFasterRCNNConfig, tiny_pafpn_config),
    "dynamic_rcnn": (DynamicRCNNConfig, tiny_dynamic_rcnn_config),
    "double_head_rcnn": (DoubleHeadRCNNConfig, tiny_double_head_config),
    "cascade_rcnn": (CascadeRCNNConfig, tiny_cascade_config),
    "mask_rcnn": (MaskRCNNConfig, tiny_mask_rcnn_config),
    "seesaw": (SeesawMaskRCNNConfig, tiny_seesaw_config),
    "mask_scoring_rcnn": (MaskScoringRCNNConfig, tiny_mask_scoring_config),
    "point_rend": (PointRendConfig, tiny_point_rend_config),
    "rpn": (RPNOnlyConfig, tiny_rpn_config),
    "cascade_rpn": (CascadeRPNConfig, tiny_cascade_rpn_config),
    "tridentnet": (TridentNetConfig, tiny_trident_config),
    "detectors": (DetectoRSConfig, tiny_detectors_config),
    "hrnet": (HRNetFasterRCNNConfig, tiny_hrnet_config),
    "resnest": (ResNeStFasterRCNNConfig, tiny_resnest_config),
    "groie": (GRoIEFasterRCNNConfig, tiny_groie_config),
    "fpg": (FPGFasterRCNNConfig, tiny_fpg_config),
    "gn_ws": (GNWSFasterRCNNConfig, tiny_gn_ws_config),
    "empirical_attention": (EmpiricalAttentionConfig,
                            tiny_empirical_attention_config),
    "fast_rcnn": (FastRCNNConfig, tiny_fast_rcnn_config),
    "fcos": (FCOSConfig, tiny_fcos_config),
    "nas_fcos": (NASFCOSConfig, tiny_nasfcos_config),
    "free_anchor": (FreeAnchorConfig, tiny_free_anchor_config),
    "ghm": (GHMConfig, tiny_ghm_config),
    "guided_anchor": (GARetinaNetConfig, tiny_ga_config),
    "pisa_retinanet": (PISARetinaNetConfig, tiny_pisa_config),
    "pisa_faster_rcnn": (PISAFasterRCNNConfig, tiny_pisa_rcnn_config),
    "nasfpn": (NASFPNRetinaNetConfig, tiny_nasfpn_config),
    "grid_rcnn": (GridRCNNConfig, tiny_grid_rcnn_config),
    "sabl": (SABLRetinaNetConfig, tiny_sabl_config),
    "htc": (HTCConfig, tiny_htc_config),
    "scnet": (SCNetConfig, tiny_scnet_config),
    "yolact": (YOLACTConfig, tiny_yolact_config),
    "carafe": (CARAFEFasterRCNNConfig, tiny_carafe_config),
    "fsaf": (FSAFConfig, tiny_fsaf_config),
    "autoassign": (AutoAssignConfig, tiny_autoassign_config),
    "atss": (ATSSConfig, tiny_atss_config),
    "vfnet": (VFNetConfig, tiny_vfnet_config),
    "gfl": (GFLConfig, tiny_gfl_config),
    "ld": (LDConfig, tiny_ld_config),
    "yolov3": (YOLOConfig, tiny_yolo_config),
    "detr": (DETRConfig, tiny_detr_config),
    "deformable_detr": (DeformableDETRConfig, tiny_deformable_detr_config),
    "centernet": (CenterNetConfig, tiny_centernet_config),
    "sparse_rcnn": (SparseRCNNConfig, tiny_sparse_rcnn_config),
    "yolof": (YOLOFConfig, tiny_yolof_config),
    "foveabox": (FoveaBoxConfig, tiny_foveabox_config),
    "paa": (PAAConfig, tiny_paa_config),
    "cornernet": (CornerNetConfig, tiny_cornernet_config),
    "centripetalnet": (CentripetalNetConfig, tiny_centripetalnet_config),
    "reppoints": (RepPointsConfig, tiny_reppoints_config),
}

# The two live AL families (MEH RetinaNet / SSD) + the zoo: everything
# init_detector can build.
ALL_FAMILIES = ("retinanet", "ssd") + tuple(ZOO_FAMILIES)
