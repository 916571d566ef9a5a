"""Faster R-CNN (two-stage) model components (Flax).

Behavioral parity targets (reference, /root/reference):
* configs/_base_/models/faster_rcnn_r50_fpn.py — the upstream family the
  fork keeps registered (mmdet/models/detectors/faster_rcnn.py; VOC
  variant configs/pascal_voc/): R50 + FPN(num_outs=5, extra = maxpool),
  RPNHead(3x3 conv -> 1x1 objectness/deltas over 3 anchors,
  rpn_head.py:29-43), StandardRoIHead with SingleRoIExtractor(RoIAlign 7,
  strides 4-32) + Shared2FCBBoxHead(two fc1024, softmax C+1 cls,
  class-specific reg, convfc_bbox_head.py).

TPU-first: modules hold parameters and pure forward passes only; the
proposal/sampling/target logic lives in engine/two_stage.py as one jit
region over fixed-shape ops (grouped NMS, random sampler, RoIAlign
gathers). NHWC throughout; head outputs flatten to [B, A_tot, .] in the
same row-major cell / anchor-minor order as ops/anchors.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fpn import BFP, FPN
from .resnet import ResNet
from .detector import flatten_levels


class RPNHead(nn.Module):
    """Shared 3x3 conv + ReLU, then 1x1 objectness (A) and deltas (A*4)."""

    num_anchors: int = 3
    feat_channels: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        from jax.nn.initializers import normal, zeros

        self.rpn_conv = nn.Conv(
            self.feat_channels, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=normal(0.01), bias_init=zeros, dtype=self.dtype, name="rpn_conv")
        self.rpn_cls = nn.Conv(
            self.num_anchors, (1, 1), kernel_init=normal(0.01), bias_init=zeros,
            dtype=self.dtype, name="rpn_cls")
        self.rpn_reg = nn.Conv(
            self.num_anchors * 4, (1, 1), kernel_init=normal(0.01), bias_init=zeros,
            dtype=self.dtype, name="rpn_reg")

    def __call__(self, feats: Sequence[jnp.ndarray]):
        """Per-level maps -> (objectness [B, A_tot], deltas [B, A_tot, 4])."""
        cls_maps, reg_maps = [], []
        for f in feats:
            x = nn.relu(self.rpn_conv(f))
            cls_maps.append(self.rpn_cls(x))
            reg_maps.append(self.rpn_reg(x))
        cls = flatten_levels(cls_maps, 1)[..., 0].astype(jnp.float32)
        reg = flatten_levels(reg_maps, 4).astype(jnp.float32)
        return cls, reg


class Shared2FCBBoxHead(nn.Module):
    """Flattened 7x7x256 RoI feature -> fc1024 -> fc1024 -> (cls, reg).

    cls has C+1 channels (softmax, background last); reg is class-specific
    [*, C, 4] (reg_class_agnostic=False) or shared [*, 1, 4] (=True, the
    cascade heads). Init: Xavier-uniform shared fcs, Normal(0.01) cls,
    Normal(0.001) reg (convfc_bbox_head.py init_cfg).
    """

    num_classes: int
    fc_channels: int = 1024
    reg_class_agnostic: bool = False
    # SeesawLoss custom head (seesaw_loss.py get_cls_channels): C class
    # logits + a 2-way objectness pair instead of the C+1 softmax
    cls_channels: int = 0  # 0 = num_classes + 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        from jax.nn.initializers import normal, xavier_uniform, zeros

        x = roi_feats.reshape(roi_feats.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xavier_uniform(),
                             bias_init=zeros, dtype=self.dtype, name="shared_fc_0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xavier_uniform(),
                             bias_init=zeros, dtype=self.dtype, name="shared_fc_1")(x))
        cls = nn.Dense(self.cls_channels or self.num_classes + 1,
                       kernel_init=normal(0.01),
                       bias_init=zeros, dtype=self.dtype, name="fc_cls")(x)
        reg_out = 4 if self.reg_class_agnostic else self.num_classes * 4
        reg = nn.Dense(reg_out, kernel_init=normal(0.001),
                       bias_init=zeros, dtype=self.dtype, name="fc_reg")(x)
        return (cls.astype(jnp.float32),
                reg.astype(jnp.float32).reshape(-1, reg_out // 4, 4))


class FasterRCNN(nn.Module):
    """Parameter container + pure forwards; orchestration in engine/two_stage."""

    cfg: Any  # FasterRCNNConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        if getattr(self.cfg, "backbone_type", "resnet") != "resnet":
            from .backbones import build_backbone

            self.backbone = build_backbone(self.cfg, dtype)
        else:
            backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
            self.backbone = backbone_cls(
                block_counts=self.cfg.block_counts,
                stem_width=self.cfg.stem_width,
                stem_s2d=self.cfg.stem_s2d,
                dcn=getattr(self.cfg, "backbone_dcn", None),
                gcb_ratio=getattr(self.cfg, "backbone_gcb_ratio", None),
                attention=getattr(self.cfg, "backbone_attention", None),
                dtype=dtype, name="backbone")
        if getattr(self.cfg, "neck_type", "fpn") == "pafpn":
            from .fpn import PAFPN

            self.neck = PAFPN(out_channels=self.cfg.fpn_channels,
                              start_level=0,
                              num_outs=len(self.cfg.rpn.anchor_strides),
                              dtype=dtype, name="neck")
        elif getattr(self.cfg, "neck_type", "fpn") == "carafe_fpn":
            from .fpn import FPNCARAFE

            self.neck = FPNCARAFE(out_channels=self.cfg.fpn_channels,
                                  num_outs=len(self.cfg.rpn.anchor_strides),
                                  dtype=dtype, name="neck")
        elif getattr(self.cfg, "neck_type", "fpn") == "hrfpn":
            from .hrnet import HRFPN

            self.neck = HRFPN(out_channels=self.cfg.fpn_channels,
                              num_outs=len(self.cfg.rpn.anchor_strides),
                              dtype=dtype, name="neck")
        elif getattr(self.cfg, "neck_type", "fpn") == "fpg":
            from .fpg import FPG

            self.neck = FPG(out_channels=self.cfg.fpn_channels,
                            inter_channels=self.cfg.fpn_channels,
                            num_outs=len(self.cfg.rpn.anchor_strides),
                            stack_times=getattr(self.cfg, "fpg_stack_times",
                                                9),
                            dtype=dtype, name="neck")
        else:
            self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=0,
                            num_outs=len(self.cfg.rpn.anchor_strides),
                            add_extra_convs="maxpool", dtype=dtype, name="neck")
        self.rpn_head = RPNHead(num_anchors=self.cfg.rpn.num_anchors,
                                feat_channels=self.cfg.fpn_channels,
                                dtype=dtype, name="rpn_head")
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.cfg.num_classes,
                                           fc_channels=self.cfg.rcnn.fc_channels,
                                           dtype=dtype, name="bbox_head")
        # Libra R-CNN: Balanced Feature Pyramid stacked after the FPN
        # (reference configs/libra_rcnn/*.py neck=[FPN, BFP])
        if getattr(self.cfg, "bfp_refine_level", None) is not None:
            self.bfp = BFP(refine_level=self.cfg.bfp_refine_level,
                           refine_type=self.cfg.bfp_refine_type,
                           dtype=dtype, name="bfp")
        else:
            self.bfp = None
        # GRoIE (configs/groie/faster_rcnn_r50_fpn_groie_1x_coco.py):
        # shared 5x5 pre ConvModule per level + GeneralizedAttention
        # post module on the level sum
        if getattr(self.cfg, "roi_extractor", "single") == "groie":
            from .attention import GeneralizedAttention

            self.groie_pre = nn.Conv(self.cfg.fpn_channels, (5, 5),
                                     padding=((2, 2), (2, 2)), dtype=dtype,
                                     name="groie_pre")
            self.groie_post = GeneralizedAttention(
                num_heads=6, attention_type="0100", kv_stride=2,
                dtype=dtype, name="groie_post")
        else:
            self.groie_pre = None

    def features(self, images: jnp.ndarray):
        feats = self.neck(self.backbone(images))
        if self.bfp is not None:
            feats = self.bfp(feats)
        return feats

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_forward(self, roi_feats: jnp.ndarray):
        return self.bbox_head(roi_feats)

    def groie_fuse(self, per_level):
        """GenericRoIExtractor aggregation: pre-process each level's
        RoI features (shared conv), sum, post-attention."""
        acc = None
        for f in per_level:
            y = nn.relu(self.groie_pre(f))
            acc = y if acc is None else acc + y
        return self.groie_post(acc)

    def __call__(self, images: jnp.ndarray):
        """Init/compile-check forward: builds every parameter."""
        feats = self.features(images)
        rpn_cls, rpn_reg = self.rpn_head(feats)
        s = self.cfg.rcnn.roi_size
        dummy = jnp.zeros((1, s, s, self.cfg.fpn_channels), jnp.float32)
        if self.groie_pre is not None:
            dummy = self.groie_fuse([dummy] * len(self.cfg.rcnn.roi_strides))
        cls, reg = self.bbox_head(dummy)
        return rpn_cls, rpn_reg, cls, reg


class CascadeRCNN(nn.Module):
    """Cascade R-CNN: the Faster R-CNN trunk with a 3-stage RoI head
    cascade (reference configs/_base_/models/cascade_rcnn_r50_fpn.py:
    three Shared2FC heads with reg_class_agnostic=True, progressively
    tighter assignment 0.5/0.6/0.7 and stds 0.1/0.05/0.033)."""

    cfg: Any  # CascadeRCNNConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=0,
                        num_outs=len(self.cfg.rpn.anchor_strides),
                        add_extra_convs="maxpool", dtype=dtype, name="neck")
        self.rpn_head = RPNHead(num_anchors=self.cfg.rpn.num_anchors,
                                feat_channels=self.cfg.fpn_channels,
                                dtype=dtype, name="rpn_head")
        self.bbox_heads = [
            Shared2FCBBoxHead(num_classes=self.cfg.num_classes,
                              fc_channels=self.cfg.rcnn.fc_channels,
                              reg_class_agnostic=True,
                              dtype=dtype, name=f"bbox_head_{i}")
            for i in range(self.cfg.num_stages)
        ]

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_forward(self, roi_feats: jnp.ndarray, stage: int):
        return self.bbox_heads[stage](roi_feats)

    def __call__(self, images: jnp.ndarray):
        feats = self.features(images)
        rpn_cls, rpn_reg = self.rpn_head(feats)
        s = self.cfg.rcnn.roi_size
        dummy = jnp.zeros((1, s, s, self.cfg.fpn_channels), jnp.float32)
        outs = [h(dummy) for h in self.bbox_heads]
        return rpn_cls, rpn_reg, outs


def build_cascade_rcnn(cfg) -> CascadeRCNN:
    return CascadeRCNN(cfg=cfg)


def init_cascade_rcnn(cfg, rng: jax.Array):
    model = build_cascade_rcnn(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables


def build_faster_rcnn(cfg) -> FasterRCNN:
    return FasterRCNN(cfg=cfg)


def init_faster_rcnn(cfg, rng: jax.Array):
    model = build_faster_rcnn(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables


# --------------------------------------------------------------------------
# Double-Head R-CNN (reference mmdet/models/roi_heads/double_roi_head.py +
# bbox_heads/double_bbox_head.py, configs/double_heads/*.py)
# --------------------------------------------------------------------------


class _HeadBottleneck(nn.Module):
    """Backbone-style bottleneck for the double head's conv branch, with
    TRAINABLE BatchNorm (the head is new; only backbone BN is norm_eval)."""

    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       epsilon=1e-5, dtype=self.dtype,
                                       name=name)
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        return nn.relu(y + x)


class BasicResBlock(nn.Module):
    """double_bbox_head.py:10-73: 3x3+BN+ReLU -> 1x1+BN main path, 1x1+BN
    identity path, ReLU after the sum (channel lift 256 -> 1024)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       epsilon=1e-5, dtype=self.dtype,
                                       name=name)
        y = nn.Conv(x.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        idt = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv_identity")(x)
        idt = bn("bn_identity")(idt)
        return nn.relu(y + idt)


class DoubleConvFCBBoxHead(nn.Module):
    """double_bbox_head.py:76-177: the reg branch is convolutional
    (BasicResBlock + num_convs bottlenecks + global avg pool -> fc_reg),
    the cls branch is fully connected (num_fcs fc + fc_cls)."""

    num_classes: int
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_cls: jnp.ndarray, x_reg: jnp.ndarray,
                 train: bool = False):
        from jax.nn.initializers import normal, xavier_uniform, zeros

        y = BasicResBlock(self.conv_out_channels, dtype=self.dtype,
                          name="res_block")(x_reg, train)
        for i in range(self.num_convs):
            y = _HeadBottleneck(self.conv_out_channels // 4, dtype=self.dtype,
                                name=f"conv_branch_{i}")(y, train)
        y = y.mean(axis=(1, 2))  # with_avg_pool=True
        reg = nn.Dense(self.num_classes * 4, kernel_init=normal(0.001),
                       bias_init=zeros, dtype=self.dtype, name="fc_reg")(y)

        f = x_cls.reshape(x_cls.shape[0], -1).astype(self.dtype)
        for i in range(self.num_fcs):
            f = nn.relu(nn.Dense(self.fc_out_channels,
                                 kernel_init=xavier_uniform(),
                                 bias_init=zeros, dtype=self.dtype,
                                 name=f"fc_branch_{i}")(f))
        cls = nn.Dense(self.num_classes + 1, kernel_init=normal(0.01),
                       bias_init=zeros, dtype=self.dtype, name="fc_cls")(f)
        return (cls.astype(jnp.float32),
                reg.astype(jnp.float32).reshape(-1, self.num_classes, 4))


class DoubleHeadRCNN(nn.Module):
    """Faster R-CNN trunk with the DoubleConvFCBBoxHead; the engine feeds
    it two RoI extractions (cls at the roi, reg at 1.3x the roi)."""

    cfg: Any  # DoubleHeadRCNNConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        backbone_cls = nn.remat(ResNet) if self.cfg.remat else ResNet
        self.backbone = backbone_cls(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stem_s2d=self.cfg.stem_s2d, dtype=dtype, name="backbone")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=0,
                        num_outs=len(self.cfg.rpn.anchor_strides),
                        add_extra_convs="maxpool", dtype=dtype, name="neck")
        self.rpn_head = RPNHead(num_anchors=self.cfg.rpn.num_anchors,
                                feat_channels=self.cfg.fpn_channels,
                                dtype=dtype, name="rpn_head")
        self.bbox_head = DoubleConvFCBBoxHead(
            num_classes=self.cfg.num_classes,
            num_convs=self.cfg.dh_num_convs, num_fcs=self.cfg.dh_num_fcs,
            conv_out_channels=self.cfg.dh_conv_out,
            fc_out_channels=self.cfg.dh_fc_out,
            dtype=dtype, name="bbox_head")

    def features(self, images: jnp.ndarray):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_forward(self, cls_feats: jnp.ndarray, reg_feats: jnp.ndarray,
                    train: bool = False):
        return self.bbox_head(cls_feats, reg_feats, train)

    def __call__(self, images: jnp.ndarray):
        feats = self.features(images)
        rpn_cls, rpn_reg = self.rpn_head(feats)
        s = self.cfg.rcnn.roi_size
        dummy = jnp.zeros((1, s, s, self.cfg.fpn_channels), jnp.float32)
        cls, reg = self.bbox_head(dummy, dummy, False)
        return rpn_cls, rpn_reg, cls, reg


def build_double_head_rcnn(cfg) -> DoubleHeadRCNN:
    return DoubleHeadRCNN(cfg=cfg)


def init_double_head_rcnn(cfg, rng: jax.Array):
    model = build_double_head_rcnn(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
