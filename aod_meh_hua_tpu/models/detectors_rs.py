"""DetectoRS model (Flax) — Switchable Atrous Convolution backbone +
Recursive Feature Pyramid on a Cascade R-CNN.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/backbones/detectors_resnet.py:15 (SAC bottleneck: conv2
  becomes a switchable atrous conv; first block of stages 2-4 adds a
  zero-init 1x1 `rfp_conv` that injects the RFP feedback before the
  final relu), :335 (rfp_forward threads per-stage feedback).
* mmdet/models/necks/rfp.py:59 (RFP: FPN -> ASPP feedback -> a SECOND
  backbone unroll -> same FPN -> per-level fusion by a zero-init
  sigmoid gate), :11 (ASPP: 4 branches d=1/3/6 + global-pool branch,
  out channels concatenated back to the FPN width).
* configs/detectors/detectors_cascade_rcnn_r50_1x_coco.py (SAC in
  stages 2-4 with use_deform semantics dropped to the plain pair —
  documented below; rfp_steps=2, aspp_out_channels=64).
* SAC itself lives in mmcv (ops/saconv.py SAConv2d + ConvAWS2d), not
  in-tree; re-derived here: weight-standardized shared 3x3 kernel w,
  out = S(x) * conv(x, w, d=1) + (1 - S(x)) * conv(x, w + dw, d=3)
  with dw zero-init, S = 1x1(stride) conv on a reflect-padded 5x5 avg
  pool (weight 0 / bias 1 init -> the block IS the plain conv at
  init), plus zero-init global pre/post context 1x1s.

TPU notes: both atrous branches are dense convs XLA maps straight onto
the MXU; the switch is one fused elementwise blend. The mmcv
`use_deform=True` offset refinement on the SAC branches is intentionally
not replicated (it would put a gather inside every backbone conv); the
parity target is the SAC/RFP mechanism, and the deviation is noted here.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fpn import FPN
from .two_stage import RPNHead, Shared2FCBBoxHead


def _gap(x):
    return x.mean(axis=(1, 2), keepdims=True)


class SAConv3x3(nn.Module):
    """Switchable Atrous Convolution (mmcv SAConv2d re-derivation)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_uniform(),
                            (3, 3, cin, self.features), jnp.float32)
        weight_diff = self.param("weight_diff", nn.initializers.zeros,
                                 (3, 3, cin, self.features), jnp.float32)
        gamma = self.param("weight_gamma", nn.initializers.ones,
                           (self.features,), jnp.float32)
        beta = self.param("weight_beta", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # adaptive weight standardization (ConvAWS2d._get_weight)
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        std = kernel.std(axis=(0, 1, 2), keepdims=True) + 1e-5
        w = gamma * (kernel - mean) / std + beta

        # zero-init global pre-context
        pre = nn.Conv(cin, (1, 1), kernel_init=nn.initializers.zeros,
                      dtype=jnp.float32, name="pre_context")(
            _gap(x.astype(jnp.float32)))
        x = x + pre.astype(x.dtype)

        # switch: reflect-pad 5x5 avg pool -> strided 1x1 (w=0, b=1 init)
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (2, 2), (2, 2), (0, 0)),
                     mode="reflect")
        avg = nn.avg_pool(xp, (5, 5), strides=(1, 1))
        switch = nn.Conv(1, (1, 1), strides=(self.stride, self.stride),
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones,
                         dtype=jnp.float32, name="switch")(avg)

        def conv(v, kern, d):
            return jax.lax.conv_general_dilated(
                v, kern.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=((d, d), (d, d)), rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)

        out_s = conv(x.astype(self.dtype), w, 1)
        out_l = conv(x.astype(self.dtype), w + weight_diff, 3)
        s = switch.astype(self.dtype)
        out = s * out_s + (1.0 - s) * out_l

        post = nn.Conv(self.features, (1, 1),
                       kernel_init=nn.initializers.zeros,
                       dtype=jnp.float32, name="post_context")(
            _gap(out.astype(jnp.float32)))
        return out + post.astype(out.dtype)


class SACBottleneck(nn.Module):
    """Bottleneck with an optional SAC conv2 and an optional zero-init
    rfp_conv feedback input (detectors_resnet.py Bottleneck)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    sac: bool = False
    rfp: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        bn = lambda name: nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        self.conv1 = nn.Conv(self.planes, (1, 1), use_bias=False,
                             dtype=self.dtype, name="conv1")
        self.bn1 = bn("bn1")
        if self.sac:
            self.conv2 = SAConv3x3(self.planes, stride=self.stride,
                                   dtype=self.dtype, name="conv2")
        else:
            self.conv2 = nn.Conv(self.planes, (3, 3),
                                 strides=(self.stride, self.stride),
                                 padding=((1, 1), (1, 1)), use_bias=False,
                                 dtype=self.dtype, name="conv2")
        self.bn2 = bn("bn2")
        self.conv3 = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                             dtype=self.dtype, name="conv3")
        self.bn3 = bn("bn3")
        if self.downsample:
            self.downsample_conv = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv")
            self.downsample_bn = bn("downsample_bn")
        if self.rfp:
            self.rfp_conv = nn.Conv(self.planes * 4, (1, 1),
                                    kernel_init=nn.initializers.zeros,
                                    dtype=self.dtype, name="rfp_conv")

    def __call__(self, x, rfp_feat: Optional[jnp.ndarray] = None):
        identity = x
        y = nn.relu(self.bn1(self.conv1(x)))
        y = nn.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample:
            identity = self.downsample_bn(self.downsample_conv(x))
        y = y + identity
        if self.rfp and rfp_feat is not None:
            y = y + self.rfp_conv(rfp_feat)
        return nn.relu(y)


class DetectoRSResNet(nn.Module):
    """R50 with SAC in stages 2-4; rfp_call threads per-stage RFP
    feedback into each stage's first block."""

    block_counts: Sequence[int] = (3, 4, 6, 3)
    stem_width: int = 64
    stage_with_sac: Sequence[bool] = (False, True, True, True)
    with_rfp: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.conv1 = nn.Conv(self.stem_width, (7, 7), strides=(2, 2),
                             padding=((3, 3), (3, 3)), use_bias=False,
                             dtype=self.dtype, name="conv1")
        self.bn1 = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                dtype=self.dtype, name="bn1")
        blocks = []
        for stage, n in enumerate(self.block_counts):
            planes = self.stem_width * (2 ** stage)
            row = []
            for b in range(n):
                row.append(SACBottleneck(
                    planes=planes, stride=2 if (stage > 0 and b == 0) else 1,
                    downsample=(b == 0), sac=self.stage_with_sac[stage],
                    rfp=(self.with_rfp and stage > 0 and b == 0),
                    dtype=self.dtype, name=f"layer{stage + 1}_{b}"))
            blocks.append(row)
        self.blocks = blocks

    def _stem(self, x):
        x = nn.relu(self.bn1(self.conv1(x.astype(self.dtype))))
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    def __call__(self, x):
        return self.rfp_call(x, (None, None, None, None))

    def rfp_call(self, x, rfp_feats):
        x = self._stem(x)
        outs = []
        for stage, row in enumerate(self.blocks):
            for bi, blk in enumerate(row):
                x = blk(x, rfp_feats[stage] if bi == 0 else None)
            outs.append(x)
        return tuple(outs)


class ASPP(nn.Module):
    """rfp.py:11 — branches d=1 (1x1), d=3, d=6, and a global-pool 1x1,
    each `out_channels` wide, relu'd and concatenated."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        outs = [
            nn.relu(nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name="aspp0")(x)),
            nn.relu(nn.Conv(self.out_channels, (3, 3),
                            padding=((3, 3), (3, 3)), kernel_dilation=(3, 3),
                            dtype=self.dtype, name="aspp1")(x)),
            nn.relu(nn.Conv(self.out_channels, (3, 3),
                            padding=((6, 6), (6, 6)), kernel_dilation=(6, 6),
                            dtype=self.dtype, name="aspp2")(x)),
        ]
        g = nn.relu(nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name="aspp3")(_gap(x)))
        outs.append(jnp.broadcast_to(g, outs[0].shape))
        return jnp.concatenate(outs, axis=-1)


class DetectoRSCascadeRCNN(nn.Module):
    """Cascade R-CNN over the SAC backbone + RFP neck; exposes the same
    features/rpn/roi_forward surface as models.two_stage.CascadeRCNN so
    engine.two_stage's cascade steps drive it unchanged."""

    cfg: Any  # DetectoRSConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        sac = self.cfg.stage_with_sac
        self.backbone = DetectoRSResNet(
            block_counts=self.cfg.block_counts, stem_width=self.cfg.stem_width,
            stage_with_sac=sac, with_rfp=False, dtype=dtype, name="backbone")
        if self.cfg.rfp_steps > 1:
            self.rfp_backbone = DetectoRSResNet(
                block_counts=self.cfg.block_counts,
                stem_width=self.cfg.stem_width, stage_with_sac=sac,
                with_rfp=True, dtype=dtype, name="rfp_backbone")
            self.aspp = ASPP(self.cfg.aspp_out_channels, dtype=dtype,
                             name="rfp_aspp")
            self.rfp_weight = nn.Conv(1, (1, 1),
                                      kernel_init=nn.initializers.zeros,
                                      bias_init=nn.initializers.zeros,
                                      dtype=jnp.float32, name="rfp_weight")
        self.neck = FPN(out_channels=self.cfg.fpn_channels, start_level=0,
                        num_outs=len(self.cfg.rpn.anchor_strides),
                        add_extra_convs="maxpool", dtype=dtype, name="neck")
        self.rpn_head = RPNHead(num_anchors=self.cfg.rpn.num_anchors,
                                feat_channels=self.cfg.fpn_channels,
                                dtype=dtype, name="rpn_head")
        self.bbox_heads = [
            Shared2FCBBoxHead(num_classes=self.cfg.num_classes,
                              fc_channels=self.cfg.rcnn.fc_channels,
                              reg_class_agnostic=True, dtype=dtype,
                              name=f"bbox_head_{i}")
            for i in range(self.cfg.num_stages)
        ]

    def features(self, images: jnp.ndarray):
        x = self.neck(self.backbone(images))
        for _ in range(self.cfg.rfp_steps - 1):
            # stage i (1-3) feedback = ASPP of pyramid level i (rfp.py:123)
            rfp_feats = (None,) + tuple(self.aspp(x[i]) for i in (1, 2, 3))
            x2 = self.neck(self.rfp_backbone.rfp_call(images, rfp_feats))
            fused = []
            for a, b in zip(x, x2):
                gate = jax.nn.sigmoid(self.rfp_weight(
                    b.astype(jnp.float32))).astype(b.dtype)
                fused.append(gate * b + (1.0 - gate) * a)
            x = tuple(fused)
        return x

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


def build_detectors_rs(cfg) -> DetectoRSCascadeRCNN:
    return DetectoRSCascadeRCNN(cfg=cfg)


def init_detectors_rs(cfg, rng: jax.Array):
    model = build_detectors_rs(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, dummy)
    return model, variables
