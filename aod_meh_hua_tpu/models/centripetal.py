"""CentripetalNet model (Flax) — corner keypoints paired by centripetal
shifts instead of associative embeddings.

Behavioral parity targets (reference, /root/reference):
* mmdet/models/dense_heads/centripetal_head.py:10 (CentripetalHead on
  CornerHead: embedding branches removed; per corner-pool output a
  guiding-shift branch, a 1x1 (std 0.1, no bias) conv on the DETACHED
  guiding shift producing deform offsets, a 3x3 deform feat-adaption
  conv (std 0.01), and a centripetal-shift branch on the adapted
  features), :155-203 (forward_single).
* configs/centripetalnet/centripetalnet_hourglass104_mstest_*.py
  (corner_emb_channels=0, guiding SmoothL1 x0.05, centripetal
  SmoothL1 x1).

The deform feat-adaption reuses the explicit-offset bilinear-gather
deform conv from models/cascade_rpn.py ((dy, dx)-interleaved taps, same
layout as mmcv DeformConv2d).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .cascade_rpn import DeformConv3x3Explicit
from .cornernet import BiCornerPool, HourglassNet, _Branch


class CentripetalNet(nn.Module):
    """Returns per-stack (tl_heat, br_heat, tl_off, br_off, tl_guide,
    br_guide, tl_cent, br_cent) tuples, each [B, H/4, W/4, ch]."""

    cfg: Any

    @nn.compact
    def __call__(self, images, train: bool = False):
        c = self.cfg
        dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        feats = HourglassNet(
            num_stacks=c.num_stacks, depth=c.hourglass_depth,
            stage_channels=c.stage_channels, stage_blocks=c.stage_blocks,
            stem_width=c.stem_width, dtype=dtype, name="backbone")(images, train)
        ch = c.stage_channels[0]
        outs = []
        for i, f in enumerate(feats):
            tl = BiCornerPool(("top", "left"), feat_channels=ch // 2,
                              out_channels=ch, dtype=dtype,
                              name=f"tl_pool{i}")(f, train)
            br = BiCornerPool(("bottom", "right"), feat_channels=ch // 2,
                              out_channels=ch, dtype=dtype,
                              name=f"br_pool{i}")(f, train)
            per = []
            for tag, p in (("tl", tl), ("br", br)):
                heat = _Branch(c.num_classes, ch, bias_prob=0.1, dtype=dtype,
                               name=f"{tag}_heat{i}")(p)
                off = _Branch(2, ch, dtype=dtype, name=f"{tag}_off{i}")(p)
                guide = _Branch(2, ch, dtype=dtype,
                                name=f"{tag}_guide{i}")(p)
                dcn_off = nn.Conv(
                    18, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.normal(0.1),
                    dtype=jnp.float32, name=f"{tag}_dcn_off{i}")(
                    jax.lax.stop_gradient(guide.astype(jnp.float32)))
                # raw deform-conv output, no activation: the reference's
                # feat_adaption (DeformConv2d, centripetal_head.py:188-196)
                # feeds the shift branch with signed features — the
                # branch's own ConvModule relu is the only nonlinearity
                adapted = DeformConv3x3Explicit(
                    ch, dtype=dtype, name=f"{tag}_adaption{i}")(p, dcn_off)
                cent = _Branch(2, ch, dtype=dtype,
                               name=f"{tag}_cent{i}")(adapted)
                per.append((heat, off, guide, cent))
            (tl_heat, tl_off, tl_guide, tl_cent) = per[0]
            (br_heat, br_off, br_guide, br_cent) = per[1]
            outs.append(tuple(t.astype(jnp.float32) for t in
                              (tl_heat, br_heat, tl_off, br_off,
                               tl_guide, br_guide, tl_cent, br_cent)))
        return outs


def init_centripetalnet(cfg, key):
    model = CentripetalNet(cfg)
    h, w = cfg.canvas
    variables = model.init(key, jnp.zeros((1, h, w, 3), jnp.float32))
    return model, variables
