"""Deformable DETR: R50 C3-C5 + ChannelMapper + deformable transformer.

Behavioral parity targets (reference, /root/reference):
* configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py — R50
  out C3-C5 (frozen_stages=1, frozen BN), ChannelMapper 1x1 + GN(32) to
  256ch with a 4th stride-2 extra level, 6 encoder + 6 decoder layers,
  embed 256, FFN 1024, 300 queries, sine PE (num_feats=128,
  normalize=True, offset=-0.5), sigmoid focal cls head.
* mmdet/models/detectors/deformable_detr.py:1 (trivial subclass) +
  mmdet/models/utils/transformer.py:264-667 — flattened multi-level
  memory with level embeds, per-pixel encoder reference points scaled by
  valid ratios, decoder reference points from a Linear on query_pos
  (as_two_stage=False), post-norm layer order, intermediate outputs from
  every decoder layer.
* mmdet/models/dense_heads/deformable_detr_head.py — shared cls/reg
  branches across layers (with_box_refine=False), reg deltas added to
  inverse_sigmoid(reference) before the final sigmoid.
* mmcv MultiScaleDeformableAttention — 8 heads x 4 levels x 4 points,
  offsets/attention from Linears on the query (offset Linear zero-weight
  with the rotated-grid bias init, attention Linear zero-init), value
  Linear + output Linear; sampling semantics in ops/ms_deform_attn.py.

TPU redesign notes: level shapes are static functions of the canvas
config, so every flatten/split is shape-static and the whole forward is
one XLA program; the CUDA MSDeformAttn kernel becomes fused bilinear
gathers (ops/ms_deform_attn.py). The per-level valid mask uses the
repo's floor-mapped padding convention (models/detr.py:154-157) rather
than torch's F.interpolate of a bool mask — identical on exact-multiple
grids, off by at most one border row otherwise (documented deviation).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ms_deform_attn import (encoder_reference_points, inverse_sigmoid,
                                  ms_deform_attn)
from .detr import FFN, sine_positional_encoding
from .resnet import ResNet


def _offset_bias_init(nheads: int, nlevels: int, npoints: int):
    """mmcv MultiScaleDeformableAttention.init_weights: per-head unit
    vectors at angles 2*pi*i/nheads, normalized to max |coord| 1, scaled
    by (point index + 1)."""
    thetas = np.arange(nheads, dtype=np.float32) * (2.0 * math.pi / nheads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # [H, 2]
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, nlevels, npoints, 1))
    grid = grid * (np.arange(npoints, dtype=np.float32) + 1.0)[None, None, :, None]
    bias = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert shape == bias.shape, (shape, bias.shape)
        return jnp.asarray(bias, dtype)

    return init


class MSDeformAttention(nn.Module):
    """MultiScaleDeformableAttention (batch-first). query: [B, Q, E];
    value arrives as per-level spatial maps [B, Hl, Wl, E]."""

    embed: int
    heads: int = 8
    points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray,
                 value_levels: Sequence[jnp.ndarray],
                 value_valid: Sequence[jnp.ndarray],
                 reference_points: jnp.ndarray) -> jnp.ndarray:
        """reference_points: [B, Q, nlevels, 2] normalized (x, y)."""
        nlev = len(value_levels)
        b, q, _ = query.shape
        hd = self.embed // self.heads

        vals = []
        vproj = nn.Dense(self.embed, dtype=self.dtype, name="value_proj")
        for lvl, (v, ok) in enumerate(zip(value_levels, value_valid)):
            v = vproj(v) * ok[..., None].astype(v.dtype)  # mask padded keys
            vals.append(v.reshape(v.shape[0], v.shape[1], v.shape[2],
                                  self.heads, hd))

        off = nn.Dense(self.heads * nlev * self.points * 2,
                       kernel_init=nn.initializers.zeros,
                       bias_init=_offset_bias_init(self.heads, nlev, self.points),
                       dtype=jnp.float32, name="sampling_offsets")(
                           query.astype(jnp.float32))
        off = off.reshape(b, q, self.heads, nlev, self.points, 2)
        attn = nn.Dense(self.heads * nlev * self.points,
                        kernel_init=nn.initializers.zeros,
                        dtype=jnp.float32, name="attention_weights")(
                            query.astype(jnp.float32))
        attn = jax.nn.softmax(attn.reshape(b, q, self.heads, nlev * self.points),
                              axis=-1).reshape(b, q, self.heads, nlev, self.points)

        # 2-point reference: offsets are normalized per level's extent
        # (multi_scale_deform_attn.py: offset / offset_normalizer[(w, h)])
        wh = jnp.asarray([[v.shape[2], v.shape[1]] for v in value_levels],
                         jnp.float32)  # [L, (w, h)]
        loc = reference_points[:, :, None, :, None, :] \
            + off / wh[None, None, None, :, None, :]
        out = ms_deform_attn(vals, loc, attn)
        return nn.Dense(self.embed, dtype=self.dtype,
                        name="output_proj")(out.astype(self.dtype))


class DeformableEncoderLayer(nn.Module):
    embed: int
    heads: int
    points: int
    ffn_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, level_shapes, value_valid, ref_points, train):
        """x/pos: [B, S, E] flattened tokens; self-attn samples from the
        token grid itself (split back into spatial maps)."""
        q = x + pos
        vals = _split_levels(x, level_shapes)
        sa = MSDeformAttention(self.embed, self.heads, self.points,
                               self.dtype, name="self_attn")(
                                   q, vals, value_valid, ref_points)
        sa = nn.Dropout(self.dropout, deterministic=not train)(sa)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x + sa)
        y = FFN(self.ffn_dim, self.embed, self.dropout, self.dtype,
                name="ffn")(x, train)
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + y)


class DeformableDecoderLayer(nn.Module):
    embed: int
    heads: int
    points: int
    ffn_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, query_pos, memory_levels, value_valid,
                 ref_points, train):
        sa = nn.MultiHeadDotProductAttention(
            self.heads, qkv_features=self.embed, out_features=self.embed,
            dropout_rate=self.dropout, deterministic=not train,
            dtype=self.dtype, name="self_attn")(
                q + query_pos, q + query_pos, q)
        sa = nn.Dropout(self.dropout, deterministic=not train)(sa)
        q = nn.LayerNorm(dtype=jnp.float32, name="norm1")(q + sa)
        ca = MSDeformAttention(self.embed, self.heads, self.points,
                               self.dtype, name="cross_attn")(
                                   q + query_pos, memory_levels, value_valid,
                                   ref_points)
        ca = nn.Dropout(self.dropout, deterministic=not train)(ca)
        q = nn.LayerNorm(dtype=jnp.float32, name="norm2")(q + ca)
        y = FFN(self.ffn_dim, self.embed, self.dropout, self.dtype,
                name="ffn")(q, train)
        return nn.LayerNorm(dtype=jnp.float32, name="norm3")(q + y)


def _split_levels(flat: jnp.ndarray,
                  level_shapes: Sequence[Tuple[int, int]]) -> List[jnp.ndarray]:
    """[B, sum(HW), E] -> per-level [B, Hl, Wl, E] (static shapes)."""
    outs, cur = [], 0
    b, _, e = flat.shape
    for (h, w) in level_shapes:
        outs.append(flat[:, cur:cur + h * w].reshape(b, h, w, e))
        cur += h * w
    return outs


class ChannelMapper(nn.Module):
    """mmdet/models/necks/channel_mapper.py: per-input 1x1 conv + GN(32)
    (act_cfg=None), plus 3x3/2 extra convs on the last input for
    num_outs > len(inputs)."""

    out_channels: int
    num_extra: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        outs = []
        for i, f in enumerate(feats):
            y = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                        dtype=self.dtype, name=f"lateral_{i}")(f)
            y = nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                             name=f"gn_{i}")(y.astype(jnp.float32))
            outs.append(y.astype(self.dtype))
        x = feats[-1]
        for j in range(self.num_extra):
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=True,
                        dtype=self.dtype, name=f"extra_{j}")(x)
            y = nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                             name=f"extra_gn_{j}")(x.astype(jnp.float32))
            outs.append(y.astype(self.dtype))
            x = y.astype(self.dtype)
        return outs


class DeformableDETR(nn.Module):
    """__call__(images, img_shapes) -> (all_cls [L, B, Q, C] f32 sigmoid
    logits, all_box [L, B, Q, 4] f32 sigmoid-normalized cxcywh)."""

    cfg: Any  # DeformableDETRConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, img_shapes: jnp.ndarray,
                 train: bool = False):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        feats = ResNet(block_counts=cfg.block_counts,
                       stem_width=cfg.stem_width, dtype=dtype,
                       name="backbone")(images)
        # C3, C4, C5 + one extra stride-64 level
        levels = ChannelMapper(cfg.embed_dim, num_extra=cfg.num_levels - 3,
                               dtype=dtype, name="neck")(feats[1:4])
        b = images.shape[0]
        canvas_h, canvas_w = images.shape[1], images.shape[2]

        level_shapes = [(f.shape[1], f.shape[2]) for f in levels]
        valid_maps, valid_ratios, pos_flat, feat_flat = [], [], [], []
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (cfg.num_levels, cfg.embed_dim))
        for lvl, f in enumerate(levels):
            fh, fw = f.shape[1], f.shape[2]
            ys = jnp.floor(jnp.arange(fh) * (canvas_h / fh)).astype(jnp.int32)
            xs = jnp.floor(jnp.arange(fw) * (canvas_w / fw)).astype(jnp.int32)
            valid = ((ys[None, :, None] < img_shapes[:, 0][:, None, None])
                     & (xs[None, None, :] < img_shapes[:, 1][:, None, None]))
            valid_maps.append(valid)
            vr_h = valid[:, :, 0].sum(1).astype(jnp.float32) / fh
            vr_w = valid[:, 0, :].sum(1).astype(jnp.float32) / fw
            valid_ratios.append(jnp.stack([vr_w, vr_h], axis=-1))
            pos = sine_positional_encoding(valid, cfg.embed_dim // 2,
                                           offset=cfg.pe_offset)
            pos = pos.reshape(b, fh * fw, cfg.embed_dim) \
                + level_embed[lvl][None, None]
            pos_flat.append(pos.astype(dtype))
            feat_flat.append(f.reshape(b, fh * fw, cfg.embed_dim))
        valid_ratios = jnp.stack(valid_ratios, axis=1)  # [B, L, 2]
        x = jnp.concatenate(feat_flat, axis=1)
        pos = jnp.concatenate(pos_flat, axis=1)

        enc_ref = encoder_reference_points(level_shapes, valid_ratios)
        for li in range(cfg.num_encoder_layers):
            x = DeformableEncoderLayer(
                cfg.embed_dim, cfg.num_heads, cfg.num_points, cfg.ffn_dim,
                cfg.dropout, dtype, name=f"encoder_{li}")(
                    x, pos, level_shapes, valid_maps, enc_ref, train)

        # decoder: learned (query_pos, query) pairs + Linear reference
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (cfg.num_queries, cfg.embed_dim * 2))
        query_pos = jnp.broadcast_to(
            query_embed[None, :, :cfg.embed_dim],
            (b, cfg.num_queries, cfg.embed_dim)).astype(dtype)
        q = jnp.broadcast_to(
            query_embed[None, :, cfg.embed_dim:],
            (b, cfg.num_queries, cfg.embed_dim)).astype(dtype)
        ref = jax.nn.sigmoid(nn.Dense(2, dtype=jnp.float32,
                                      name="reference_points")(
                                          query_pos.astype(jnp.float32)))

        memory_levels = _split_levels(x, level_shapes)
        # [B, Q, L, 2]: 2-d reference scaled into each level's valid box
        dec_ref = ref[:, :, None, :] * valid_ratios[:, None]
        intermediates = []
        for li in range(cfg.num_decoder_layers):
            q = DeformableDecoderLayer(
                cfg.embed_dim, cfg.num_heads, cfg.num_points, cfg.ffn_dim,
                cfg.dropout, dtype, name=f"decoder_{li}")(
                    q, query_pos, memory_levels, valid_maps, dec_ref, train)
            intermediates.append(q.astype(jnp.float32))
        outs = jnp.stack(intermediates)  # [L, B, Q, E] f32

        # shared branches (with_box_refine=False -> the head's ModuleList
        # entries alias one module, deformable_detr_head.py)
        cls_logits = nn.Dense(cfg.num_classes, name="fc_cls")(outs)
        y = outs
        for fi in range(cfg.num_reg_fcs):
            y = nn.relu(nn.Dense(cfg.embed_dim, name=f"reg_ffn_{fi}")(y))
        tmp = nn.Dense(4, name="fc_reg")(y)  # [L, B, Q, 4]
        ref_logit = inverse_sigmoid(ref)[None]  # same init ref every layer
        boxes = jax.nn.sigmoid(
            jnp.concatenate([tmp[..., :2] + ref_logit, tmp[..., 2:]], axis=-1))
        return cls_logits.astype(jnp.float32), boxes.astype(jnp.float32)


def build_deformable_detr(cfg) -> DeformableDETR:
    return DeformableDETR(cfg=cfg)


def init_deformable_detr(cfg, rng: jax.Array):
    model = build_deformable_detr(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    shapes = jnp.asarray([[h, w]], jnp.int32)
    variables = jax.jit(model.init, static_argnums=3)(rng, dummy, shapes, False)
    return model, variables
