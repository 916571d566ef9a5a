"""DETR: ResNet-50 C5 + transformer encoder/decoder + set-prediction
head (Flax).

Behavioral parity targets (reference, /root/reference):
* configs/detr/detr_r50_8x2_150e_coco.py — R50 (out C5 only,
  frozen_stages=1, frozen BN), 6 encoder + 6 decoder layers, embed 256,
  8 heads, FFN 2048, dropout 0.1, 100 learned queries, sine positional
  encoding (num_feats=128, normalize=True).
* mmdet/models/dense_heads/detr_head.py:200-265 — input_proj 1x1 conv,
  padding mask downsampled to the feature grid, fc_cls to C+1 logits
  (softmax CE w/ background), reg FFN (2 hidden ReLU Linears) + fc_reg
  -> sigmoid normalized (cx, cy, w, h); every decoder layer's output is
  decoded (auxiliary losses).
* mmdet/models/utils/positional_encoding.py:10-87 — cumsum-normalized
  sine embedding, temperature 10000, scale 2*pi, y-channels first.
* mmdet/models/utils/transformer.py — post-norm layers: encoder
  (self_attn, norm, ffn, norm) with pos added to q/k; decoder
  (self_attn, norm, cross_attn, norm, ffn, norm) with query_pos on q/k
  of self-attn, query_pos on q / pos on k of cross-attn; decoder
  intermediates each pass the shared final LayerNorm.

Deviation (documented): dropout placement inside attention follows
flax's MultiHeadDotProductAttention (weights dropout) + explicit
residual/FFN dropouts — same rate and sites as torch up to the
attention-internal topology, which only matters stochastically.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNet


def sine_positional_encoding(valid_mask: jnp.ndarray, num_feats: int = 128,
                             temperature: float = 10000.0,
                             scale: float = 2 * math.pi,
                             eps: float = 1e-6,
                             offset: float = 0.0) -> jnp.ndarray:
    """[B, H, W] bool (True = valid pixel) -> [B, H, W, 2*num_feats].

    positional_encoding.py:55-87 with normalize=True; channel layout
    (y-sin/cos interleaved, then x) matches the reference cat order.
    offset=-0.5 is the Deformable DETR variant (its config).
    """
    not_mask = valid_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
    x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
    i = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(i / 2.0) / num_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t

    def interleave(p):
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                         axis=-1).reshape(p.shape)

    return jnp.concatenate([interleave(pos_y), interleave(pos_x)], axis=-1)


class FFN(nn.Module):
    """Linear -> ReLU -> drop -> Linear -> drop, residual outside."""

    hidden: int
    out: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.out, dtype=self.dtype, name="fc2")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class EncoderLayer(nn.Module):
    embed: int
    heads: int
    ffn_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, key_mask, train: bool):
        q = k = x + pos
        attn = nn.MultiHeadDotProductAttention(
            self.heads, qkv_features=self.embed, out_features=self.embed,
            dropout_rate=self.dropout, deterministic=not train,
            dtype=self.dtype, name="self_attn")(q, k, x, mask=key_mask)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x + attn)
        y = FFN(self.ffn_dim, self.embed, self.dropout, self.dtype,
                name="ffn")(x, train)
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + y)


class DecoderLayer(nn.Module):
    embed: int
    heads: int
    ffn_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, query_pos, memory, pos, key_mask, train: bool):
        sa = nn.MultiHeadDotProductAttention(
            self.heads, qkv_features=self.embed, out_features=self.embed,
            dropout_rate=self.dropout, deterministic=not train,
            dtype=self.dtype, name="self_attn")(
                q + query_pos, q + query_pos, q)
        sa = nn.Dropout(self.dropout, deterministic=not train)(sa)
        q = nn.LayerNorm(dtype=jnp.float32, name="norm1")(q + sa)
        ca = nn.MultiHeadDotProductAttention(
            self.heads, qkv_features=self.embed, out_features=self.embed,
            dropout_rate=self.dropout, deterministic=not train,
            dtype=self.dtype, name="cross_attn")(
                q + query_pos, memory + pos, memory, mask=key_mask)
        ca = nn.Dropout(self.dropout, deterministic=not train)(ca)
        q = nn.LayerNorm(dtype=jnp.float32, name="norm2")(q + ca)
        y = FFN(self.ffn_dim, self.embed, self.dropout, self.dtype,
                name="ffn")(q, train)
        return nn.LayerNorm(dtype=jnp.float32, name="norm3")(q + y)


class DETR(nn.Module):
    """Full detector. __call__(images, img_shapes) ->
    (all_cls [L, B, Q, C+1] f32 logits, all_box [L, B, Q, 4] f32
    sigmoid-normalized cxcywh), one entry per decoder layer."""

    cfg: Any  # DETRConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, img_shapes: jnp.ndarray,
                 train: bool = False):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        feats = ResNet(block_counts=cfg.block_counts,
                       stem_width=cfg.stem_width, dtype=dtype,
                       name="backbone")(images)
        x = feats[-1]  # C5, stride 32
        b, fh, fw, _ = x.shape
        x = nn.Conv(cfg.embed_dim, (1, 1), dtype=dtype, name="input_proj")(x)

        # padding mask at the feature grid (detr_head.py:245-253 nearest
        # interpolation of the full-res mask)
        canvas_h, canvas_w = images.shape[1], images.shape[2]
        ys = jnp.floor(jnp.arange(fh) * (canvas_h / fh)).astype(jnp.int32)
        xs = jnp.floor(jnp.arange(fw) * (canvas_w / fw)).astype(jnp.int32)
        valid = ((ys[None, :, None] < img_shapes[:, 0][:, None, None])
                 & (xs[None, None, :] < img_shapes[:, 1][:, None, None]))
        pos = sine_positional_encoding(valid, cfg.embed_dim // 2)

        hw = fh * fw
        x = x.reshape(b, hw, cfg.embed_dim).astype(dtype)
        pos = pos.reshape(b, hw, cfg.embed_dim).astype(dtype)
        # attention mask [B, 1, Lq, Lkv] (True = may attend)
        key_ok = valid.reshape(b, hw)
        enc_mask = key_ok[:, None, None, :]

        for li in range(cfg.num_encoder_layers):
            x = EncoderLayer(cfg.embed_dim, cfg.num_heads, cfg.ffn_dim,
                             cfg.dropout, dtype, name=f"encoder_{li}")(
                                 x, pos, enc_mask, train)

        query_pos = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (cfg.num_queries, cfg.embed_dim)).astype(dtype)
        query_pos = jnp.broadcast_to(query_pos[None],
                                     (b,) + query_pos.shape)
        q = jnp.zeros_like(query_pos)
        post_norm = nn.LayerNorm(dtype=jnp.float32, name="post_norm")
        intermediates = []
        for li in range(cfg.num_decoder_layers):
            q = DecoderLayer(cfg.embed_dim, cfg.num_heads, cfg.ffn_dim,
                             cfg.dropout, dtype, name=f"decoder_{li}")(
                                 q, query_pos, x, pos, enc_mask, train)
            intermediates.append(post_norm(q.astype(jnp.float32)))
        outs = jnp.stack(intermediates)  # [L, B, Q, E] f32

        cls_logits = nn.Dense(cfg.num_classes + 1, name="fc_cls")(outs)
        y = outs
        for fi in range(cfg.num_reg_fcs):
            y = nn.relu(nn.Dense(cfg.embed_dim, name=f"reg_ffn_{fi}")(y))
        boxes = jax.nn.sigmoid(nn.Dense(4, name="fc_reg")(y))
        return cls_logits.astype(jnp.float32), boxes.astype(jnp.float32)


def build_detr(cfg) -> DETR:
    return DETR(cfg=cfg)


def init_detr(cfg, rng: jax.Array):
    model = build_detr(cfg)
    h, w = cfg.canvas
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    shapes = jnp.asarray([[h, w]], jnp.int32)
    variables = jax.jit(model.init, static_argnums=3)(rng, dummy, shapes, False)
    return model, variables
