"""GeneralizedAttention (Flax) — the four-term spatial attention of
"An Empirical Study of Spatial Attention Mechanisms in Deep Networks"
(Zhu et al., ICCV 2019), used by two reference config families:

* configs/empirical_attention/faster_rcnn_r50_fpn_attention_{0010,1111}
  _1x_coco.py — plugged into backbone stages c4-c5 after conv2
  (plugins=[dict(cfg=dict(type='GeneralizedAttention', spatial_range=-1,
  num_heads=8, attention_type='0010'|'1111', kv_stride=2), stages=
  (False, False, True, True), position='after_conv2')]).
* configs/groie/*.py — the post-processing module of the
  GenericRoIExtractor (attention_type='0100', num_heads=6, kv_stride=2).

The kernel lives in mmcv (cnn/bricks/generalized_attention.py), not
in-tree; re-derived here from the paper's energy decomposition:

  E(q, k) = [1] <W_q x_q, W_k x_k>     (query content & key content)
          + [2] <W_q x_q, W_g r_qk>    (query content & relative position)
          + [3] <u,       W_k x_k>     (bias & key content)
          + [4] <v,       W_g r_qk>    (bias & relative position)

with attention_type a 4-char '0'/'1' mask over the terms, r_qk a
sinusoidal embedding of the relative (dx, dy) projected per head
(separable x/y halves — the mmcv appr_geom_fc_x/y factorization), keys
subsampled by kv_stride (avg pool), softmax over keys, a 1x1 value/proj
pair, and a ZERO-INIT gamma residual scale — the block is the identity
at init (testable invariant).

TPU notes: the position terms assemble as broadcast adds of factored
[Nq, Nkx] / [Nq, Nky] energies (never a [Nq, Nk, d] tensor); everything
else is batched matmuls on the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _sin_embed(rel: np.ndarray, dim: int) -> np.ndarray:
    """Sinusoidal embedding of integer relative offsets [-R..R] -> [N, dim]."""
    assert dim % 2 == 0
    freq = np.power(100.0, -np.arange(dim // 2) / max(dim // 2 - 1, 1))
    ang = rel[:, None] * freq[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1).astype(np.float32)


class GeneralizedAttention(nn.Module):
    num_heads: int = 8
    attention_type: str = "1111"
    kv_stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, h, w, c = x.shape
        nh = self.num_heads
        d = max(c // nh, 4)
        at = [t == "1" for t in self.attention_type]
        scale = 1.0 / np.sqrt(d)

        xk = x
        if self.kv_stride > 1:
            s = self.kv_stride
            xk = nn.avg_pool(x, (s, s), strides=(s, s))
        hk, wk = xk.shape[1:3]
        nq, nk = h * w, hk * wk

        def heads(v, name):
            y = nn.Conv(nh * d, (1, 1), use_bias=False, dtype=self.dtype,
                        name=name)(v)
            return y.reshape(v.shape[0], -1, nh, d).transpose(0, 2, 1, 3)

        energy = jnp.zeros((b, nh, nq, nk), self.dtype)
        q_c = heads(x, "query_conv") if (at[0] or at[1]) else None

        if at[0] or at[2]:
            k_c = heads(xk, "key_conv")
            if at[0]:
                energy = energy + jnp.einsum(
                    "bhqd,bhkd->bhqk", q_c, k_c) * scale
            if at[2]:
                u = self.param("key_bias", nn.initializers.zeros, (nh, d),
                               jnp.float32)
                energy = energy + jnp.einsum(
                    "hd,bhkd->bhk", u.astype(self.dtype), k_c)[:, :, None, :]

        if at[1] or at[3]:
            # separable relative-position embeddings, projected per head
            # (appr_geom_fc_x/y)
            relx = np.arange(-(w - 1), (wk - 1) * self.kv_stride + 1)
            rely = np.arange(-(h - 1), (hk - 1) * self.kv_stride + 1)
            ex = nn.Dense(nh * d, use_bias=False, dtype=self.dtype,
                          name="geom_fc_x")(
                jnp.asarray(_sin_embed(relx, min(d, 32) * 2)))
            ey = nn.Dense(nh * d, use_bias=False, dtype=self.dtype,
                          name="geom_fc_y")(
                jnp.asarray(_sin_embed(rely, min(d, 32) * 2)))
            ex = ex.reshape(-1, nh, d)   # [RX, nh, d]
            ey = ey.reshape(-1, nh, d)
            # index tables: rel index of (qx, kx)
            qx = np.arange(w)
            kx = np.arange(wk) * self.kv_stride
            ix = (kx[None, :] - qx[:, None]) + (w - 1)      # [w, wk]
            qy = np.arange(h)
            ky = np.arange(hk) * self.kv_stride
            iy = (ky[None, :] - qy[:, None]) + (h - 1)      # [h, hk]
            ex_t = ex[jnp.asarray(ix)]                       # [w, wk, nh, d]
            ey_t = ey[jnp.asarray(iy)]                       # [h, hk, nh, d]

            if at[1]:
                qm = q_c.reshape(b, nh, h, w, d)
                e_x = jnp.einsum("bhywd,wkhd->bhywk", qm,
                                 ex_t) * scale               # [b,nh,h,w,wk]
                e_y = jnp.einsum("bhywd,ykhd->bhywk", qm,
                                 ey_t) * scale               # [b,nh,h,w,hk]
                e2 = (e_x[:, :, :, :, None, :]
                      + e_y[:, :, :, :, :, None])            # [b,nh,h,w,hk,wk]
                energy = energy + e2.reshape(b, nh, nq, nk)
            if at[3]:
                v_b = self.param("geom_bias", nn.initializers.zeros,
                                 (nh, d), jnp.float32).astype(self.dtype)
                bx = jnp.einsum("hd,wkhd->hwk", v_b, ex_t)   # [nh, w, wk]
                by = jnp.einsum("hd,ykhd->hyk", v_b, ey_t)   # [nh, h, hk]
                e4 = (bx[:, None, :, None, :]
                      + by[:, :, None, :, None])             # [nh,h,w,hk,wk]
                energy = energy + e4.reshape(1, nh, nq, nk)

        attn = jax.nn.softmax(energy.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
        v_c = heads(xk, "value_conv")
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v_c)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, nh * d)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_conv")(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return x + gamma.astype(x.dtype) * out
