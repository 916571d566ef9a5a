"""Flip-consistency self-supervision (the SelfSSL_* detector family).

Behavioral parity targets (reference, /root/reference):
* mmdet/models/detectors/SelfSSL_single_stage.py:55-69 (forward_train:
  a second feature extraction on kwargs['flipImg'], routed into the
  head as x_flip)
* mmdet/models/dense_heads/old_codes/SelfSSL_EDL_RetinaSoft.py:93-103
  (forward_train_SelfSSL) and :197-214 (the consistency loss: per
  level, flip the flipped image's score map back along W, then
  loss_Self_cls = sum((softmax(cls) - softmax(clsFlip))^2); the
  reg-consistency term loss_Self_reg is computed but DISCARDED — the
  reference overwrites loss_cls with loss_Self_cls and zeroes
  loss_bbox, :212-214)

Status in the reference: the SelfSSL_* detectors are registered but no
live config instantiates them, and the only head implementing
forward_train_SelfSSL lives in dense_heads/old_codes/ (dead code by the
reference's own layout). The rebuild ships the semantics as a
composable loss term rather than a detector subclass: TPU-side it is
one extra forward on jnp.flip(images, axis=2) inside the same jit — no
runner machinery needed.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


def flip_level_maps_w(
    flat: jnp.ndarray,
    featmap_sizes: Sequence[Tuple[int, int]],
    num_anchors: int,
) -> jnp.ndarray:
    """Flip a flattened [B, A, C] multi-level head output along each
    level's W axis (torch.flip(score_map, [3]) on the [B, C, H, W] maps,
    SelfSSL_EDL_RetinaSoft.py:199/:208), preserving the (H, W, anchor)-
    major flattening order the heads emit."""
    b, _, c = flat.shape
    out, off = [], 0
    for (h, w) in featmap_sizes:
        n = h * w * num_anchors
        lvl = flat[:, off:off + n].reshape(b, h, w, num_anchors, c)
        out.append(jnp.flip(lvl, axis=2).reshape(b, n, c))
        off += n
    return jnp.concatenate(out, axis=1)


def self_ssl_consistency_loss(
    cls_scores: jnp.ndarray,
    cls_scores_flip: jnp.ndarray,
    featmap_sizes: Sequence[Tuple[int, int]],
    num_anchors: int,
) -> jnp.ndarray:
    """loss_Self_cls: sum over every (anchor, class) site of the squared
    softmax difference between the image's scores and the horizontally-
    flipped image's scores mirrored back (SelfSSL_EDL_RetinaSoft.py:
    203-206; the maxconf weighting on :205 is commented out in the
    reference and omitted here)."""
    back = flip_level_maps_w(cls_scores_flip, featmap_sizes, num_anchors)
    p = jax.nn.softmax(cls_scores, axis=-1)
    q = jax.nn.softmax(back, axis=-1)
    return jnp.square(p - q).sum()


def make_self_ssl_loss_fn(model, cfg) -> Callable:
    """(variables, images) -> scalar flip-consistency loss, replicating
    the SelfSSL loss routing: loss_cls := loss_Self_cls, loss_bbox := 0
    (SelfSSL_EDL_RetinaSoft.py:212-214). `images` are normalized
    [B, H, W, 3] canvases; the flipped branch is jnp.flip along W
    (DataContainer flipImg in the reference's intended pipeline)."""
    feats = cfg.featmap_sizes()
    num_anchors = cfg.anchor.num_anchors

    def loss_fn(variables, images):
        cls, _bbox, _lam = model.apply(variables, images, with_meh=False)
        cls_f, _bf, _lf = model.apply(
            variables, jnp.flip(images, axis=2), with_meh=False)
        return self_ssl_consistency_loss(cls, cls_f, feats, num_anchors)

    return loss_fn
