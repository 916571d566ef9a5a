"""Anchor generation for Retina-style octave anchors and SSD anchors.

Behavioral parity targets (reference, /root/reference):
* mmdet/core/anchor/anchor_generator.py:12 (AnchorGenerator: octave scales,
  center_offset=0, ratio-major base-anchor ordering, row-major grid)
* mmdet/core/anchor/anchor_generator.py:460 (SSDAnchorGenerator: min/max
  size schedule from basesize_ratio_range, scale_major=False plus the
  [0, A, 1, 2, ...] index reorder, centers at stride/2)
* mmdet/core/anchor/anchor_generator.py:382 (valid_flags)

Anchors for a fixed canvas are computed once on the host with numpy and
baked into the jit'd programs as constants — there is nothing dynamic
about them under the static-shape design.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _base_anchors(
    base_size: float,
    scales: np.ndarray,
    ratios: np.ndarray,
    center: Tuple[float, float],
    scale_major: bool,
) -> np.ndarray:
    """Base anchors [num_ratios*num_scales, 4] around `center`.

    scale_major=True: ratio-major ordering (all scales of ratio 0 first) —
    matches the reference's `(w * w_ratios[:, None] * scales[None, :])`.
    scale_major=False: scale-major ordering (used by SSD).
    """
    w = h = float(base_size)
    x_c, y_c = center
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    if scale_major:
        ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
    else:
        ws = (w * scales[:, None] * w_ratios[None, :]).reshape(-1)
        hs = (h * scales[:, None] * h_ratios[None, :]).reshape(-1)
    return np.stack(
        [x_c - 0.5 * ws, y_c - 0.5 * hs, x_c + 0.5 * ws, y_c + 0.5 * hs],
        axis=-1,
    ).astype(np.float32)


def _grid_anchors(base: np.ndarray, feat_size: Tuple[int, int], stride: Tuple[int, int]) -> np.ndarray:
    """Tile base anchors over a feature grid; row-major cells, anchor-minor.

    Output [H*W*A, 4]: the first A rows are the anchors of cell (0, 0),
    then (0, 1), ... — matching the layout a conv head's
    [B, H, W, A*C] -> [B, H*W*A, C] reshape implies.
    """
    feat_h, feat_w = feat_size
    stride_w, stride_h = stride
    shift_x = np.arange(feat_w, dtype=np.float32) * stride_w
    shift_y = np.arange(feat_h, dtype=np.float32) * stride_h
    xx = np.tile(shift_x, feat_h)
    yy = np.repeat(shift_y, feat_w)
    shifts = np.stack([xx, yy, xx, yy], axis=-1)
    return (base[None, :, :] + shifts[:, None, :]).reshape(-1, 4)


def _valid_flags(
    feat_size: Tuple[int, int],
    stride: Tuple[int, int],
    valid_shape: Tuple[int, int],
    num_base_anchors: int,
) -> np.ndarray:
    """Per-anchor validity for an image padded to `valid_shape` (h, w).

    Mirrors single_level_valid_flags: a grid cell is valid iff its index is
    below ceil(valid_extent / stride), expanded to all anchors of the cell.
    """
    feat_h, feat_w = feat_size
    valid_h = min(int(math.ceil(valid_shape[0] / stride[1])), feat_h)
    valid_w = min(int(math.ceil(valid_shape[1] / stride[0])), feat_w)
    vx = np.zeros(feat_w, dtype=bool)
    vx[:valid_w] = True
    vy = np.zeros(feat_h, dtype=bool)
    vy[:valid_h] = True
    valid = np.tile(vx, feat_h) & np.repeat(vy, feat_w)
    return np.repeat(valid, num_base_anchors)


@dataclass
class AnchorGenerator:
    """Octave anchor generator (RetinaNet family).

    scales = octave_base_scale * 2**(i / scales_per_octave); base size of
    each level is its stride; anchor centers sit at stride * cell_index
    (center_offset = 0).
    """

    strides: Sequence[int] = (8, 16, 32, 64, 128)
    ratios: Sequence[float] = (0.5, 1.0, 2.0)
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    scale_major: bool = True
    center_offset: float = 0.0
    # explicit scale list (YOLOF-style `scales=[1, 2, 4, 8, 16]`);
    # None derives the octave schedule (RetinaNet family)
    scales: Optional[Sequence[float]] = None
    # explicit per-level base sizes (YOLACT's base_sizes=[8..128] with
    # strides that differ from them); None = the stride (mmdet default)
    base_sizes: Optional[Sequence[int]] = None

    def __post_init__(self):
        self.strides = [(s, s) if isinstance(s, int) else tuple(s) for s in self.strides]
        if self.scales is not None:
            self.scales = np.asarray(self.scales, dtype=np.float32)
        else:
            self.scales = np.array(
                [self.octave_base_scale * 2 ** (i / self.scales_per_octave) for i in range(self.scales_per_octave)],
                dtype=np.float32,
            )
        self._ratios = np.asarray(self.ratios, dtype=np.float32)
        self.base_anchors: List[np.ndarray] = []
        for li, (sw, sh) in enumerate(self.strides):
            base_size = (min(sw, sh) if self.base_sizes is None
                         else self.base_sizes[li])
            stride_ref = min(sw, sh)  # centers anchor at offset * STRIDE
            center = (self.center_offset * stride_ref,
                      self.center_offset * stride_ref)
            self.base_anchors.append(
                _base_anchors(base_size, self.scales, self._ratios, center, self.scale_major)
            )

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [b.shape[0] for b in self.base_anchors]

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        return [
            _grid_anchors(self.base_anchors[i], featmap_sizes[i], self.strides[i])
            for i in range(self.num_levels)
        ]

    def valid_flags(
        self, featmap_sizes: Sequence[Tuple[int, int]], pad_shape: Tuple[int, int]
    ) -> List[np.ndarray]:
        return [
            _valid_flags(featmap_sizes[i], self.strides[i], pad_shape, self.num_base_anchors[i])
            for i in range(self.num_levels)
        ]


@dataclass
class SSDAnchorGenerator:
    """SSD anchor generator (heterogeneous anchors per level).

    The min/max size schedule follows the reference: ratio range scanned in
    integer percent steps over (num_levels - 2) intervals, with the first
    level's sizes special-cased by (input_size, basesize_ratio_range[0]).
    Per level: [min-square, sqrt(min*max)-square, ratio anchors at scale 1].
    """

    strides: Sequence[int] = (8, 16, 32, 64, 100, 300)
    ratios: Sequence[Sequence[float]] = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))
    basesize_ratio_range: Tuple[float, float] = (0.15, 0.9)
    input_size: int = 300
    scale_major: bool = False

    def __post_init__(self):
        self.strides = [(s, s) if isinstance(s, int) else tuple(s) for s in self.strides]
        self.centers = [(sw / 2.0, sh / 2.0) for (sw, sh) in self.strides]

        min_ratio = int(self.basesize_ratio_range[0] * 100)
        max_ratio = int(self.basesize_ratio_range[1] * 100)
        step = int(np.floor(max_ratio - min_ratio) / (self.num_levels - 2))
        min_sizes, max_sizes = [], []
        for ratio in range(min_ratio, max_ratio + 1, step):
            min_sizes.append(int(self.input_size * ratio / 100))
            max_sizes.append(int(self.input_size * (ratio + step) / 100))
        if self.input_size == 300:
            if self.basesize_ratio_range[0] == 0.15:
                min_sizes.insert(0, int(self.input_size * 7 / 100))
                max_sizes.insert(0, int(self.input_size * 15 / 100))
            elif self.basesize_ratio_range[0] == 0.2:
                min_sizes.insert(0, int(self.input_size * 10 / 100))
                max_sizes.insert(0, int(self.input_size * 20 / 100))
            else:
                raise ValueError("basesize_ratio_range[0] must be 0.15 or 0.2 for input 300")
        elif self.input_size == 512:
            if self.basesize_ratio_range[0] == 0.1:
                min_sizes.insert(0, int(self.input_size * 4 / 100))
                max_sizes.insert(0, int(self.input_size * 10 / 100))
            elif self.basesize_ratio_range[0] == 0.15:
                min_sizes.insert(0, int(self.input_size * 7 / 100))
                max_sizes.insert(0, int(self.input_size * 15 / 100))
            else:
                raise ValueError("basesize_ratio_range[0] must be 0.1 or 0.15 for input 512")
        else:
            raise ValueError("input_size must be 300 or 512")

        self.base_sizes = min_sizes
        self.base_anchors: List[np.ndarray] = []
        for k in range(self.num_levels):
            scales = np.array([1.0, np.sqrt(max_sizes[k] / min_sizes[k])], dtype=np.float32)
            anchor_ratio = [1.0]
            for r in self.ratios[k]:
                anchor_ratio += [1.0 / r, float(r)]
            anchor_ratio = np.asarray(anchor_ratio, dtype=np.float32)
            base = _base_anchors(min_sizes[k], scales, anchor_ratio, self.centers[k], self.scale_major)
            # keep [scale0/ratio1, scale1/ratio1, scale0/other-ratios...]
            indices = list(range(len(anchor_ratio)))
            indices.insert(1, len(indices))
            self.base_anchors.append(base[np.asarray(indices)])

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [b.shape[0] for b in self.base_anchors]

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        return [
            _grid_anchors(self.base_anchors[i], featmap_sizes[i], self.strides[i])
            for i in range(self.num_levels)
        ]

    def valid_flags(
        self, featmap_sizes: Sequence[Tuple[int, int]], pad_shape: Tuple[int, int]
    ) -> List[np.ndarray]:
        return [
            _valid_flags(featmap_sizes[i], self.strides[i], pad_shape, self.num_base_anchors[i])
            for i in range(self.num_levels)
        ]


def anchor_valid_flags(
    generator,
    featmap_sizes: Sequence[Tuple[int, int]],
    pad_shapes: np.ndarray,
) -> np.ndarray:
    """Batch valid flags: pad_shapes [B, 2] (h, w) -> bool [B, total_anchors].

    Host-side helper used by the data loader to precompute per-image anchor
    validity masks (the TPU-side replacement for the reference's
    valid_flags + anchor_inside_flags with allowed_border=-1).
    """
    flags = []
    for hw in np.asarray(pad_shapes):
        per_level = generator.valid_flags(featmap_sizes, (int(hw[0]), int(hw[1])))
        flags.append(np.concatenate(per_level))
    return np.stack(flags)


@dataclass
class YOLOAnchorGenerator:
    """YOLO anchor generator (reference
    mmdet/core/anchor/anchor_generator.py YOLOAnchorGenerator): per-level
    hand-tuned (w, h) base sizes, centers at (cell + 0.5) * stride.
    Level order is coarse-to-fine (strides 32, 16, 8), matching the
    YOLOV3 neck/head output order."""

    base_sizes: Sequence[Sequence[Tuple[int, int]]] = (
        ((116, 90), (156, 198), (373, 326)),
        ((30, 61), (62, 45), (59, 119)),
        ((10, 13), (16, 30), (33, 23)),
    )
    strides: Sequence[int] = (32, 16, 8)

    def __post_init__(self):
        self.strides = [(s, s) if isinstance(s, int) else tuple(s) for s in self.strides]
        self.base_anchors: List[np.ndarray] = []
        for (sw, sh), sizes in zip(self.strides, self.base_sizes):
            cx, cy = 0.5 * sw, 0.5 * sh
            base = np.array(
                [[cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2] for (w, h) in sizes],
                np.float32)
            self.base_anchors.append(base)

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [b.shape[0] for b in self.base_anchors]

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        return [
            _grid_anchors(self.base_anchors[i], featmap_sizes[i], self.strides[i])
            for i in range(self.num_levels)
        ]

    def valid_flags(
        self, featmap_sizes: Sequence[Tuple[int, int]], pad_shape: Tuple[int, int]
    ) -> List[np.ndarray]:
        return [
            _valid_flags(featmap_sizes[i], self.strides[i], pad_shape, self.num_base_anchors[i])
            for i in range(self.num_levels)
        ]
