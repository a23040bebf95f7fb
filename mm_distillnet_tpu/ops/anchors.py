"""Anchor table generation: precomputed module-level constant.

Matches reference src/YetAnotherEfficientDet.py:71-151 exactly: 5 pyramid
levels (P3..P7, strides 8..128), 3 scales x 3 ratios = 9 anchors per cell,
layout [y1, x1, y2, x2] in input-pixel units, cell-major (row-major y, x),
anchor index = scale*len(ratios) + ratio. For 768x768 the table has 110,484
rows. Built once in numpy (no per-forward work, unlike the reference which
rebuilds on shape change).
"""
from __future__ import annotations

import functools
import itertools
from typing import Sequence, Tuple

import numpy as np

DEFAULT_PYRAMID_LEVELS = (3, 4, 5, 6, 7)
DEFAULT_SCALES = (2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0))
DEFAULT_RATIOS = ((1.0, 1.0), (1.4, 0.7), (0.7, 1.4))


@functools.lru_cache(maxsize=None)
def anchor_table(image_size: int, anchor_scale: float = 4.0,
                 pyramid_levels: Tuple[int, ...] = DEFAULT_PYRAMID_LEVELS,
                 scales: Tuple[float, ...] = DEFAULT_SCALES,
                 ratios: Tuple[Tuple[float, float], ...] = DEFAULT_RATIOS,
                 ) -> np.ndarray:
    """Returns (N, 4) float32 anchors [y1, x1, y2, x2]."""
    strides = [2 ** lvl for lvl in pyramid_levels]
    boxes_all = []
    for stride in strides:
        if image_size % stride != 0:
            raise ValueError('input size must be divided by the stride.')
        boxes_level = []
        for scale, ratio in itertools.product(scales, ratios):
            base = anchor_scale * stride * scale
            ax2 = base * ratio[0] / 2.0
            ay2 = base * ratio[1] / 2.0
            x = np.arange(stride / 2, image_size, stride)
            y = np.arange(stride / 2, image_size, stride)
            xv, yv = np.meshgrid(x, y)
            xv, yv = xv.reshape(-1), yv.reshape(-1)
            boxes = np.stack([yv - ay2, xv - ax2, yv + ay2, xv + ax2], axis=1)
            boxes_level.append(boxes[:, None, :])
        boxes_level = np.concatenate(boxes_level, axis=1)  # (HW, 9, 4)
        boxes_all.append(boxes_level.reshape(-1, 4))
    return np.vstack(boxes_all).astype(np.float32)


def num_anchors(image_size: int,
                pyramid_levels: Sequence[int] = DEFAULT_PYRAMID_LEVELS,
                num_per_cell: int = 9) -> int:
    return sum((image_size // 2 ** lvl) ** 2 * num_per_cell
               for lvl in pyramid_levels)


@functools.lru_cache(maxsize=None)
def anchor_index_tables(image_size: int, anchor_scale: float = 4.0,
                        pyramid_levels: Tuple[int, ...] = DEFAULT_PYRAMID_LEVELS,
                        scales: Tuple[float, ...] = DEFAULT_SCALES,
                        ratios: Tuple[Tuple[float, float], ...] = DEFAULT_RATIOS):
    """Small constant tables for computing anchors FROM flat indices
    (avoids a 110k-row gather on the TPU): per-level (start offset, stride,
    grid width) plus the 9 per-cell half-sizes (ay2, ax2) per level."""
    n_per = len(scales) * len(ratios)
    starts, strides, widths = [], [], []
    half_sizes = []  # (L, 9, 2) = (ay2, ax2)
    off = 0
    for lvl in pyramid_levels:
        stride = 2 ** lvl
        w = image_size // stride
        starts.append(off)
        strides.append(stride)
        widths.append(w)
        sizes = []
        for scale in scales:
            for ratio in ratios:
                base = anchor_scale * stride * scale
                sizes.append((base * ratio[1] / 2.0, base * ratio[0] / 2.0))
        half_sizes.append(sizes)
        off += w * w * n_per
    return (np.asarray(starts, np.int32), np.asarray(strides, np.float32),
            np.asarray(widths, np.int32),
            np.asarray(half_sizes, np.float32), n_per)


def anchors_from_indices(idx, image_size: int, anchor_scale: float = 4.0):
    """Compute [y1, x1, y2, x2] anchors for flat anchor indices `idx`
    (any shape, int32) with pure vector math — no table gather over the
    110k-row anchor array. Matches anchor_table() exactly."""
    import jax.numpy as jnp

    starts, strides, widths, half_sizes, n_per = anchor_index_tables(
        image_size, anchor_scale)
    starts_j = jnp.asarray(starts)
    strides_j = jnp.asarray(strides)
    widths_j = jnp.asarray(widths)
    hs = jnp.asarray(half_sizes)          # (L, 9, 2)

    idx = idx.astype(jnp.int32)
    # level = number of starts <= idx, minus 1
    level = jnp.sum(idx[..., None] >= starts_j, axis=-1) - 1
    local = idx - starts_j[level]
    cell = local // n_per
    k = local - cell * n_per
    w = widths_j[level]
    cy = (cell // w).astype(jnp.float32)
    cx = (cell - (cell // w) * w).astype(jnp.float32)
    stride = strides_j[level]
    yc = (cy + 0.5) * stride
    xc = (cx + 0.5) * stride
    sz = hs[level, k]                      # (..., 2) = (ay2, ax2)
    ay2, ax2 = sz[..., 0], sz[..., 1]
    return jnp.stack([yc - ay2, xc - ax2, yc + ay2, xc + ax2], axis=-1)
