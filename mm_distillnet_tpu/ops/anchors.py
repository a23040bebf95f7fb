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
