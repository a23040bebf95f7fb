"""Box decode, clipping, and IoU primitives (pure jnp, fixed shapes).

Decode matches YetAnotherEfficientDetBBoxTransform (reference
src/YetAnotherEfficientDet.py:574-602): anchors [y1,x1,y2,x2] + regression
deltas (dy, dx, dh, dw) -> boxes [xmin, ymin, xmax, ymax]; clip matches
ClipBoxes in src/utils/utils.py:123-141 (xmin/ymin >= 0, xmax/ymax <=
image_size).
"""
from __future__ import annotations

import jax.numpy as jnp


def decode_boxes(anchors: jnp.ndarray, regression: jnp.ndarray) -> jnp.ndarray:
    """anchors (..., N, 4) [y1,x1,y2,x2]; regression (..., N, 4) (dy,dx,dh,dw)
    -> (..., N, 4) [xmin, ymin, xmax, ymax]."""
    y_ctr_a = (anchors[..., 0] + anchors[..., 2]) / 2
    x_ctr_a = (anchors[..., 1] + anchors[..., 3]) / 2
    ha = anchors[..., 2] - anchors[..., 0]
    wa = anchors[..., 3] - anchors[..., 1]

    w = jnp.exp(regression[..., 3]) * wa
    h = jnp.exp(regression[..., 2]) * ha
    y_ctr = regression[..., 0] * ha + y_ctr_a
    x_ctr = regression[..., 1] * wa + x_ctr_a

    return jnp.stack([x_ctr - w / 2., y_ctr - h / 2.,
                      x_ctr + w / 2., y_ctr + h / 2.], axis=-1)


def clip_boxes(boxes: jnp.ndarray, image_size: float) -> jnp.ndarray:
    """Clip xyxy boxes to [0, image_size] (reference src/utils/utils.py:134-141
    clamps mins at 0 and maxes at image_size)."""
    lo = jnp.zeros((), boxes.dtype)
    hi = jnp.asarray(image_size, boxes.dtype)
    return jnp.stack([
        jnp.clip(boxes[..., 0], min=lo),
        jnp.clip(boxes[..., 1], min=lo),
        jnp.clip(boxes[..., 2], max=hi),
        jnp.clip(boxes[..., 3], max=hi),
    ], axis=-1)


def pairwise_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between xyxy boxes a (N,4) and b (M,4) -> (N,M)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.clip(union, min=1e-8)


def iou_anchors_vs_gt(anchors_yxyx: jnp.ndarray, gt_xyxy: jnp.ndarray
                      ) -> jnp.ndarray:
    """IoU between anchors in [y1,x1,y2,x2] and gt boxes in [x1,y1,x2,y2]
    -> (N_anchors, N_gt). Matches calc_iou in reference
    src/loss/YetAnotherFocalLoss.py:6-20 (union clamped at 1e-8)."""
    a = anchors_yxyx
    b = gt_xyxy
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    iw = jnp.minimum(a[:, 3, None], b[None, :, 2]) - \
        jnp.maximum(a[:, 1, None], b[None, :, 0])
    ih = jnp.minimum(a[:, 2, None], b[None, :, 3]) - \
        jnp.maximum(a[:, 0, None], b[None, :, 1])
    iw = jnp.clip(iw, min=0)
    ih = jnp.clip(ih, min=0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    union = jnp.clip(area_a[:, None] + area_b[None, :] - iw * ih, min=1e-8)
    return iw * ih / union
