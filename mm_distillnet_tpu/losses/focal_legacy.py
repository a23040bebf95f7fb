"""Legacy focal-loss variant (reference src/loss/FocalLoss.py:41-179).

Differences from the active YetAnotherFocalLoss: anchors are consumed in
[x1, y1, x2, y2] layout, regression targets are (dx, dy, dw, dh) normalized
by the std table [0.1, 0.1, 0.2, 0.2], and the call returns
(loss, regression_loss, classification_loss). Kept for capability parity;
the shipped recipe uses losses.focal.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import pairwise_iou_xyxy

ALPHA, GAMMA = 0.25, 2.0
STD = jnp.asarray([0.1, 0.1, 0.2, 0.2])


def _per_image(classification, regression, annotations, anchors):
    num_classes = classification.shape[-1]
    gt_valid = annotations[:, 4] != -1
    n_gt = jnp.sum(gt_valid)
    cls = jnp.clip(classification, 1e-4, 1.0 - 1e-4)

    neg_only = jnp.sum((1.0 - ALPHA) * jnp.power(cls, GAMMA) *
                       (-jnp.log(1.0 - cls)))

    iou = pairwise_iou_xyxy(anchors, annotations[:, :4])
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    iou_max = jnp.max(iou, axis=1)
    assigned = annotations[jnp.argmax(iou, axis=1)]
    positive = iou_max >= 0.5
    negative = iou_max < 0.4
    num_pos = jnp.sum(positive)

    labels = jnp.clip(assigned[:, 4].astype(jnp.int32), 0, num_classes - 1)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=cls.dtype)
    targets = jnp.where(positive[:, None], one_hot, 0.0)
    care = (positive | negative)[:, None]
    af = jnp.where(targets == 1.0, ALPHA, 1.0 - ALPHA)
    fw = jnp.where(targets == 1.0, 1.0 - cls, cls)
    bce = -(targets * jnp.log(cls) + (1.0 - targets) * jnp.log(1.0 - cls))
    cls_loss = jnp.sum(jnp.where(care, af * jnp.power(fw, GAMMA) * bce, 0.0))
    cls_loss = cls_loss / jnp.clip(num_pos.astype(cls.dtype), min=1.0)

    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    gw = jnp.clip(assigned[:, 2] - assigned[:, 0], min=1.0)
    gh = jnp.clip(assigned[:, 3] - assigned[:, 1], min=1.0)
    gcx = assigned[:, 0] + 0.5 * (assigned[:, 2] - assigned[:, 0])
    gcy = assigned[:, 1] + 0.5 * (assigned[:, 3] - assigned[:, 1])
    t = jnp.stack([(gcx - acx) / aw, (gcy - acy) / ah,
                   jnp.log(gw / aw), jnp.log(gh / ah)], axis=1) / STD
    diff = jnp.abs(t - regression)
    rl = jnp.where(diff <= 1.0 / 9.0, 0.5 * 9.0 * diff * diff,
                   diff - 0.5 / 9.0)
    reg_loss = jnp.sum(jnp.where(positive[:, None], rl, 0.0)) / \
        jnp.clip(num_pos.astype(cls.dtype) * 4.0, min=1.0)
    reg_loss = jnp.where(num_pos > 0, reg_loss, 0.0)

    has_gt = n_gt > 0
    return (jnp.where(has_gt, reg_loss, 0.0),
            jnp.where(has_gt, cls_loss, neg_only), has_gt)


def focal_loss_legacy(classification, regression, annotations,
                      anchors_xyxy) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
    """Returns (loss, regression_loss, classification_loss)."""
    reg, cls, has = jax.vmap(_per_image, in_axes=(0, 0, 0, None))(
        classification.astype(jnp.float32), regression.astype(jnp.float32),
        annotations.astype(jnp.float32), anchors_xyxy.astype(jnp.float32))
    any_gt = jnp.any(has)
    reg_l = jnp.where(any_gt, jnp.mean(reg), 0.0)
    cls_l = jnp.where(any_gt, jnp.mean(cls), 0.0)
    return reg_l + cls_l, reg_l, cls_l
