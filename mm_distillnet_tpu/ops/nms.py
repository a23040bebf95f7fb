"""Fixed-shape on-device NMS (greedy, exact-order), XLA-friendly.

Replaces the torchvision ``nms`` / ``batched_nms`` CUDA ops the reference
depends on (reference src/YetAnotherEfficientDet.py:15-16,
src/utils/utils.py:205, src/optimization/train_methods.py:139-143) with a
dense formulation that lives entirely inside the compiled step: sort by
score, compute the KxK IoU matrix once, then run the sequential greedy
suppression as a lax.fori_loop over rows (each iteration is one (K,) vector
op on the VPU). Selection order matches torchvision exactly for the top-K
candidates.

All shapes are static: callers pass padded candidate sets with a validity
mask and receive `keep` masks / gathered top-`max_out` results.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou_xyxy

NEG_INF = -1e30


def _greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray,
                     iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS over boxes already sorted by descending score.

    iou: (K, K) pairwise IoU; valid: (K,) candidate mask.
    Returns keep mask (K,).
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, keep):
        # If row i is still kept, suppress all later rows overlapping it.
        row_alive = keep[i] & valid[i]
        suppress = (iou[i] > iou_threshold) & (idx > i) & row_alive
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, valid)
    return keep


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
              iou_threshold: float, max_out: int
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Class-agnostic NMS with fixed output size.

    boxes (K,4) xyxy, scores (K,), valid (K,) bool. Returns
    (indices (max_out,), keep_scores (max_out,), out_valid (max_out,)):
    indices into the input arrays, sorted by descending score.
    """
    masked = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked)
    b = boxes[order]
    v = valid[order]
    iou = pairwise_iou_xyxy(b, b)
    keep = _greedy_suppress(iou, v, iou_threshold)

    keep_scores = jnp.where(keep, masked[order], NEG_INF)
    sel = jnp.argsort(-keep_scores)[:max_out]
    out_valid = keep_scores[sel] > NEG_INF / 2
    return order[sel], keep_scores[sel], out_valid


def batched_class_nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray,
                            classes: jnp.ndarray, valid: jnp.ndarray,
                            iou_threshold: float, max_out: int,
                            coord_bound: float
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class NMS via the class-offset trick (same semantics as
    torchvision.ops.batched_nms used at reference src/utils/utils.py:205).

    coord_bound must exceed any box coordinate (e.g. image_size + 1).
    """
    offsets = classes.astype(boxes.dtype)[:, None] * coord_bound
    return nms_fixed(boxes + offsets, scores, valid, iou_threshold, max_out)
