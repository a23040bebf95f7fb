"""Focal detection loss, fully vectorized over the batch (fixed shapes).

Semantics match YetAnotherFocalLoss (reference
src/loss/YetAnotherFocalLoss.py:23-190) exactly, replacing its per-image
Python loop and ragged numpy annotation padding with a dense
(B, MAX_GT, 5) formulation:

- annotations are padded with label -1 rows ([..., 4] == -1 -> padding);
- IoU bands: positive >= 0.5, ignore (0.4, 0.5), negative < 0.4;
- alpha=0.25, gamma=2 focal BCE on sigmoid scores clamped to
  [1e-4, 1-1e-4]; classification sum normalized by clamp(num_pos, 1);
- an image whose annotation set is empty gets the negatives-only
  classification loss (sum over all anchors/classes of
  (1-alpha) * p^gamma * -log(1-p)) and zero regression loss;
- regression: smooth-L1 (beta=1/9) on (dy, dx, dh, dw) targets vs anchors,
  with gt w/h clamped to >= 1, averaged over positive anchors;
- batch reduction: mean over images; if NO image in the batch has any
  annotation, both losses are exactly 0 (the reference skips all images
  when max_num_annots == 0 and returns zeros,
  src/loss/YetAnotherFocalLoss.py:63-66,178-186).

When the caller supplies pre-sigmoid logits (DetectorOutput.logits) the
classification term is computed in logit space via softplus identities —
identical values inside the clamp band at roughly half the transcendental
cost (see _cls_terms).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import iou_anchors_vs_gt

ALPHA = 0.25
GAMMA = 2.0
CLS_CLAMP = 1e-4
# The probability clamp expressed in logit space: sigmoid is monotone, so
# clamp(sigmoid(x), c, 1-c) == sigmoid(clamp(x, -X, X)) with X = logit(1-c).
LOGIT_CLAMP = float(np.log((1.0 - CLS_CLAMP) / CLS_CLAMP))
SMOOTH_L1_BETA = 1.0 / 9.0


def _pow_gamma(x: jnp.ndarray) -> jnp.ndarray:
    """x**GAMMA. jnp.power with a float exponent lowers to exp(g*log(x))
    — two transcendentals per element over (B, N, C); plain multiply for
    the shipped gamma=2."""
    if GAMMA == 2.0:
        return x * x
    return jnp.power(x, GAMMA)


def _smooth_l1(diff: jnp.ndarray) -> jnp.ndarray:
    ad = jnp.abs(diff)
    return jnp.where(ad <= SMOOTH_L1_BETA,
                     0.5 * 9.0 * ad * ad,
                     ad - 0.5 / 9.0)


def _cls_terms(cls_t: jnp.ndarray, from_logits: bool):
    """Elementwise quantities the focal BCE needs: (p, 1-p, -log p,
    -log(1-p)) with p = clamp(sigmoid_score, CLS_CLAMP, 1-CLS_CLAMP).

    from_logits=True computes them from pre-sigmoid scores via the
    softplus identities log(sigmoid(x)) = -softplus(-x) and
    log(1-sigmoid(x)) = -softplus(x): one exp + one log1p per element
    instead of the sigmoid + two logs the probability path costs — the
    train step's dominant transcendental chain (B x 110,484 x C elements;
    reference hot spot src/loss/YetAnotherFocalLoss.py:100-140, measured
    ~27 ms/step at batch 8 in BENCH_NOTES.md round 2). Identical math
    inside the clamp band; 1-p is formed rationally (t/(1+t)), never by
    subtraction, so small probabilities keep full relative precision."""
    if from_logits:
        x = jnp.clip(cls_t, -LOGIT_CLAMP, LOGIT_CLAMP)
        t = jnp.exp(-jnp.abs(x))            # in (0, 1], always stable
        log1p_t = jnp.log1p(t)              # softplus(-|x|)
        s = 1.0 / (1.0 + t)                 # sigmoid(|x|)
        nonneg = x >= 0
        p = jnp.where(nonneg, s, t * s)
        one_m_p = jnp.where(nonneg, t * s, s)
        neg_log_p = jnp.where(nonneg, log1p_t, log1p_t - x)   # softplus(-x)
        neg_log_1mp = neg_log_p + x                            # softplus(x)
        return p, one_m_p, neg_log_p, neg_log_1mp
    p = jnp.clip(cls_t, CLS_CLAMP, 1.0 - CLS_CLAMP)
    return p, 1.0 - p, -jnp.log(p), -jnp.log(1.0 - p)


def _per_image_loss(classification: jnp.ndarray, regression: jnp.ndarray,
                    annotations: jnp.ndarray, anchors: jnp.ndarray,
                    from_logits: bool
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """classification (N, C) sigmoid scores — or pre-sigmoid logits when
    from_logits — regression (N, 4); annotations (MAX_GT, 5)
    [x1,y1,x2,y2,label], label==-1 padding; anchors (N, 4) [y1,x1,y2,x2].
    Returns (reg_loss, cls_loss, has_annotations)."""
    num_classes = classification.shape[-1]
    gt_valid = annotations[:, 4] != -1                      # (G,)
    n_gt = jnp.sum(gt_valid)

    # The classification chain runs in (C, N) orientation so the minor dim
    # (N, a multiple of 128) is lane-padding-free; measured neutral vs
    # (N, C) on v5e — XLA fuses the elementwise chain either way — and
    # kept for layout hygiene.
    p, one_m_p, neg_log_p, neg_log_1mp = _cls_terms(
        classification.T, from_logits)                      # each (C, N)
    # focal BCE per element, by target value (alpha=0.25, gamma=2):
    #   target==1:  alpha     * (1-p)^gamma * -log(p)
    #   target==0:  (1-alpha) *   p^gamma   * -log(1-p)
    pos_term = ALPHA * _pow_gamma(one_m_p) * neg_log_p
    neg_term = (1.0 - ALPHA) * _pow_gamma(p) * neg_log_1mp

    # ---- negatives-only branch (image with no annotations) ----
    neg_only_cls = jnp.sum(neg_term)

    # ---- full branch ----
    iou = iou_anchors_vs_gt(anchors, annotations[:, :4])    # (N, G)
    # Invalid gt rows must never win the argmax: force their IoU to -1.
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    iou_max = jnp.max(iou, axis=1)
    iou_argmax = jnp.argmax(iou, axis=1)

    # Select each anchor's assigned GT row via one-hot matmul, NOT
    # annotations[iou_argmax]: a (N,)-computed-index gather (and its
    # scatter transpose in the backward pass) is ~10x slower on TPU than
    # the (N, G) @ (G, 5) contraction; one_hot lowers to an iota compare,
    # no gather anywhere. Precision.HIGHEST keeps the contraction in full
    # fp32 — at the TPU default (bf16 inputs) the selected GT coordinates
    # would be quantized by up to ~2px at 768px input, silently diverging
    # from the exact gather this replaces; the (N, G) x (G, 5) dot is tiny,
    # so exactness is free.
    assign_oh = jax.nn.one_hot(iou_argmax, annotations.shape[0],
                               dtype=jnp.float32)            # (N, G)
    assigned = jnp.matmul(assign_oh, annotations,
                          precision=jax.lax.Precision.HIGHEST)  # (N, 5)
    positive = iou_max >= 0.5
    negative = iou_max < 0.4
    num_pos = jnp.sum(positive)

    # classification targets: one-hot for positives, zeros for negatives,
    # ignore band contributes nothing. (C, N) orientation; the one-hot is
    # an iota compare (gather-free).
    labels = jnp.clip(assigned[:, 4].astype(jnp.int32), 0, num_classes - 1)
    class_iota = jnp.arange(num_classes, dtype=jnp.int32)[:, None]  # (C, 1)
    target_is_one = positive[None, :] & (labels[None, :] == class_iota)
    care = (positive | negative)[None, :]

    cls_each = jnp.where(target_is_one, pos_term, neg_term)    # (C, N)
    cls_loss_full = jnp.sum(jnp.where(care, cls_each, 0.0))
    cls_loss_full = cls_loss_full / \
        jnp.clip(num_pos.astype(p.dtype), min=1.0)

    # regression targets for positive anchors
    anchor_h = anchors[:, 2] - anchors[:, 0]
    anchor_w = anchors[:, 3] - anchors[:, 1]
    anchor_cy = anchors[:, 0] + 0.5 * anchor_h
    anchor_cx = anchors[:, 1] + 0.5 * anchor_w

    gt_w = jnp.clip(assigned[:, 2] - assigned[:, 0], min=1.0)
    gt_h = jnp.clip(assigned[:, 3] - assigned[:, 1], min=1.0)
    gt_cx = assigned[:, 0] + 0.5 * (assigned[:, 2] - assigned[:, 0])
    gt_cy = assigned[:, 1] + 0.5 * (assigned[:, 3] - assigned[:, 1])

    t_dx = (gt_cx - anchor_cx) / anchor_w
    t_dy = (gt_cy - anchor_cy) / anchor_h
    t_dw = jnp.log(gt_w / anchor_w)
    t_dh = jnp.log(gt_h / anchor_h)
    reg_targets = jnp.stack([t_dy, t_dx, t_dh, t_dw], axis=1)

    reg_loss_each = jnp.sum(_smooth_l1(reg_targets - regression), axis=1) / 4.0
    reg_loss_full = jnp.sum(jnp.where(positive, reg_loss_each, 0.0)) / \
        jnp.clip(num_pos.astype(p.dtype), min=1.0)
    reg_loss_full = jnp.where(num_pos > 0, reg_loss_full, 0.0)

    has_gt = n_gt > 0
    cls_loss = jnp.where(has_gt, cls_loss_full, neg_only_cls)
    reg_loss = jnp.where(has_gt, reg_loss_full, 0.0)
    return reg_loss, cls_loss, has_gt


def focal_loss(classification: jnp.ndarray, regression: jnp.ndarray,
               annotations: jnp.ndarray, anchors: jnp.ndarray,
               logits: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched focal loss.

    classification (B, N, C) sigmoid scores, regression (B, N, 4),
    annotations (B, MAX_GT, 5) padded with -1 labels, anchors (N, 4).
    When `logits` (the pre-sigmoid scores, DetectorOutput.logits) is
    given, the classification term is computed from them via softplus
    identities — identical values inside the clamp band at roughly half
    the transcendental cost (see _cls_terms) — and `classification` is
    ignored (XLA dead-code-eliminates the producing sigmoid).
    Returns (regression_loss, classification_loss) scalars (batch means;
    exactly 0 when no image has annotations).
    """
    from_logits = logits is not None
    cls_in = (logits if from_logits else classification).astype(jnp.float32)
    regression = regression.astype(jnp.float32)
    annotations = annotations.astype(jnp.float32)
    anchors = anchors.astype(jnp.float32)

    per_image = functools.partial(_per_image_loss, from_logits=from_logits)
    reg, cls, has_gt = jax.vmap(per_image, in_axes=(0, 0, 0, None))(
        cls_in, regression, annotations, anchors)
    any_gt = jnp.any(has_gt)
    reg_loss = jnp.where(any_gt, jnp.mean(reg), 0.0)
    cls_loss = jnp.where(any_gt, jnp.mean(cls), 0.0)
    return reg_loss, cls_loss
