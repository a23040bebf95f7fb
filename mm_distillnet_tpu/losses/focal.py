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
classification term is computed in logit space via the softplus identity
-log(sigmoid(-y)) = softplus(y) — identical values inside the clamp band
with a single dense transcendental chain (see _per_image_loss).
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
# Precision of the one-hot GT-assignment contraction (module-level so perf
# A/B harnesses can toggle it; see scripts/ab_focal_step.py).
ASSIGN_PRECISION = jax.lax.Precision.HIGHEST
# Compute dtype of the dense (C, N) classification chain (the train step's
# largest non-conv phase: ~27 ms of the 59.8 ms fused step at batch 8 is
# transcendental-bound focal work, BENCH_NOTES round 2). bfloat16 doubles
# VPU element throughput; the reduction accumulates in fp32 either way.
# Default fp32 = reference parity; toggled by scripts/ab_focal_step.py and
# (if the TPU A/B wins) by config focal_dtype.
CLS_COMPUTE_DTYPE = jnp.float32


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
    #
    # Formulation chosen by composite-step A/B, not op-counting
    # (scripts/ab_focal_step.py; BENCH_NOTES.md round 3): the probability
    # path below blends -log(p) / -log(1-p) ARITHMETICALLY with the 0/1
    # float targets (the round-2 form, 60.4 ms full step at batch 8).
    # Mathematically equivalent rewrites that select before the
    # transcendental (one dense log; or softplus/sigmoid in logit space)
    # measured 66-74 ms in the SAME step — XLA's schedule of the composed
    # graph, not the transcendental count, decides. The logit path stays
    # available (select-first softplus form, 65.7 ms) for callers without
    # sigmoid outputs; the shipped train step passes probabilities.
    cdt = CLS_COMPUTE_DTYPE
    if from_logits:
        x = jnp.clip(classification.T, -LOGIT_CLAMP,
                     LOGIT_CLAMP).astype(cdt)                      # (C, N)
    else:
        p = jnp.clip(classification.T, CLS_CLAMP,
                     1.0 - CLS_CLAMP).astype(cdt)

    # ---- negatives-only branch (image with no annotations): all-targets-
    # zero term over every anchor/class, (1-a) * p^g * -log(1-p).
    # In logit space -log(1-p) = softplus(x) and p = sigmoid(x).
    if from_logits:
        neg_only_cls = jnp.sum(((1.0 - ALPHA) *
                                _pow_gamma(jax.nn.sigmoid(x)) *
                                jax.nn.softplus(x)).astype(jnp.float32))
    else:
        neg_only_cls = jnp.sum(((1.0 - ALPHA) * _pow_gamma(p) *
                                (-jnp.log(1.0 - p))).astype(jnp.float32))

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
                          precision=ASSIGN_PRECISION)          # (N, 5)
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
    alpha_factor = jnp.where(target_is_one, jnp.asarray(ALPHA, cdt),
                             jnp.asarray(1.0 - ALPHA, cdt))

    if from_logits:
        # q = where(t, sigmoid(x), sigmoid(-x)) = sigmoid(-y), y=where(t,-x,x)
        # -log(q) = softplus(y);  1-q = sigmoid(y)
        y = jnp.where(target_is_one, -x, x)                    # (C, N)
        cls_each = alpha_factor * _pow_gamma(jax.nn.sigmoid(y)) * \
            jax.nn.softplus(y)
    else:
        targets = jnp.where(target_is_one, jnp.asarray(1.0, cdt),
                            jnp.asarray(0.0, cdt))             # (C, N)
        focal_weight = jnp.where(target_is_one, 1.0 - p, p)
        bce = -(targets * jnp.log(p) +
                (1.0 - targets) * jnp.log(1.0 - p))
        cls_each = alpha_factor * _pow_gamma(focal_weight) * bce
    # fp32 accumulation regardless of the chain dtype (the convert fuses
    # into the reduce)
    cls_loss_full = jnp.sum(jnp.where(care, cls_each,
                                      jnp.asarray(0.0, cdt)
                                      ).astype(jnp.float32))
    cls_loss_full = cls_loss_full / \
        jnp.clip(num_pos.astype(jnp.float32), min=1.0)

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
        jnp.clip(num_pos.astype(jnp.float32), min=1.0)
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
    given, the classification term is computed from them via the softplus
    identity — identical values inside the clamp band, one dense
    transcendental chain — and `classification` is ignored (XLA
    dead-code-eliminates the producing sigmoid).
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
