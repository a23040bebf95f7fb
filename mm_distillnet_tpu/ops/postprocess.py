"""On-device fixed-shape detection post-processing.

Dense replacement for the reference's ragged, host-side pipeline
(EfficientDet_post_processing, reference src/utils/utils.py:144-231 and
logits_to_ground_truth src/utils/utils.py:234-324): decode deltas vs the
anchor table, clip to the image, per-anchor confidence filtering
(conf_threshold), class-validity masking, per-class NMS (nms_threshold) —
all inside the compiled program, producing (B, max_det, 6) tensors
[xmin, ymin, xmax, ymax, score, class] plus a validity mask. This removes
the per-teacher-per-step device->host NMS round-trip that dominates the
reference's hot loop (SURVEY.md section 3.1).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import clip_boxes, decode_boxes
from .nms import NEG_INF, batched_class_nms_fixed


class Detections(NamedTuple):
    """Fixed-shape detections: boxes xyxy in pixels, prediction-space class
    ids, and a validity mask (padding rows are False)."""
    boxes: jnp.ndarray    # (B, max_det, 4)
    scores: jnp.ndarray   # (B, max_det)
    classes: jnp.ndarray  # (B, max_det) int32
    valid: jnp.ndarray    # (B, max_det) bool


def class_validity_table(num_classes: int,
                         valid_prediction_ids: Sequence[int],
                         ignore_labels: Sequence[int] = ()) -> np.ndarray:
    """Boolean LUT over class ids: True where the class is one of the
    configured valid prediction ids (reference src/utils/utils.py:196-204
    masks classes to valid_classes_dict['predictions_txt2i'] values, then
    drops ignore_labels)."""
    table = np.zeros((num_classes,), dtype=bool)
    for cid in valid_prediction_ids:
        table[cid] = True
    for cid in ignore_labels:
        table[cid] = False
    return table


_SCORE_BITS = 24
_CLASS_BITS = 5  # up to 32 classes packed below the quantized score


@functools.partial(jax.jit, static_argnames=(
    'image_size', 'conf_threshold', 'nms_threshold', 'num_candidates',
    'max_detections', 'fast', 'approx', 'int_topk'))
def postprocess_detections(classification: jnp.ndarray,
                           regression: jnp.ndarray,
                           anchors: jnp.ndarray,
                           class_valid: jnp.ndarray,
                           *,
                           image_size: int,
                           conf_threshold: float = 0.3,
                           nms_threshold: float = 0.5,
                           num_candidates: int = 512,
                           max_detections: int = 100,
                           fast: bool = True,
                           approx: bool = False,
                           int_topk: bool = False) -> Detections:
    """classification (B, N, C) sigmoid scores; regression (B, N, 4);
    anchors (N, 4) [y1,x1,y2,x2]; class_valid (C,) bool LUT.

    fast=True (default, TPU path): the per-anchor (score, class) pair is
    packed into one int32 — quantized score in the high 24 bits, class id
    in the low 5 — so a single max + a single top_k replace the separate
    max/argmax/gather passes, and anchors are recomputed from indices
    instead of gathered. Scores round-trip with <6e-8 absolute error.
    fast=False reproduces the exact float path (used by parity tests).
    """
    from .anchors import anchors_from_indices

    classification = classification.astype(jnp.float32)
    regression = regression.astype(jnp.float32)
    csize = float(image_size)
    n_cls = classification.shape[-1]
    if fast and n_cls <= (1 << _CLASS_BITS):
        # ---- packed int path ----
        # Branchless winner-validity: the winning class is the argmax over
        # ALL classes; the anchor is dropped — never reassigned — when
        # that winner is below conf_threshold or class-invalid (reference
        # EfficientDet_post_processing, utils.py:185-204). Comparing
        # max-over-all with max-over-surviving reproduces that without
        # the (B, N) `class_valid[classes]` gather, which XLA lowers
        # to a ~25 ms elementwise gather at batch 32 (BENCH_NOTES.md).
        # (A Pallas pack kernel for this chain tied XLA standalone but
        # lost end-to-end — the custom call blocks fusion with the
        # producing heads — and was retired; BENCH_NOTES.md round 2.)
        q = (classification * float(1 << _SCORE_BITS)).astype(jnp.int32)
        cls_ids = jnp.arange(n_cls, dtype=jnp.int32)
        packed = (q << _CLASS_BITS) | cls_ids        # (B, N, C)
        overall = jnp.max(packed, axis=-1)           # (B, N)
        ok = (classification > conf_threshold) & (class_valid != 0)
        best_ok = jnp.max(jnp.where(ok, packed, -1), axis=-1)
        masked = jnp.where(best_ok == overall, best_ok, -1)
        if approx:
            # approx=True routes candidate selection through the TPU's
            # PartialReduce top-k (jax.lax.approx_max_k, recall_target
            # 0.99). It operates on floats; non-negative int32 bitcast to
            # float32 is order-preserving — but packed values below 2^23
            # (winner score < 2^-6) would land in the SUBNORMAL range,
            # which the TPU flushes to zero inside the reduction, silently
            # dropping low-confidence survivors when conf_threshold
            # < 1/64. Bias survivors by 2^23 so every candidate bitcasts
            # to a normal float (max biased value 2^29+2^23 < 2^31 keeps
            # the sign bit clear; order is preserved); dropped anchors
            # map to 0, below every biased survivor.
            bias = jnp.int32(1 << 23)
            shifted = jnp.where(masked >= 0, masked + bias, 0)
            as_f32 = jax.lax.bitcast_convert_type(shifted, jnp.float32)
            top_f, top_idx = jax.lax.approx_max_k(
                as_f32, num_candidates, recall_target=0.99)
            top_biased = jax.lax.bitcast_convert_type(top_f, jnp.int32)
            cand_valid = top_biased >= bias
            top_packed = jnp.where(cand_valid, top_biased - bias, 0)
        elif int_topk:
            # the round-2..4 exact selection: top_k directly over the
            # packed int32 (kept as the A/B reference, scripts/ab_topk.py)
            top_packed, top_idx = jax.lax.top_k(masked, num_candidates)
            cand_valid = top_packed >= 0
        else:
            # Exact selection, but sorted in FLOAT space: the same
            # order-preserving bias+bitcast the approx path uses (non-
            # negative int32 + 2^23 bias -> normal f32, order preserved
            # exactly), then an exact top_k over f32 — selections stay
            # bit-identical to the int top_k while the TPU sorts f32 keys
            # faster (A/B: scripts/ab_topk.py; BENCH_NOTES round 5).
            bias = jnp.int32(1 << 23)
            shifted = jnp.where(masked >= 0, masked + bias, 0)
            as_f32 = jax.lax.bitcast_convert_type(shifted, jnp.float32)
            top_f, top_idx = jax.lax.top_k(as_f32, num_candidates)
            top_biased = jax.lax.bitcast_convert_type(top_f, jnp.int32)
            cand_valid = top_biased >= bias
            top_packed = jnp.where(cand_valid, top_biased - bias, 0)
        top_scores = (top_packed >> _CLASS_BITS).astype(jnp.float32) / \
            float(1 << _SCORE_BITS)
        top_scores = jnp.where(cand_valid, top_scores, NEG_INF)
        top_classes = jnp.where(cand_valid,
                                top_packed & ((1 << _CLASS_BITS) - 1), 0)
        cand_anchors = anchors_from_indices(top_idx, image_size)

        def _per_image(reg, idx, anc, scr, c, v):
            b = clip_boxes(decode_boxes(anc, reg[idx]), csize)
            sel, kscores, kvalid = batched_class_nms_fixed(
                b, scr, c, v, nms_threshold, max_detections,
                coord_bound=csize + 1.0)
            return (b[sel], jnp.where(kvalid, kscores, 0.0), c[sel], kvalid)

        out_boxes, out_scores, out_classes, out_valid = jax.vmap(
            _per_image)(regression, top_idx, cand_anchors, top_scores,
                        top_classes, cand_valid)
    else:
        # ---- exact float path ----
        scores = jnp.max(classification, axis=-1)
        classes = jnp.argmax(classification, axis=-1)
        valid = (scores > conf_threshold) & class_valid[classes]
        masked = jnp.where(valid, scores, NEG_INF)
        top_scores, top_idx = jax.lax.top_k(masked, num_candidates)
        cand_valid = top_scores > NEG_INF / 2

        def _per_image(reg, idx, scr, cls, v):
            b = clip_boxes(decode_boxes(anchors[idx], reg[idx]), csize)
            c = cls[idx]
            sel, kscores, kvalid = batched_class_nms_fixed(
                b, scr, c, v, nms_threshold, max_detections,
                coord_bound=csize + 1.0)
            return (b[sel], jnp.where(kvalid, kscores, 0.0), c[sel], kvalid)

        out_boxes, out_scores, out_classes, out_valid = jax.vmap(
            _per_image)(regression, top_idx, top_scores, classes, cand_valid)
    out_classes = jnp.where(out_valid, out_classes, -1)
    return Detections(out_boxes, out_scores, out_classes.astype(jnp.int32),
                      out_valid)


def detections_to_labels(dets: Detections,
                         pred_to_label: jnp.ndarray,
                         image_size: int,
                         include_scores: bool = True) -> jnp.ndarray:
    """Convert detections into padded pseudo-ground-truth rows.

    Mirrors logits_to_ground_truth (reference src/utils/utils.py:286-318):
    coordinates are int-truncated and re-clipped, prediction-space class ids
    are remapped to label-space via `pred_to_label` (a (C,) int LUT), and
    invalid rows are padded with -1 labels (the focal loss treats label -1
    as padding, reference src/loss/YetAnotherFocalLoss.py:67).

    Returns (B, max_det, 6) [x1, y1, x2, y2, score, label] when
    include_scores else (B, max_det, 5) [x1, y1, x2, y2, label].
    """
    b = jnp.floor(dets.boxes)
    x1 = jnp.clip(b[..., 0], 0, image_size)
    y1 = jnp.clip(b[..., 1], 0, image_size)
    x2 = jnp.clip(b[..., 2], 0, image_size)
    y2 = jnp.clip(b[..., 3], 0, image_size)
    safe_cls = jnp.clip(dets.classes, 0, pred_to_label.shape[0] - 1)
    labels = pred_to_label[safe_cls].astype(jnp.float32)
    labels = jnp.where(dets.valid, labels, -1.0)
    cols = [x1, y1, x2, y2]
    if include_scores:
        cols.append(dets.scores)
    cols.append(labels)
    out = jnp.stack(cols, axis=-1)
    # Zero out padded rows except the label column (-1 marker).
    mask = dets.valid[..., None]
    pad = jnp.concatenate([jnp.zeros_like(out[..., :-1]),
                           -jnp.ones_like(out[..., -1:])], axis=-1)
    return jnp.where(mask, out, pad)
