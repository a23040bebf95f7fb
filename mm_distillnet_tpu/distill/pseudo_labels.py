"""On-device pseudo-ground-truth generation from teacher predictions.

Replaces the reference's per-step CPU round-trip (decode on GPU ->
.cpu().numpy() -> per-image python lists -> torchvision NMS -> numpy concat
-> CPU nms fusion; reference src/optimization/train_methods.py:320-411 and
src/utils/utils.py:144-324) with a fully on-device fixed-shape pipeline:

  per teacher: decode + clip + conf/class filter + per-class NMS
               -> (B, max_det, 6) padded detections
  fusion:      concat across teachers -> class-AGNOSTIC NMS at IoU 0.5
               (the cross-teacher fusion in the reference is plain nms over
               all boxes regardless of class, train_methods.py:139-143)
               -> drop scores -> (B, max_gt, 5) [x1,y1,x2,y2,label], padded
               with label -1.

Coordinates are floor()-truncated like the reference's int() conversion in
logits_to_ground_truth (src/utils/utils.py:286-318).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.nms import nms_fixed
from ..ops.postprocess import (Detections, detections_to_labels,
                               postprocess_detections)


class PseudoLabelConfig(NamedTuple):
    image_size: int
    conf_threshold: float = 0.3
    nms_threshold: float = 0.5
    fusion_iou: float = 0.5       # hardcoded 0.5 in the reference fusion
    num_candidates: int = 512
    max_det_per_teacher: int = 32
    max_gt: int = 64


def teacher_detections(classification: jnp.ndarray, regression: jnp.ndarray,
                       anchors: jnp.ndarray, class_valid: jnp.ndarray,
                       cfg: PseudoLabelConfig) -> Detections:
    return postprocess_detections(
        classification, regression, anchors, class_valid,
        image_size=cfg.image_size, conf_threshold=cfg.conf_threshold,
        nms_threshold=cfg.nms_threshold, num_candidates=cfg.num_candidates,
        max_detections=cfg.max_det_per_teacher)


def fuse_teacher_labels(per_teacher_labels: Sequence[jnp.ndarray],
                        cfg: PseudoLabelConfig) -> jnp.ndarray:
    """Fuse per-teacher padded label tensors into pseudo-ground-truth.

    per_teacher_labels: list of (B, max_det, 6) [x1,y1,x2,y2,score,label]
    with label -1 padding (from ops.postprocess.detections_to_labels).
    Returns (B, max_gt, 5) [x1,y1,x2,y2,label], label -1 padded, ordered by
    descending score among kept boxes.
    """
    cat = jnp.concatenate(per_teacher_labels, axis=1)  # (B, T*max_det, 6)

    def _per_image(rows):
        boxes = rows[:, :4]
        scores = rows[:, 4]
        labels = rows[:, 5]
        valid = labels != -1
        idx, _, out_valid = nms_fixed(boxes, scores, valid, cfg.fusion_iou,
                                      cfg.max_gt)
        kept = rows[idx]
        lab = jnp.where(out_valid, kept[:, 5], -1.0)
        out = jnp.concatenate([
            jnp.where(out_valid[:, None], kept[:, :4], 0.0),
            lab[:, None]], axis=1)
        return out

    return jax.vmap(_per_image)(cat)


def build_pseudo_labels(teacher_outputs: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
                        anchors: jnp.ndarray,
                        class_valid: jnp.ndarray,
                        pred_to_label: jnp.ndarray,
                        cfg: PseudoLabelConfig) -> jnp.ndarray:
    """teacher_outputs: {modality: (classification, regression)}.
    Returns fused (B, max_gt, 5) pseudo-ground-truth."""
    per_teacher = []
    for modality in teacher_outputs:
        cls_t, reg_t = teacher_outputs[modality]
        dets = teacher_detections(cls_t, reg_t, anchors, class_valid, cfg)
        labels = detections_to_labels(dets, pred_to_label, cfg.image_size,
                                      include_scores=True)
        per_teacher.append(labels)
    return fuse_teacher_labels(per_teacher, cfg)
