#!/usr/bin/env python
"""A/B the full fused train step across focal-loss variants.

Round-3 regression hunt: after the logit-space focal rewrite +
Precision.HIGHEST assignment matmul the composed step measured ~73-77 ms
at batch 8 vs the round-2 record 59.8 ms, while the ISOLATED student
fwd+bwd was unchanged — so the loss edit may have perturbed XLA's
composite schedule rather than the loss cost itself. This times the REAL
make_train_step under the four combinations:

    logits {on, off} x assignment precision {HIGHEST, default}

Usage:  python scripts/ab_focal_step.py            (TPU)
        AB_BATCH=8 AB_ITERS=10 python scripts/ab_focal_step.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('MMDT_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['MMDT_PLATFORM'])
import jax  # noqa: E402
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('MMDT_COMPILE_CACHE',
                                 os.path.expanduser('~/.cache/mmdt_xla')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import jax.numpy as jnp  # noqa: E402

import mm_distillnet_tpu.distill.train_step as TS  # noqa: E402
import mm_distillnet_tpu.losses.focal as F  # noqa: E402
from mm_distillnet_tpu.distill.train_step import make_train_step  # noqa: E402
from mm_distillnet_tpu.utils.profiling import device_time  # noqa: E402
from profile_train_step import build  # noqa: E402

BATCH = int(os.environ.get('AB_BATCH', '8'))
ITERS = int(os.environ.get('AB_ITERS', '10'))

def _per_image_loss_r2(classification, regression, annotations, anchors,
                       from_logits=False):
    """The round-2 formulation verbatim (commit 71483e2): select-then-pow
    focal weight, targets*bce form, default-precision assignment."""
    num_classes = classification.shape[-1]
    gt_valid = annotations[:, 4] != -1
    n_gt = jnp.sum(gt_valid)
    cls_t = jnp.clip(classification.T, F.CLS_CLAMP, 1.0 - F.CLS_CLAMP)
    neg_only_cls = jnp.sum((1.0 - F.ALPHA) * F._pow_gamma(cls_t) *
                           (-jnp.log(1.0 - cls_t)))
    iou = F.iou_anchors_vs_gt(anchors, annotations[:, :4])
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    iou_max = jnp.max(iou, axis=1)
    iou_argmax = jnp.argmax(iou, axis=1)
    assign_oh = jax.nn.one_hot(iou_argmax, annotations.shape[0],
                               dtype=jnp.float32)
    assigned = assign_oh @ annotations
    positive = iou_max >= 0.5
    negative = iou_max < 0.4
    num_pos = jnp.sum(positive)
    labels = jnp.clip(assigned[:, 4].astype(jnp.int32), 0, num_classes - 1)
    class_iota = jnp.arange(num_classes, dtype=jnp.int32)[:, None]
    targets = jnp.where(positive[None, :] & (labels[None, :] == class_iota),
                        1.0, 0.0)
    care = (positive | negative)[None, :]
    alpha_factor = jnp.where(targets == 1.0, F.ALPHA, 1.0 - F.ALPHA)
    focal_weight = jnp.where(targets == 1.0, 1.0 - cls_t, cls_t)
    focal_weight = alpha_factor * F._pow_gamma(focal_weight)
    bce = -(targets * jnp.log(cls_t) +
            (1.0 - targets) * jnp.log(1.0 - cls_t))
    cls_loss_full = jnp.sum(jnp.where(care, focal_weight * bce, 0.0))
    cls_loss_full = cls_loss_full / \
        jnp.clip(num_pos.astype(cls_t.dtype), min=1.0)
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
    reg_loss_each = jnp.sum(F._smooth_l1(reg_targets - regression),
                            axis=1) / 4.0
    reg_loss_full = jnp.sum(jnp.where(positive, reg_loss_each, 0.0)) / \
        jnp.clip(num_pos.astype(cls_t.dtype), min=1.0)
    reg_loss_full = jnp.where(num_pos > 0, reg_loss_full, 0.0)
    has_gt = n_gt > 0
    cls_loss = jnp.where(has_gt, cls_loss_full, neg_only_cls)
    reg_loss = jnp.where(has_gt, reg_loss_full, 0.0)
    return reg_loss, cls_loss, has_gt


_REAL_PER_IMAGE = F._per_image_loss


def time_variant(use_logits: bool, highest: bool, r2_body: bool = False,
                 cls_dtype=jnp.float32):
    F.ASSIGN_PRECISION = (jax.lax.Precision.HIGHEST if highest
                          else jax.lax.Precision.DEFAULT)
    F.CLS_COMPUTE_DTYPE = cls_dtype
    F._per_image_loss = _per_image_loss_r2 if r2_body else _REAL_PER_IMAGE
    # Flip the trace-time hook in train_step — the step's focal call sites
    # route through TS._student_focal, which reads this module global.
    # (Patching TS.focal_loss stopped working when commit 81eaa6b made the
    # probability path the default call; the hook restores the A/B axis.)
    TS.FOCAL_FROM_LOGITS = use_logits
    (student, teachers, batch, t_vars, state, tx, anchors, class_valid,
     pred_to_label, cfg) = build(BATCH)
    step = make_train_step(student, teachers, tx, cfg, anchors, class_valid,
                           pred_to_label)

    def full(state, t_vars, batch):
        new_state, metrics = step(state, t_vars, batch, jax.random.PRNGKey(3))
        dep = sum(l.sum().astype(jnp.float32)
                  for l in jax.tree_util.tree_leaves(new_state.params))
        return metrics['Total_loss'] + dep

    t = device_time(full, (state, t_vars, batch), iters=ITERS)
    row = {'logits': use_logits, 'assign_highest': highest,
           'r2_body': r2_body, 'cls_dtype': jnp.dtype(cls_dtype).name,
           'ms': round(t * 1000, 1), 'fps': round(BATCH / t, 1)}
    print(json.dumps(row), flush=True)
    return row


def main():
    only = os.environ.get('AB_ONLY')  # e.g. 'r2' to time just the r2 body
    if only == 'r2':
        time_variant(False, False, r2_body=True)
        return
    if only == 'bf16':
        # Round-5 experiment (VERDICT item 4): the dense (C, N)
        # classification chain in bfloat16 (fp32 accumulation) — doubles
        # VPU element throughput on the transcendental-bound focal phase.
        time_variant(False, True, cls_dtype=jnp.float32)
        time_variant(False, True, cls_dtype=jnp.bfloat16)
        return
    rows = [time_variant(lg, hp)
            for lg in (True, False) for hp in (True, False)]
    rows.append(time_variant(False, False, r2_body=True))
    rows.append(time_variant(False, True, cls_dtype=jnp.bfloat16))
    print('\n| logits | HIGHEST assign | r2 body | cls dtype | ms | fps |')
    print('|---|---|---|---|---|---|')
    for r in rows:
        print(f"| {r['logits']} | {r['assign_highest']} | {r['r2_body']} "
              f"| {r['cls_dtype']} | {r['ms']} | {r['fps']} |")


if __name__ == '__main__':
    main()
