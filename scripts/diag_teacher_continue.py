#!/usr/bin/env python
"""Hypothesis test for the shipped-recipe proof: does EXTENDING phase-A
supervised training sharpen teacher score calibration (TPs up, FPs below
the 0.3 pseudo-label threshold), i.e. would a longer phase A clean the
fused labels the student distills from?

Continues training ONE already-trained teacher from its checkpoint for
--epochs more at --lr, then reports conf-0.3 detections/frame, AP@0.5
vs GT, and the TP/FP score split before vs after.

Usage (TPU): python scripts/diag_teacher_continue.py --modality rgb
"""
from __future__ import annotations

import argparse
import json
import os
import sys

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_DIR = os.path.dirname(SCRIPTS_DIR)
sys.path.insert(0, REPO_DIR)
sys.path.insert(0, SCRIPTS_DIR)

if os.environ.get('MMDT_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['MMDT_PLATFORM'])
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _box_report(module, variables, batch, gt_lists, cfg, size, vcd):
    """conf-0.3 detections: count, AP vs GT, TP/FP score stats."""
    from diag_fused_labels import _ap50_from_dets
    from mm_distillnet_tpu.distill.pseudo_labels import teacher_detections
    from mm_distillnet_tpu.train.trainer import distill_config_from
    from mm_distillnet_tpu.ops.anchors import anchor_table
    from mm_distillnet_tpu.data.base import (prediction_to_label_lut,
                                             valid_prediction_ids)
    from mm_distillnet_tpu.ops.postprocess import (class_validity_table,
                                                   detections_to_labels)
    from mm_distillnet_tpu.utils.metrics import bbox_iou_plus1

    nc = module.num_classes
    class_valid = jnp.asarray(class_validity_table(
        nc, valid_prediction_ids(vcd)))
    p2l = jnp.asarray(prediction_to_label_lut(vcd, nc))
    anchors = jnp.asarray(anchor_table(size))
    out = module.apply(variables, batch, train=False)
    dcfg = distill_config_from(cfg, size).pl
    dets = teacher_detections(out.classification, out.regression,
                              anchors, class_valid, dcfg)
    rows = np.asarray(detections_to_labels(dets, p2l, size,
                                           include_scores=True))
    preds = [[r.tolist() for r in img if r[5] != -1] for img in rows]

    tp_scores, fp_scores = [], []
    for img_preds, img_gt in zip(preds, gt_lists):
        gt_boxes = (np.asarray([g[:4] for g in img_gt], np.float32)
                    if img_gt else np.zeros((0, 4), np.float32))
        for r in img_preds:
            box = np.asarray(r[:4], np.float32)
            ious = (bbox_iou_plus1(box, gt_boxes) if len(gt_boxes)
                    else np.zeros((0,)))
            (tp_scores if ious.size and ious.max() >= 0.5 else
             fp_scores).append(r[4])
    n_pred = sum(len(p) for p in preds)
    return {
        'boxes_per_frame': round(n_pred / len(preds), 2),
        'ap50_vs_gt': round(_ap50_from_dets(preds, gt_lists), 2),
        'n_tp': len(tp_scores), 'n_fp': len(fp_scores),
        'tp_score_mean': round(float(np.mean(tp_scores)), 3)
        if tp_scores else None,
        'fp_score_mean': round(float(np.mean(fp_scores)), 3)
        if fp_scores else None,
        'fp_score_max': round(float(np.max(fp_scores)), 3)
        if fp_scores else None,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--exp-name', default='convergence-shipped')
    p.add_argument('--modality', default='rgb')
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--frames', type=int, default=8)
    p.add_argument('--coef', type=int, default=0)
    p.add_argument('--epochs', type=int, default=400)
    p.add_argument('--lr', type=float, default=3e-4)
    p.add_argument('--step-size', type=int, default=200)
    p.add_argument('--gamma', type=float, default=0.3)
    args = p.parse_args()

    from convergence import _recalibrate
    from mm_distillnet_tpu.config import default_config
    from mm_distillnet_tpu.data.loader import collate
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    from mm_distillnet_tpu.distill.train_step import TrainState
    from mm_distillnet_tpu.models.registry import load_model
    from mm_distillnet_tpu.train.trainer import train

    cfg = default_config(
        dataset='Synthetic', image_size=str(args.size),
        synthetic_size=str(args.frames), batch_size=str(args.frames),
        num_workers='1', resume='False', es_patience=str(10 ** 9),
        optimizer='Adam', lr=str(args.lr), scheduler='StepLR',
        step_size=str(args.step_size), gamma=str(args.gamma),
        max_gt='16', nms_candidates='128', max_det_per_teacher='16',
        max_detections='32', conf_threshold='0.3', nms_threshold='0.5',
        compound_coef=str(args.coef), seed='24', rank='0',
        compute_dtype='float32', num_epoches=str(args.epochs),
        val_interval=str(10 ** 6),
        use_rgb='True', use_thermal='True', use_depth='True',
        use_audio='False', use_labels='True',
        student_input=args.modality, kd_loss='None',
        train_method='traditional',
        teacher='YetAnotherEfficientDet_D2',
        student='YetAnotherEfficientDet_D2',
        saved_path=os.path.join(args.exp_name, 'trained_models'),
        exp_name=f'{args.exp_name}/teacher-{args.modality}-cont')

    dataset = SyntheticMultimodal(cfg, 'train')
    vcd = dataset.valid_classes_dict
    module, variables = load_model('YetAnotherEfficientDet_D2', cfg,
                                   args.modality)

    samples = [dataset[i] for i in range(len(dataset.ids))]
    batch = collate(samples, 16)
    x = jnp.asarray(batch[args.modality])
    gt_lists = []
    for img_labels in np.asarray(batch['label']):
        gt_lists.append([r.tolist() for r in img_labels if r[4] != -1])

    report = {'before': _box_report(module, variables, x, gt_lists, cfg,
                                    args.size, vcd)}
    print(json.dumps({'before': report['before']}), file=sys.stderr)

    state = train({}, (module, variables), cfg, dataset, None)
    variables2 = _recalibrate(module, state, dataset, args.modality,
                              args.frames)
    report['after'] = _box_report(module, variables2, x, gt_lists, cfg,
                                  args.size, vcd)
    report['epochs'] = args.epochs
    report['lr'] = args.lr
    print(json.dumps(report, indent=1))


if __name__ == '__main__':
    main()
