#!/usr/bin/env python
"""Diagnose pseudo-label quality for the shipped-recipe convergence proof.

Scores, against the synthetic GT at IoU 0.5:
  - each trained teacher's own detections (the per-teacher label source),
  - the cross-teacher NMS fusion (the actual pseudo-GT the student fits),
sweeping the fusion confidence threshold, plus box-count statistics.

The student can never beat its labels: if the fused labels score X vs GT,
X bounds student-vs-GT. Reference fusion being diagnosed:
train_methods.py:390-411 (concat all teachers' boxes, class-agnostic NMS
@0.5, scores dropped).

Usage: python scripts/diag_fused_labels.py [--exp-name convergence-shipped]
       (runs on whatever backend jax picks; MMDT_PLATFORM=cpu to force CPU)
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


def _ap50_from_dets(pred_lists, label_lists):
    """pred_lists: per-image [x1,y1,x2,y2,score,cls]; labels [x1..y2,cls]."""
    from mm_distillnet_tpu.utils.metrics import (ap_per_class,
                                                 get_batch_statistics)
    target = []
    for img in label_lists:
        target.extend(r[4] for r in img)
    stats = get_batch_statistics(pred_lists, label_lists, 0.5)
    if not stats:
        return 0.0
    tp = np.concatenate([s[0] for s in stats])
    conf = np.concatenate([s[1] for s in stats])
    cls = np.concatenate([s[2] for s in stats])
    if tp.size == 0:
        return 0.0
    ap = ap_per_class(tp, conf, cls, np.asarray(target))[2]
    return float(np.mean(ap)) * 100


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--exp-name', default='convergence-shipped')
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--frames', type=int, default=8)
    p.add_argument('--coef', type=int, default=0)
    p.add_argument('--conf-sweep', default='0.3,0.4,0.5,0.6,0.7')
    args = p.parse_args()

    from mm_distillnet_tpu.config import default_config
    from mm_distillnet_tpu.data.loader import collate
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    from mm_distillnet_tpu.distill.pseudo_labels import (
        fuse_teacher_labels, teacher_detections)
    from mm_distillnet_tpu.train.trainer import distill_config_from
    from mm_distillnet_tpu.models.registry import load_model
    from mm_distillnet_tpu.ops.anchors import anchor_table
    from mm_distillnet_tpu.data.base import (prediction_to_label_lut,
                                             valid_prediction_ids)
    from mm_distillnet_tpu.ops.postprocess import (class_validity_table,
                                                   detections_to_labels)

    cfg = default_config(
        dataset='Synthetic', image_size=str(args.size),
        synthetic_size=str(args.frames), batch_size=str(args.frames),
        max_gt='16', nms_candidates='128', max_det_per_teacher='16',
        max_detections='32', conf_threshold='0.3', nms_threshold='0.5',
        compound_coef=str(args.coef), seed='24', num_workers='1',
        use_rgb='True', use_thermal='True', use_depth='True',
        use_audio='False', teacher='YetAnotherEfficientDet_D2',
        student='YetAnotherEfficientDet_D2',
        saved_path=os.path.join(args.exp_name, 'trained_models'),
        exp_name=args.exp_name)

    dataset = SyntheticMultimodal(cfg, 'train')
    vcd = dataset.valid_classes_dict
    teachers = {m: load_model('YetAnotherEfficientDet_D2', cfg, m)
                for m in ('rgb', 'thermal', 'depth')}
    nc = teachers['rgb'][0].num_classes
    class_valid = jnp.asarray(class_validity_table(
        nc, valid_prediction_ids(vcd)))
    p2l = jnp.asarray(prediction_to_label_lut(vcd, nc))
    anchors = jnp.asarray(anchor_table(args.size))

    samples = [dataset[i] for i in range(len(dataset.ids))]
    batch = collate(samples, 16)
    gt_lists = []
    for img_labels in np.asarray(batch['label']):
        gt_lists.append([r.tolist() for r in img_labels if r[4] != -1])
    n_gt = sum(len(g) for g in gt_lists)

    report = {'n_gt': n_gt, 'per_teacher': {}, 'fused': {}}

    per_teacher_labels = {}
    for m, (module, variables) in teachers.items():
        x = jnp.asarray(batch[m])
        out = module.apply(variables, x, train=False)
        dcfg = distill_config_from(cfg, args.size).pl
        dets = teacher_detections(out.classification, out.regression,
                                  anchors, class_valid, dcfg)
        rows = np.asarray(detections_to_labels(dets, p2l, args.size,
                                               include_scores=True))
        per_teacher_labels[m] = rows
        preds = [[r.tolist() for r in img if r[5] != -1] for img in rows]
        n_pred = sum(len(pr) for pr in preds)
        report['per_teacher'][m] = {
            'ap50_vs_gt': round(_ap50_from_dets(preds, gt_lists), 2),
            'boxes': n_pred, 'boxes_per_frame': round(n_pred / len(preds), 1)}

    for conf in [float(c) for c in args.conf_sweep.split(',')]:
        dcfg = distill_config_from(cfg, args.size).pl._replace(
            conf_threshold=conf)
        per_t = []
        for m, (module, variables) in teachers.items():
            x = jnp.asarray(batch[m])
            out = module.apply(variables, x, train=False)
            dets = teacher_detections(out.classification, out.regression,
                                      anchors, class_valid, dcfg)
            per_t.append(detections_to_labels(dets, p2l, args.size,
                                              include_scores=True))
        fused = np.asarray(fuse_teacher_labels(
            [jnp.asarray(t) for t in per_t], dcfg))
        # fused rows are (B, max_gt, 5) score-dropped; score them as
        # conf-1.0 detections (single PR point — crude but comparable)
        preds = [[r[:4].tolist() + [1.0, r[4]] for r in img if r[4] != -1]
                 for img in fused]
        n_pred = sum(len(pr) for pr in preds)
        report['fused'][f'conf={conf}'] = {
            'ap50_vs_gt': round(_ap50_from_dets(preds, gt_lists), 2),
            'boxes': n_pred, 'boxes_per_frame': round(n_pred / len(preds), 1)}

    print(json.dumps(report, indent=1))


if __name__ == '__main__':
    main()
