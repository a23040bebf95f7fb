#!/usr/bin/env python
"""Diagnose the trained shipped-recipe student's detections per frame.

Loads the student checkpoint from <exp-name>/<suffix>, BN-recalibrates,
then prints per-frame detections at a confidence sweep next to the fused
pseudo-labels and the GT, plus AP@0.5 vs GT at each threshold. Answers:
is the 46-vs-fused fit an under-confidence problem (boxes exist below
conf 0.3) or a wrong-box problem?

Usage: MMDT_PLATFORM=cpu python scripts/diag_student.py \
           [--exp-name convergence-shipped] [--suffix student]
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

from diag_fused_labels import _ap50_from_dets  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--exp-name', default='convergence-shipped')
    p.add_argument('--suffix', default='student')
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--frames', type=int, default=8)
    p.add_argument('--coef', type=int, default=0)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--conf-sweep', default='0.05,0.1,0.2,0.3,0.4,0.5')
    p.add_argument('--dump-frames', type=int, default=2,
                   help='print raw rows for the first N frames')
    args = p.parse_args()

    from convergence import _recalibrate
    from mm_distillnet_tpu.config import default_config
    from mm_distillnet_tpu.data.loader import collate
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    from mm_distillnet_tpu.distill.train_step import TrainState
    from mm_distillnet_tpu.distill.pseudo_labels import teacher_detections
    from mm_distillnet_tpu.train.trainer import distill_config_from
    from mm_distillnet_tpu.train.checkpoint import load_student_params
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
        compute_dtype=args.dtype,
        use_rgb='True', use_thermal='True', use_depth='True',
        use_audio='False', teacher='YetAnotherEfficientDet_D2',
        student='YetAnotherEfficientDet_D2',
        saved_path=os.path.join(args.exp_name, 'trained_models'),
        exp_name=os.path.join(args.exp_name, args.suffix))

    dataset = SyntheticMultimodal(cfg, 'train')
    vcd = dataset.valid_classes_dict
    s_module, s_vars = load_model('YetAnotherEfficientDet_D2', cfg,
                                  'audio_student')
    restored = load_student_params(cfg, 0, 'checkpoint')
    if restored is None:
        restored = load_student_params(cfg, 0, 'best')
    assert restored is not None
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=restored['params'],
                       batch_stats=restored['batch_stats'], opt_state=None)
    variables = _recalibrate(s_module, state, dataset, 'audio', args.frames)

    nc = s_module.num_classes
    class_valid = jnp.asarray(class_validity_table(
        nc, valid_prediction_ids(vcd)))
    p2l = jnp.asarray(prediction_to_label_lut(vcd, nc))
    anchors = jnp.asarray(anchor_table(args.size))

    samples = [dataset[i] for i in range(len(dataset.ids))]
    batch = collate(samples, 16)
    gt_lists = []
    for img_labels in np.asarray(batch['label']):
        gt_lists.append([r.tolist() for r in img_labels if r[4] != -1])

    out = s_module.apply(variables, jnp.asarray(batch['audio']), train=False)
    cls_probs = np.asarray(out.classification, np.float32)
    report = {'max_prob_overall': float(cls_probs.max()),
              'n_gt': sum(len(g) for g in gt_lists), 'sweep': {}}

    for conf in [float(c) for c in args.conf_sweep.split(',')]:
        dcfg = distill_config_from(cfg, args.size).pl._replace(
            conf_threshold=conf)
        dets = teacher_detections(out.classification, out.regression,
                                  anchors, class_valid, dcfg)
        rows = np.asarray(detections_to_labels(dets, p2l, args.size,
                                               include_scores=True))
        preds = [[r.tolist() for r in img if r[5] != -1] for img in rows]
        n_pred = sum(len(pr) for pr in preds)
        report['sweep'][f'conf={conf}'] = {
            'ap50_vs_gt': round(_ap50_from_dets(preds, gt_lists), 2),
            'boxes': n_pred}
        if conf == 0.05:
            for i in range(min(args.dump_frames, len(preds))):
                report[f'frame{i}_student'] = [
                    [round(v, 1) for v in r] for r in preds[i][:8]]
                report[f'frame{i}_gt'] = [
                    [round(v, 1) for v in r] for r in gt_lists[i]]

    print(json.dumps(report, indent=1))


if __name__ == '__main__':
    main()
