#!/usr/bin/env python
"""Convergence proof: the distillation loop learns to detect.

The container cannot reproduce the reference's headline 84.29 mAP@0.5 (the
113k-frame Freiburg dataset is not redistributable), so this is the closest
available capability proof (reference acceptance test: evaluate() over real
data, reference src/utils/utils.py:2018-2181):

  Phase A  supervised-overfit an RGB-input EfficientDet on the synthetic
           planted-rectangle frames (train_method=traditional +
           use_labels=True: the reference's ModelWithLoss GT branch,
           train_methods.py:557-558) and show AP@0.5 reaches a high value
           -> the trainer + focal loss + post-processing learn.

  Phase B  freeze that model as the RGB teacher and distill a from-scratch
           8-channel audio student through the REAL pipeline
           (traditional_nms: teacher forward -> on-device decode/NMS
           pseudo-labels -> focal + MTA) and show the student's AP@0.5
           rises from random (~0) to a substantial level
           -> the distillation loop transfers detection capability.

Both phases run through the public trainer (mm_distillnet_tpu.train.trainer
.train) and evaluator, not a bespoke loop. Run on TPU (default) or CPU:

    python scripts/convergence.py --size 256 --epochs-a 400 --epochs-b 800
    MMDT_PLATFORM=cpu python scripts/convergence.py --size 128 ...

Prints one JSON line with the AP@0.5 numbers (teacher vs GT, student vs GT
before/after, student vs the teacher's own pseudo-labels).

Measurement notes (from debugging this proof):
- --size must be >= 256: the planted boxes only reach anchor IoU >= 0.5
  from ~256px up (at 128 only 73% of GTs are assignable, capping AP);
- --batch should equal --frames (full-batch steps): with sub-population
  batches the net can overfit per-batch BN statistics that population
  (eval-mode) stats cannot reproduce, deflating eval AP even after exact
  BN recalibration — at batch 4/8 frames the phase-A teacher evaluated at
  6 AP; at batch 8 the same budget reached 58.
"""
from __future__ import annotations

import argparse
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


def _config(args, **over):
    from mm_distillnet_tpu.config import default_config
    base = dict(
        image_size=args.size, synthetic_size=args.frames,
        batch_size=args.batch, num_workers=1, resume=False,
        val_interval=10 ** 6, es_patience=10 ** 6,   # no mid-run val/ckpt
        optimizer='Adam', lr=args.lr, scheduler='StepLR',
        step_size=args.step_size, gamma=args.gamma,
        max_gt=16, nms_candidates=128, max_det_per_teacher=16,
        max_detections=32, conf_threshold=0.3, nms_threshold=0.5,
        compute_dtype='float32', rank=0, fast_run=False,
        use_rgb=True, use_thermal=False, use_depth=False,
        exp_name=args.exp_name)
    base.update(over)
    return default_config(**base)


def _ap50(teachers, model, dataset, config):
    from mm_distillnet_tpu.evaluation import evaluate
    ap = evaluate(teachers, model, dataset, config)
    return float(ap['AP@0.5'].iloc[0])


def _recalibrate(model, state, dataset, input_key, batch, sweeps=4):
    """Short training runs leave BN running stats blended with their random
    init (they converge at 0.99/step), which collapses the eval-mode
    forward; re-estimate them exactly from the data before evaluating
    (train/bn_recalibration.py)."""
    from mm_distillnet_tpu.data.loader import collate
    from mm_distillnet_tpu.train.bn_recalibration import \
        recalibrate_batch_stats

    from mm_distillnet_tpu.ops.resize import maybe_stretch_mel_axis

    n = len(dataset.ids)
    size = dataset.image_size
    batches = []
    for _ in range(sweeps):
        for start in range(0, n - batch + 1, batch):
            samples = [dataset[i] for i in range(start, start + batch)]
            x = jnp.asarray(collate(samples, 16)[input_key])
            if x.shape[-3] != size:
                # compact audio ingest: BN stats must be estimated on what
                # the model actually sees — the stretched input
                x = maybe_stretch_mel_axis(x, size)
            batches.append(x)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    return recalibrate_batch_stats(model, variables, batches)


def _mk(seed, ch, size, coef):
    from mm_distillnet_tpu.models.efficientdet import EfficientDet
    m = EfficientDet(num_classes=20, compound_coef=coef, dtype=jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(seed),
                        jnp.zeros((1, size, size, ch)))
    return m, v


def run(args):
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    from mm_distillnet_tpu.train.trainer import train

    # ---------- phase A: supervised RGB "teacher" ----------
    cfg_a = _config(args, num_epoches=args.epochs_a, use_labels=True,
                    student_input='rgb', kd_loss='None',
                    train_method='traditional',
                    exp_name=f'{args.exp_name}/teacher')
    train_set = SyntheticMultimodal(cfg_a, 'train')
    eval_set = SyntheticMultimodal(cfg_a, 'train')   # capability: overfit AP
    teacher = _mk(1, 3, args.size, args.coef)
    state = train({}, teacher, cfg_a, train_set, None)
    teacher = (teacher[0],
               _recalibrate(teacher[0], state, train_set, 'rgb', args.batch))
    teacher_ap = _ap50({'rgb': teacher}, teacher, eval_set, cfg_a)
    print(f'[convergence] phase A teacher AP@0.5 = {teacher_ap:.2f}',
          file=sys.stderr)

    # ---------- phase B: distill the audio student ----------
    cfg_b = _config(args, num_epoches=args.epochs_b, use_labels=False,
                    student_input='audio', kd_loss='MTALoss',
                    train_method='traditional_nms', w_kd=0.005,
                    exp_name=f'{args.exp_name}/student')
    student = _mk(9, 8, args.size, args.coef)
    cfg_eval = _config(args, num_epoches=0, use_labels=True,
                       student_input='audio',
                       exp_name=f'{args.exp_name}/student')
    student_ap_before = _ap50({'rgb': teacher}, student, eval_set, cfg_eval)
    print(f'[convergence] phase B student AP@0.5 before = '
          f'{student_ap_before:.2f}', file=sys.stderr)

    state = train({'rgb': teacher}, student, cfg_b,
                  SyntheticMultimodal(cfg_b, 'train'), None)
    student = (student[0],
               _recalibrate(student[0], state, train_set, 'audio',
                            args.batch))
    student_ap_after = _ap50({'rgb': teacher}, student, eval_set, cfg_eval)
    print(f'[convergence] phase B student AP@0.5 after = '
          f'{student_ap_after:.2f}', file=sys.stderr)

    # transfer fidelity: student scored against the teacher's own fused
    # pseudo-labels (the reference's eval paradigm when GT is withheld) —
    # separates "distillation transferred the teacher's behavior" from
    # "the teacher's behavior itself is imperfect vs GT"
    cfg_vs_teacher = _config(args, num_epoches=0, use_labels=False,
                             student_input='audio',
                             exp_name=f'{args.exp_name}/student-vs-teacher')
    student_vs_teacher = _ap50({'rgb': teacher}, student, eval_set,
                               cfg_vs_teacher)
    print(f'[convergence] phase B student-vs-teacher-labels AP@0.5 = '
          f'{student_vs_teacher:.2f}', file=sys.stderr)

    result = {
        'teacher_ap50': round(teacher_ap, 2),
        'student_ap50_before': round(student_ap_before, 2),
        'student_ap50_after': round(student_ap_after, 2),
        'student_vs_teacher_ap50': round(student_vs_teacher, 2),
        'size': args.size, 'frames': args.frames, 'coef': args.coef,
        'epochs_a': args.epochs_a, 'epochs_b': args.epochs_b,
    }
    print(json.dumps(result))
    return result


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    # Defaults are the MEASURED-to-converge recipe (BENCH_NOTES.md
    # "Convergence proof"): overfit-AP is thresholdy — the phase-B student
    # must reach cls-loss ~0.3 on the planted frames before eval-mode AP
    # lights up (at cls ~2.0, AP stays ~1). A 400/800-epoch run with gamma
    # 0.5 measured AP 0.9; this 600/1000 recipe with gamma 0.3 measured
    # teacher 62.1 / student 40.5.
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--frames', type=int, default=8)
    p.add_argument('--batch', type=int, default=8,
                   help='keep equal to --frames (full-batch BN, see notes)')
    p.add_argument('--coef', type=int, default=0,
                   help='EfficientDet compound coefficient')
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--step-size', type=int, default=300,
                   help='StepLR decay interval in epochs')
    p.add_argument('--gamma', type=float, default=0.3,
                   help='StepLR decay factor')
    p.add_argument('--epochs-a', type=int, default=600)
    p.add_argument('--epochs-b', type=int, default=1000)
    p.add_argument('--exp-name', default='convergence-run')
    return p.parse_args(argv)


if __name__ == '__main__':
    run(parse_args())
