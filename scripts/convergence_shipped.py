#!/usr/bin/env python
"""Convergence proof of the SHIPPED recipe: 3 teachers fused by cross-teacher
NMS, train_method=traditional_nms_augmented, bf16 compute, driven through the
PUBLIC train.py CLI.

The round-2 proof (scripts/convergence.py) showed a 1-teacher fp32
`traditional_nms` slice learns. This harness proves the flagship path the
reference actually ships (`configs/mm-distillnet.cfg:87`,
ModelWithNMSLossAugmented, reference train_methods.py:265-422):

  Stage "teachers"  supervised-overfit THREE teachers (rgb 3ch, thermal 1ch,
                    depth 3ch) on the synthetic planted-rectangle frames via
                    the public trainer; BN-recalibrate; save each as an
                    orbax checkpoint under the registry's canonical name
                    (trained_models/yet-another-efficientdet-d2-<m>.pth) so
                    the public CLIs load them; record AP@0.5 vs GT.

  Stage "train"     run `python train.py --config_file <cfg> --overwrite ...`
                    — the real entry point — which loads the 3 teachers via
                    the registry, builds the from-scratch 8-channel audio
                    student, and distills with traditional_nms_augmented at
                    the build's default bf16 compute (and optionally a
                    traditional_nms_kdlist_augmented run).

  Stage "eval"      reload the trained student checkpoint, re-estimate BN
                    running stats, and score AP@0.5 vs GT and vs the
                    3-teacher fused pseudo-labels.

  Stage "all"       orchestrate the stages as SEQUENTIAL subprocesses (the
                    single TPU chip admits one client at a time; the parent
                    never initializes a backend) and assemble the JSON.

Run on TPU:    python scripts/convergence_shipped.py
Smoke on CPU:  MMDT_PLATFORM=cpu python scripts/convergence_shipped.py \
                   --size 128 --epochs-a 2 --epochs-b 4 --val-interval 2

Success bar (VERDICT round 2 item 1): student AP@0.5 vs GT >= 35 — the same
band as the 1-teacher proof (40.5).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_DIR = os.path.dirname(SCRIPTS_DIR)
sys.path.insert(0, REPO_DIR)
sys.path.insert(0, SCRIPTS_DIR)

TEACHER_MODALITIES = {'rgb': 3, 'thermal': 1, 'depth': 3}
CKPT_NAMES = {m: f'yet-another-efficientdet-d2-{m}.pth'
              for m in TEACHER_MODALITIES}


def _base_overrides(args, **over):
    """Config dict shared by every stage (the measured-to-converge recipe of
    scripts/convergence.py, which BENCH_NOTES.md documents as thresholdy:
    full-batch steps, StepLR 300/0.3, budget >= 600/1000 epochs)."""
    base = dict(
        dataset='Synthetic', image_size=args.size,
        synthetic_size=args.frames, batch_size=args.batch, num_workers=1,
        resume=False, es_patience=10 ** 9,
        optimizer='Adam', lr=args.lr, scheduler='StepLR',
        step_size=args.step_size, gamma=args.gamma,
        max_gt=16, nms_candidates=128, max_det_per_teacher=16,
        max_detections=32, conf_threshold=0.3, nms_threshold=0.5,
        compound_coef=args.coef, rank=0, fast_run=False,
        use_rgb=True, use_thermal=True, use_depth=True, use_audio=False,
        saved_path=os.path.join(args.exp_name, 'trained_models'),
        teacher='YetAnotherEfficientDet_D2',
        student='YetAnotherEfficientDet_D2',
        seed=24)
    if args.device_audio_resize:
        # compact audio ingest: loader ships (80, S, M) time-stretched
        # stacks; the compiled step stretches the mel axis on-device
        # (ops/resize.stretch_mel_axis) — 9.6x fewer audio infeed bytes.
        base['device_audio_resize'] = True
    base.update(over)
    return base


# --------------------------------------------------------------------------
# Stage: teachers
# --------------------------------------------------------------------------

def stage_teachers(args):
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from convergence import _ap50, _config, _mk, _recalibrate
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    from mm_distillnet_tpu.train.trainer import train

    os.makedirs(os.path.join(args.exp_name, 'trained_models'), exist_ok=True)
    # Resumable across relay hangs: a modality whose checkpoint exists AND
    # whose AP is already recorded in teachers.json is skipped on rerun.
    teachers_json = os.path.join(args.exp_name, 'teachers.json')
    teacher_ap = {}
    if os.path.exists(teachers_json):
        with open(teachers_json) as f:
            teacher_ap = json.load(f)
    for modality, ch in TEACHER_MODALITIES.items():
        done_path = os.path.join(args.exp_name, 'trained_models',
                                 CKPT_NAMES[modality])
        if modality in teacher_ap and os.path.exists(done_path):
            print(f'[shipped] teacher {modality} already trained '
                  f'(AP@0.5 = {teacher_ap[modality]}), skipping',
                  file=sys.stderr)
            continue
        cfg = _config(args, num_epoches=args.epochs_a, use_labels=True,
                      student_input=modality, kd_loss='None',
                      train_method='traditional',
                      exp_name=f'{args.exp_name}/teacher-{modality}')
        train_set = SyntheticMultimodal(cfg, 'train')
        teacher = _mk({'rgb': 1, 'thermal': 2, 'depth': 3}[modality], ch,
                      args.size, args.coef)
        state = train({}, teacher, cfg, train_set, None)
        variables = _recalibrate(teacher[0], state, train_set, modality,
                                 args.batch)
        teacher = (teacher[0], variables)
        ap = _ap50({modality: teacher}, teacher, train_set, cfg)
        teacher_ap[modality] = round(ap, 2)
        print(f'[shipped] teacher {modality} AP@0.5 = {ap:.2f}',
              file=sys.stderr)

        path = os.path.abspath(os.path.join(
            args.exp_name, 'trained_models', CKPT_NAMES[modality]))
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {
            'params': jax.tree_util.tree_map(lambda x: jnp.asarray(x),
                                             variables['params']),
            'batch_stats': jax.tree_util.tree_map(
                lambda x: jnp.asarray(x), variables['batch_stats'])})
        ckptr.wait_until_finished()
        with open(teachers_json, 'w') as f:
            json.dump(teacher_ap, f)

    print(json.dumps({'teacher_ap50': teacher_ap}))


# --------------------------------------------------------------------------
# Stage: teachers-continue (sharpen score calibration before distilling)
# --------------------------------------------------------------------------

def stage_teachers_continue(args):
    """Continue each trained teacher for --epochs-a2 more at --lr-a2.

    Why: the round-3 recorded runs landed the student at ~19.5 AP@0.5 vs GT
    with teachers at 62-72 — and scripts/diag_teacher_continue.py measured
    the cause as teacher score CALIBRATION, not the distillation path:
    +400 epochs at lr 3e-4 takes the rgb teacher from 61.6 to 99.8 AP@0.5
    vs GT (TP score mean 0.47 -> 0.87). Miscalibrated teachers emit
    pseudo-labels that straddle the 0.3 conf threshold (reference
    utils.py:1783, same threshold here), so the fused labels the student
    distills from are noisy/truncated. This stage sharpens the teachers
    and OVERWRITES their registry checkpoints; resumable via the
    '<modality>_cont' keys in teachers.json.
    """
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from convergence import _ap50, _config, _recalibrate
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    from mm_distillnet_tpu.models.registry import load_model
    from mm_distillnet_tpu.train.trainer import train

    teachers_json = os.path.join(args.exp_name, 'teachers.json')
    with open(teachers_json) as f:
        teacher_ap = json.load(f)
    for modality in TEACHER_MODALITIES:
        key = f'{modality}_cont'
        if key in teacher_ap:
            print(f'[shipped] teacher {modality} already continued '
                  f'(AP@0.5 = {teacher_ap[key]}), skipping', file=sys.stderr)
            continue
        cfg = _config(args, num_epoches=args.epochs_a2, lr=args.lr_a2,
                      step_size=200, gamma=0.3, use_labels=True,
                      student_input=modality, kd_loss='None',
                      train_method='traditional', use_thermal=True,
                      use_depth=True, dataset='Synthetic',
                      saved_path=os.path.join(args.exp_name,
                                              'trained_models'),
                      teacher='YetAnotherEfficientDet_D2',
                      student='YetAnotherEfficientDet_D2',
                      compound_coef=args.coef, seed=24,
                      exp_name=f'{args.exp_name}/teacher-{modality}-cont')
        train_set = SyntheticMultimodal(cfg, 'train')
        # resume from the stage-"teachers" checkpoint via the registry —
        # the exact load path train.py itself uses
        module, variables = load_model('YetAnotherEfficientDet_D2', cfg,
                                       modality)
        state = train({}, (module, variables), cfg, train_set, None)
        variables = _recalibrate(module, state, train_set, modality,
                                 args.batch)
        ap = _ap50({modality: (module, variables)}, (module, variables),
                   train_set, cfg)
        teacher_ap[key] = round(ap, 2)
        print(f'[shipped] teacher {modality} continued: AP@0.5 '
              f'{teacher_ap[modality]} -> {ap:.2f}', file=sys.stderr)

        path = os.path.abspath(os.path.join(
            args.exp_name, 'trained_models', CKPT_NAMES[modality]))
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {
            'params': jax.tree_util.tree_map(lambda x: jnp.asarray(x),
                                             variables['params']),
            'batch_stats': jax.tree_util.tree_map(
                lambda x: jnp.asarray(x), variables['batch_stats'])})
        ckptr.wait_until_finished()
        with open(teachers_json, 'w') as f:
            json.dump(teacher_ap, f)

    print(json.dumps({'teacher_ap50': teacher_ap}))


# --------------------------------------------------------------------------
# Stage: train (through the public CLI; called as a subprocess by 'all')
# --------------------------------------------------------------------------

def _train_cli_cmd(args, method: str, exp_suffix: str):
    over = _base_overrides(
        args,
        num_epoches=args.epochs_b,
        train_method=method,
        compute_dtype=args.dtype,
        # resume is a no-op on a fresh run (restore_checkpoint returns
        # identity when no checkpoint exists) but lets a relay-killed
        # student run pick up from the last val-epoch checkpoint
        # instead of restarting all of epochs_b.
        resume=True,
        # checkpoints are written on validation epochs; validate a few
        # times so 'checkpoint.0' exists for the eval stage without
        # paying per-epoch eval cost
        val_interval=args.val_interval,
        exp_name=f'{args.exp_name}/{exp_suffix}')
    cmd = [sys.executable, os.path.join(REPO_DIR, 'train.py'),
           '--config_file',
           os.path.join(REPO_DIR, 'configs', 'synthetic-tiny.cfg'),
           '--overwrite', json.dumps({k: str(v) for k, v in over.items()})]
    return cmd


# --------------------------------------------------------------------------
# Stage: eval
# --------------------------------------------------------------------------

def stage_eval(args, exp_suffix: str = 'student'):
    import jax
    import jax.numpy as jnp

    from convergence import _ap50, _config, _mk, _recalibrate
    from mm_distillnet_tpu.config import default_config
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    from mm_distillnet_tpu.models.registry import load_model
    from mm_distillnet_tpu.train.checkpoint import load_student_params
    from mm_distillnet_tpu.distill.train_step import TrainState

    cfg_run = default_config(**{
        k: str(v) for k, v in _base_overrides(
            args, num_epoches=0, compute_dtype=args.dtype,
            exp_name=f'{args.exp_name}/{exp_suffix}').items()})

    # teachers back through the registry (the same path train.py used)
    teachers = {m: load_model('YetAnotherEfficientDet_D2', cfg_run, m)
                for m in TEACHER_MODALITIES}

    # student: module from the registry; params from the run's checkpoint
    s_module, s_vars = load_model('YetAnotherEfficientDet_D2', cfg_run,
                                  'audio_student')
    restored = load_student_params(cfg_run, 0, 'checkpoint')
    if restored is None:
        restored = load_student_params(cfg_run, 0, 'best')
    assert restored is not None, \
        f'no checkpoint under {cfg_run.get("exp_name")}'

    eval_set = SyntheticMultimodal(cfg_run, 'train')

    # before-training baseline: the random-init student
    cfg_gt = _config(args, num_epoches=0, use_labels=True,
                     student_input='audio', compound_coef=args.coef,
                     compute_dtype=args.dtype, use_thermal=True,
                     use_depth=True, dataset='Synthetic',
                     exp_name=f'{args.exp_name}/{exp_suffix}-eval')
    before = _ap50(teachers, (s_module, s_vars), eval_set, cfg_gt)
    print(f'[shipped] student AP@0.5 before = {before:.2f}', file=sys.stderr)

    # BN re-estimation on the training frames (train/bn_recalibration.py;
    # see BENCH_NOTES.md measurement notes) then score the trained student
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=restored['params'],
                       batch_stats=restored['batch_stats'], opt_state=None)
    variables = _recalibrate(s_module, state, eval_set, 'audio', args.batch)
    student = (s_module, variables)
    after = _ap50(teachers, student, eval_set, cfg_gt)
    print(f'[shipped] student AP@0.5 after = {after:.2f}', file=sys.stderr)

    cfg_vs_teacher = _config(args, num_epoches=0, use_labels=False,
                             student_input='audio', compound_coef=args.coef,
                             compute_dtype=args.dtype, use_thermal=True,
                             use_depth=True, dataset='Synthetic',
                             exp_name=f'{args.exp_name}/{exp_suffix}-vs-t')
    vs_teacher = _ap50(teachers, student, eval_set, cfg_vs_teacher)
    print(f'[shipped] student-vs-fused-teacher-labels AP@0.5 = '
          f'{vs_teacher:.2f}', file=sys.stderr)

    result = {'student_ap50_before': round(before, 2),
              'student_ap50_after': round(after, 2),
              'student_vs_teacher_ap50': round(vs_teacher, 2)}
    with open(os.path.join(args.exp_name, f'{exp_suffix}-eval.json'),
              'w') as f:
        json.dump(result, f)
    print(json.dumps(result))


# --------------------------------------------------------------------------
# Stage: all (sequential subprocesses; parent never touches the TPU)
# --------------------------------------------------------------------------

def _run(cmd, log_path):
    print('[shipped] run:', ' '.join(cmd), '->', log_path, file=sys.stderr)
    with open(log_path, 'w') as log:
        rc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                            cwd=REPO_DIR).returncode
    if rc != 0:
        with open(log_path) as log:
            tail = ''.join(log.readlines()[-30:])
        raise RuntimeError(f'{cmd} failed rc={rc}; log tail:\n{tail}')


def stage_all(args):
    os.makedirs(args.exp_name, exist_ok=True)
    self_cmd = [sys.executable, os.path.join(SCRIPTS_DIR,
                                             'convergence_shipped.py')]
    passthrough = ['--exp-name', args.exp_name, '--size', str(args.size),
                   '--frames', str(args.frames), '--batch', str(args.batch),
                   '--coef', str(args.coef), '--lr', str(args.lr),
                   '--step-size', str(args.step_size),
                   '--gamma', str(args.gamma),
                   '--epochs-a', str(args.epochs_a),
                   '--epochs-a2', str(args.epochs_a2),
                   '--lr-a2', str(args.lr_a2),
                   '--epochs-b', str(args.epochs_b),
                   '--val-interval', str(args.val_interval),
                   '--dtype', args.dtype]
    if args.device_audio_resize:
        passthrough.append('--device-audio-resize')

    _run(self_cmd + ['--stage', 'teachers'] + passthrough,
         os.path.join(args.exp_name, 'teachers.log'))
    if args.epochs_a2 > 0:
        _run(self_cmd + ['--stage', 'teachers-continue'] + passthrough,
             os.path.join(args.exp_name, 'teachers-continue.log'))
    if args.fresh_student:
        import shutil
        for suffix in ('student', 'student-kdlist'):
            d = os.path.join(args.exp_name, suffix)
            if os.path.isdir(d):
                shutil.rmtree(d)
                print(f'[shipped] --fresh-student: removed {d}',
                      file=sys.stderr)
    _run(_train_cli_cmd(args, 'traditional_nms_augmented', 'student'),
         os.path.join(args.exp_name, 'train-augmented.log'))
    _run(self_cmd + ['--stage', 'eval', '--exp-suffix', 'student']
         + passthrough, os.path.join(args.exp_name, 'eval-augmented.log'))
    if args.kdlist:
        _run(_train_cli_cmd(args, 'traditional_nms_kdlist_augmented',
                            'student-kdlist'),
             os.path.join(args.exp_name, 'train-kdlist.log'))
        _run(self_cmd + ['--stage', 'eval', '--exp-suffix', 'student-kdlist']
             + passthrough, os.path.join(args.exp_name, 'eval-kdlist.log'))

    result = {'recipe': 'traditional_nms_augmented 3-teacher '
                        f'{args.dtype} via train.py CLI',
              'size': args.size, 'frames': args.frames,
              'epochs_a': args.epochs_a, 'epochs_a2': args.epochs_a2,
              'epochs_b': args.epochs_b}
    with open(os.path.join(args.exp_name, 'teachers.json')) as f:
        result['teacher_ap50'] = json.load(f)
    with open(os.path.join(args.exp_name, 'student-eval.json')) as f:
        result.update(json.load(f))
    if args.kdlist:
        with open(os.path.join(args.exp_name,
                               'student-kdlist-eval.json')) as f:
            result['kdlist'] = json.load(f)
    with open(os.path.join(args.exp_name, 'result.json'), 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--stage', default='all',
                   choices=['all', 'teachers', 'teachers-continue',
                            'train-cmd', 'eval'])
    p.add_argument('--exp-suffix', default='student')
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--frames', type=int, default=8)
    p.add_argument('--batch', type=int, default=8,
                   help='keep equal to --frames (full-batch BN)')
    p.add_argument('--coef', type=int, default=0)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--step-size', type=int, default=300)
    p.add_argument('--gamma', type=float, default=0.3)
    p.add_argument('--epochs-a', type=int, default=600)
    # calibration-sharpening continuation (diag_teacher_continue.py
    # measurement: +400 @ 3e-4 -> rgb teacher 61.6 -> 99.8 AP@0.5);
    # 0 disables
    p.add_argument('--epochs-a2', type=int, default=400)
    p.add_argument('--lr-a2', type=float, default=3e-4)
    p.add_argument('--fresh-student', action='store_true', default=False,
                   help='delete student run dirs before the train stages '
                        '(use when teachers were re-sharpened)')
    p.add_argument('--epochs-b', type=int, default=1000)
    p.add_argument('--val-interval', type=int, default=250)
    p.add_argument('--dtype', default='bfloat16')
    # kdlist leg is ON by default; only --no-kdlist is meaningful
    p.add_argument('--no-kdlist', dest='kdlist', action='store_false',
                   default=True)
    p.add_argument('--device-audio-resize', action='store_true',
                   default=False,
                   help='compact audio ingest for every stage that ships '
                        'audio (config device_audio_resize=True)')
    p.add_argument('--exp-name', default='convergence-shipped')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.stage == 'teachers':
        stage_teachers(args)
    elif args.stage == 'teachers-continue':
        stage_teachers_continue(args)
    elif args.stage == 'eval':
        stage_eval(args, args.exp_suffix)
    elif args.stage == 'train-cmd':
        print(' '.join(_train_cli_cmd(args, 'traditional_nms_augmented',
                                      'student')))
    else:
        stage_all(args)


if __name__ == '__main__':
    main()
