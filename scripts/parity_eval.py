#!/usr/bin/env python
"""Turnkey real-data parity harness vs the PyTorch reference.

The north-star quality claim (BASELINE.md / SURVEY.md section 6) is
mAP@0.5 = 84.29 +- 0.5 on the Freiburg multimodal test split, from the
reference's shipped checkpoints (reference README.md:93). The dataset and
the trained .pth files are not in this container, so the claim cannot be
*run* here — this script packages everything so it runs the moment the
assets exist (VERDICT round 3, missing item 1):

  1. point it at the dataset root and a directory with the 4 reference
     checkpoints (yet-another-efficientdet-d2-{rgb,thermal,depth}.pth +
     mm-distillnet.0.pth.tar);
  2. it runs OUR evaluate.py (the .pth files convert on load through
     convert/torch_weights.py — the same converter the round-trip test
     pins);
  3. reference numbers come from (a) `--reference_results results.csv`
     produced by the reference's evaluate.py (run it wherever torch+CUDA
     exist: `python /root/reference/evaluate.py --config_file <cfg>
     --checkpoint <pth>`), or (b) `--run_reference` to launch it here
     (torch-CPU: ~days at 113k frames; only sane with --max_frames), or
     (c) the published README table as fallback;
  4. it diffs AP@0.5 / AP@0.75 / AP@Ave / CDx / CDy and verdicts at
     +-0.5 AP@0.5 (the BASELINE.md band).

Dry run on synthetic data (no assets needed; exercised by
tests/test_parity_eval.py):

    python scripts/parity_eval.py --synthetic \
        --reference_results /tmp/fabricated_results.csv
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_DIR = os.path.dirname(SCRIPTS_DIR)

PUBLISHED = {  # reference README.md:93 (MM-DistillNet, KD rgb+thermal+depth)
    'AP@Ave': 61.62, 'AP@0.5': 84.29, 'AP@0.75': 59.66,
    'CDx': 1.27, 'CDy': 0.69,
}
METRICS = list(PUBLISHED)
AP50_BAND = 0.5  # BASELINE.md: mAP@0.5 within 0.5 pt


def _read_results_csv(path: str):
    """Both sides write the same schema: a CSV with one row per testing
    point and columns including AP@0.5/AP@0.75/AP@Ave/CDx/CDy (ours:
    evaluation.py results.{rank}.csv; reference: utils.py:2177-2180)."""
    import pandas as pd
    df = pd.read_csv(path)
    row = df.iloc[-1]  # 'ALL' fusion is the last/only testing point
    return {m: float(row[m]) for m in METRICS if m in df.columns}


def run_ours(args) -> str:
    over = {}
    if args.data_path:
        over['data_path'] = args.data_path
    if args.checkpoints:
        over['saved_path'] = args.checkpoints
    over['exp_name'] = args.exp_name
    if args.synthetic:
        over.update(dataset='Synthetic', synthetic_size='8',
                    image_size='128', batch_size='4', num_workers='1',
                    use_thermal='True', use_depth='True',
                    compound_coef='0', max_gt='16', nms_candidates='128',
                    max_det_per_teacher='16', max_detections='32',
                    fast_run='False')
    cmd = [sys.executable, os.path.join(REPO_DIR, 'evaluate.py'),
           '--config_file', args.config_file,
           '--overwrite', json.dumps(over)]
    student_ckpt = args.student_checkpoint
    if not student_ckpt and args.checkpoints:
        cand = os.path.join(args.checkpoints, 'mm-distillnet.0.pth.tar')
        if os.path.exists(cand):
            student_ckpt = cand
    if student_ckpt:
        cmd += ['--checkpoint', student_ckpt]
    print('[parity] ours:', ' '.join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, cwd=REPO_DIR)
    return os.path.join(REPO_DIR, args.exp_name, 'results.0.csv')


def run_reference(args) -> str:
    """Launch the reference evaluate.py (requires torch; CPU is ~days at
    full scale — pass --max_frames-limited configs)."""
    ref = args.reference_dir
    cmd = [sys.executable, os.path.join(ref, 'evaluate.py'),
           '--config_file', args.reference_config or
           os.path.join(ref, 'configs', 'mm-distillnet.cfg')]
    if args.student_checkpoint:
        cmd += ['--checkpoint', args.student_checkpoint]
    print('[parity] reference:', ' '.join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, cwd=ref)
    return os.path.join(ref, 'results.0.csv')


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--data_path', default=None,
                   help='Freiburg multimodal dataset root')
    p.add_argument('--checkpoints', default=None,
                   help='dir with the 4 reference .pth files')
    p.add_argument('--student_checkpoint', default=None)
    p.add_argument('--config_file',
                   default=os.path.join(REPO_DIR, 'configs',
                                        'mm-distillnet.cfg'))
    p.add_argument('--reference_results', default=None,
                   help='results.csv produced by the reference evaluate.py')
    p.add_argument('--run_reference', action='store_true')
    p.add_argument('--reference_dir', default='/root/reference')
    p.add_argument('--reference_config', default=None)
    p.add_argument('--synthetic', action='store_true',
                   help='dry run on the synthetic dataset')
    p.add_argument('--exp_name', default='parity-eval')
    p.add_argument('--out', default=None)
    args = p.parse_args(argv)
    if args.synthetic and \
            args.config_file.endswith('mm-distillnet.cfg'):
        args.config_file = os.path.join(REPO_DIR, 'configs',
                                        'synthetic-tiny.cfg')

    ours_csv = run_ours(args)
    ours = _read_results_csv(ours_csv)

    if args.reference_results:
        ref = _read_results_csv(args.reference_results)
        ref_source = args.reference_results
    elif args.run_reference:
        ref = _read_results_csv(run_reference(args))
        ref_source = 'reference evaluate.py (run here)'
    else:
        ref = dict(PUBLISHED)
        ref_source = 'published README.md:93 table'

    diff = {m: round(ours.get(m, float('nan')) - ref[m], 2)
            for m in METRICS if m in ref}
    ap50_ok = abs(diff.get('AP@0.5', float('inf'))) <= AP50_BAND
    report = {'ours': ours, 'reference': ref, 'diff': diff,
              'reference_source': ref_source,
              'ap50_within_band': bool(ap50_ok), 'band': AP50_BAND}
    out = args.out or os.path.join(REPO_DIR, args.exp_name,
                                   'parity_report.json')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0 if ap50_ok else 4


if __name__ == '__main__':
    sys.exit(main())
