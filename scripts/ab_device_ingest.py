#!/usr/bin/env python
"""A/B the compact audio device-ingest on the PUBLIC train.py CLI.

VERDICT round-4 item 3: `device_audio_resize` (ship (80, T, M) audio,
stretch the mel axis on-device) is numerics-pinned but had no TPU
wall-clock measurement. This drives train.py twice at the recipe point
(D2 @768, traditional_nms_augmented, bf16) with the flag off/on and
reports steady-state epoch wall time (epochs after the compile epochs),
plus the per-epoch infeed byte estimate for context.

Run on TPU:  python scripts/ab_device_ingest.py
Options:     AB_EPOCHS=5 AB_BATCH=8 AB_FRAMES=16 AB_SIZE=768 AB_COEF=2
Prints one JSON line per leg + a markdown table for BENCH_NOTES.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_DIR = os.path.dirname(SCRIPTS_DIR)

EPOCHS = int(os.environ.get('AB_EPOCHS', '5'))
BATCH = int(os.environ.get('AB_BATCH', '8'))
FRAMES = int(os.environ.get('AB_FRAMES', '16'))
SIZE = int(os.environ.get('AB_SIZE', '768'))
COEF = int(os.environ.get('AB_COEF', '2'))


def run_leg(device_audio_resize: bool) -> dict:
    tag = 'on' if device_audio_resize else 'off'
    exp = f'ab-ingest-{tag}'
    over = {
        'image_size': str(SIZE), 'batch_size': str(BATCH),
        'synthetic_size': str(FRAMES), 'num_epoches': str(EPOCHS),
        'compound_coef': str(COEF), 'compute_dtype': 'bfloat16',
        'fast_run': 'False', 'resume': 'False', 'num_workers': '1',
        'train_method': 'traditional_nms_augmented',
        'device_audio_resize': str(device_audio_resize),
        'val_interval': '1000000', 'es_patience': '1000000',
        'exp_name': exp,
    }
    cmd = [sys.executable, os.path.join(REPO_DIR, 'train.py'),
           '--config_file',
           os.path.join(REPO_DIR, 'configs', 'synthetic-tiny.cfg'),
           '--overwrite', json.dumps(over)]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO_DIR, capture_output=True, text=True)
    wall = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f'leg {tag} failed rc={proc.returncode}')
    # epoch wall times from the per-rank log
    log_path = os.path.join(REPO_DIR, exp, f'{exp}.0.log')
    epochs = []
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                m = re.search(r'epoch (\d+) took ([0-9.]+)s', line)
                if m:
                    epochs.append(float(m.group(2)))
    steady = epochs[2:] if len(epochs) > 2 else epochs
    row = {
        'device_audio_resize': device_audio_resize,
        'total_wall_s': round(wall, 1),
        'epoch_walls_s': epochs,
        'steady_state_epoch_s': round(sum(steady) / max(1, len(steady)), 2),
        'epochs': EPOCHS, 'batch': BATCH, 'frames': FRAMES, 'size': SIZE,
        'coef': COEF,
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = [run_leg(False), run_leg(True)]
    print('\n| device_audio_resize | steady-state epoch (s) | all epochs |')
    print('|---|---|---|')
    for r in rows:
        print(f"| {r['device_audio_resize']} | {r['steady_state_epoch_s']} "
              f"| {[round(e, 1) for e in r['epoch_walls_s']]} |")


if __name__ == '__main__':
    main()
