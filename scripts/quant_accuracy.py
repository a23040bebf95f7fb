#!/usr/bin/env python
"""int8 PTQ accuracy A/B: AP@0.5 of the fp forward vs quant_inference=True
through the PUBLIC evaluation driver, on a trained synthetic checkpoint.

VERDICT round 3 item 2: the quantization path needs a recorded accuracy
delta, not just a throughput claim. The checkpoint is the 256px synthetic
rgb teacher the shipped-recipe convergence harness trains
(convergence-shipped/trained_models/yet-another-efficientdet-d2-rgb.pth,
AP@0.5 = 62.07 fp at 600 epochs) — a real converged detector, so the AP
delta measures what int8 does to a working model rather than to random
noise.

Usage:  python scripts/quant_accuracy.py          (TPU)
        MMDT_PLATFORM=cpu python scripts/quant_accuracy.py
Prints one JSON line {ap50_fp, ap50_int8, delta}.
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
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('MMDT_COMPILE_CACHE',
                                 os.path.expanduser('~/.cache/mmdt_xla')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--exp-name', default='convergence-shipped')
    p.add_argument('--modality', default='rgb')
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--frames', type=int, default=8)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--coef', type=int, default=0)
    args = p.parse_args(argv)

    from mm_distillnet_tpu.config import default_config
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    from mm_distillnet_tpu.evaluation import evaluate
    from mm_distillnet_tpu.models.registry import load_model

    saved = os.path.join(args.exp_name, 'trained_models')
    base = dict(dataset='Synthetic', image_size=args.size,
                synthetic_size=args.frames, batch_size=args.batch,
                num_workers=1, use_labels=True,
                student_modality=args.modality, student_input=args.modality,
                compound_coef=args.coef,
                max_gt=16, nms_candidates=128, max_det_per_teacher=16,
                max_detections=32, conf_threshold=0.3, nms_threshold=0.5,
                compute_dtype='float32', rank=0, fast_run=False,
                use_rgb=True, use_thermal=False, use_depth=False,
                saved_path=saved, seed=24)

    results = {}
    for leg, quant in (('fp', False), ('int8', True)):
        cfg = default_config(**{k: str(v) for k, v in dict(
            base, quant_inference=quant,
            exp_name=f'{args.exp_name}/quant-ab-{leg}').items()})
        model = load_model('YetAnotherEfficientDet_D2', cfg, args.modality)
        eval_set = SyntheticMultimodal(cfg, 'train')
        ap = evaluate({args.modality: model}, model, eval_set, cfg)
        results[f'ap50_{leg}'] = round(float(ap['AP@0.5'].iloc[0]), 2)
        print(f'[quant-ab] {leg}: AP@0.5 = {results[f"ap50_{leg}"]}',
              file=sys.stderr)

    results['delta'] = round(results['ap50_int8'] - results['ap50_fp'], 2)
    results['checkpoint'] = os.path.join(
        saved, f'yet-another-efficientdet-d2-{args.modality}.pth')
    print(json.dumps(results))


if __name__ == '__main__':
    main()
