#!/usr/bin/env python
"""Evaluate a trained student against teacher pseudo-ground-truth.

Public CLI matching the reference (reference evaluate.py:51-170):

    python evaluate.py --config_file <cfg> [--checkpoint <ckpt>] \
        [--overwrite JSON] [--just_plot ID]
"""
from __future__ import annotations

import argparse
import logging

import os as _os
if _os.environ.get('MMDT_PLATFORM'):
    import jax as _jax
    _jax.config.update('jax_platforms', _os.environ['MMDT_PLATFORM'])


# Persistent XLA compilation cache: first compile of the D2 graphs takes
# minutes; cached reruns load in seconds.
import jax as _jax_cc
_jax_cc.config.update('jax_compilation_cache_dir',
                      _os.environ.get('MMDT_COMPILE_CACHE',
                                      _os.path.expanduser('~/.cache/mmdt_xla')))
_jax_cc.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

logging.basicConfig(level=logging.WARNING)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Evaluate MM-DistillNet (TPU-native)')
    parser.add_argument('--config_file', required=True)
    parser.add_argument('--checkpoint', default=None,
                        help='student checkpoint (.pth torch or orbax dir)')
    parser.add_argument('--overwrite', default=None)
    parser.add_argument('--rank', type=int, default=0)
    parser.add_argument('--just_plot', default=None,
                        help='plot predictions for one frame id and exit')
    args = parser.parse_args(argv)

    from mm_distillnet_tpu.config import load_config
    config = load_config(args.config_file, args.overwrite,
                         extra={'rank': args.rank})
    from mm_distillnet_tpu.utils.logging_utils import setup_run_logging
    setup_run_logging(config, args.rank)

    from mm_distillnet_tpu.data.factory import get_dataset
    from mm_distillnet_tpu.evaluation import evaluate
    from mm_distillnet_tpu.models.registry import (load_model,
                                                   maybe_load_checkpoint)
    from mm_distillnet_tpu.utils.reproducibility import make_reproducible_run

    make_reproducible_run(config.getint('seed', fallback=-1))

    # Teacher load order/classes mirror reference evaluate.py:104-118:
    # rgb, audio (the use_audio static teacher joins the eval fusion,
    # reference evaluate.py:108-110), depth, thermal.
    teacher_models = {}
    teacher_type = config.get('teacher', 'YetAnotherEfficientDet_D2')
    if config.getboolean('use_rgb', fallback=True):
        teacher_models['rgb'] = load_model(teacher_type, config, 'rgb')
    if config.getboolean('use_audio', fallback=False):
        teacher_models['audio'] = load_model(teacher_type, config,
                                             'audio_static')
    if config.getboolean('use_depth', fallback=False):
        teacher_models['depth'] = load_model(teacher_type, config, 'depth')
    if config.getboolean('use_thermal', fallback=False):
        teacher_models['thermal'] = load_model(teacher_type, config,
                                               'thermal')

    student_model = load_model(config.get('student'), config,
                               'audio_student')
    if args.checkpoint:
        module, variables = student_model
        variables = maybe_load_checkpoint(args.checkpoint, variables)
        student_model = (module, variables)

    mode = config.get('eval_split', 'test')
    try:
        test_set = get_dataset(config, mode)
    except FileNotFoundError:
        test_set = get_dataset(config, 'val')

    if args.just_plot:
        from mm_distillnet_tpu.utils.plotting import plot_audio_predictions
        plot_audio_predictions(teacher_models, student_model, test_set,
                               config, args.just_plot)
        return

    ap_table = evaluate(teacher_models, student_model, test_set, config)
    print(ap_table.to_string(index=False))


if __name__ == '__main__':
    main()
