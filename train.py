#!/usr/bin/env python
"""Train the audio student by multi-teacher distillation.

Public CLI matching the reference (reference train.py:223-316):

    python train.py --config_file configs/mm-distillnet.cfg \
        [--overwrite '{"key": "value"}'] [--rank N] [--local_rank N] [--nodes N]

Multi-host runs use jax.distributed (SPMD over a data mesh) instead of the
reference's NCCL process-group init (train.py:296-313); --rank/--nodes are
accepted for CLI compatibility and map onto JAX process env vars.
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


def pretrain(student_model, config):
    """Reference pretrain() (train.py:47-102) loads a pretrain checkpoint
    into the student before distillation when config pretrain=True."""
    if not config.getboolean('pretrain', fallback=False):
        return student_model
    from mm_distillnet_tpu.models.registry import maybe_load_checkpoint
    path = config.get('pretrain_checkpoint', '')
    module, variables = student_model
    if path:
        variables = maybe_load_checkpoint(path, variables)
    return module, variables


def train_multimodal_detection(config):
    from mm_distillnet_tpu.data.factory import get_dataset
    from mm_distillnet_tpu.evaluation import evaluate
    from mm_distillnet_tpu.models.registry import load_model
    from mm_distillnet_tpu.parallel.mesh import distributed_init_if_needed
    from mm_distillnet_tpu.train.checkpoint import load_student_params
    from mm_distillnet_tpu.train.trainer import train
    from mm_distillnet_tpu.utils.reproducibility import make_reproducible_run

    distributed_init_if_needed(config)
    make_reproducible_run(config.getint('seed', fallback=-1))

    teacher_models = {}
    teacher_type = config.get('teacher', 'YetAnotherEfficientDet_D2')
    if config.getboolean('use_rgb', fallback=True):
        teacher_models['rgb'] = load_model(teacher_type, config, 'rgb')
    if config.getboolean('use_thermal', fallback=False):
        teacher_models['thermal'] = load_model(teacher_type, config,
                                               'thermal')
    if config.getboolean('use_depth', fallback=False):
        teacher_models['depth'] = load_model(teacher_type, config, 'depth')
    if config.getboolean('use_audio', fallback=False):
        teacher_models['audio'] = load_model(
            'YetAnotherEfficientDet_D2_audio', config, 'audio_static')

    training_set = get_dataset(config, 'train')
    val_set = get_dataset(config, 'val')

    student_model = load_model(config.get('student'), config,
                               'audio_student')
    student_model = pretrain(student_model, config)

    train(teacher_models, student_model, config, training_set, val_set,
          method=config.get('train_method'))

    # Reload the best checkpoint and run the final evaluation
    # (reference train.py:199-213).
    rank = config.getint('rank', fallback=0) or 0
    best = load_student_params(config, rank, 'best')
    if best is not None:
        student_model = (student_model[0], best)
    evaluate(teacher_models, student_model, val_set, config)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Train MM-DistillNet (TPU-native)')
    parser.add_argument('--config_file', required=True)
    parser.add_argument('--overwrite', default=None,
                        help='JSON dict of config overrides')
    parser.add_argument('--rank', type=int, default=0)
    parser.add_argument('--local_rank', type=int, default=0)
    parser.add_argument('--nodes', type=int, default=1)
    args = parser.parse_args(argv)

    from mm_distillnet_tpu.config import load_config
    config = load_config(args.config_file, args.overwrite,
                         extra={'rank': args.rank,
                                'local_rank': args.local_rank})
    from mm_distillnet_tpu.utils.logging_utils import setup_run_logging
    setup_run_logging(config, args.rank)
    train_multimodal_detection(config)


if __name__ == '__main__':
    main()
