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


def pretrain(teacher_models, student_model, config, train_set, val_set):
    """Pretrain stage before distillation (reference train.py:47-102).

    The reference's ``pretrain`` config key doubles as a value:
    - an existing checkpoint path -> load it into the student and return
      (reference train.py:69-84);
    - a true boolean -> run a full training stage with
      ``method='traditional'`` into ``{exp_name}/pretrain``, then restore
      exp_name (reference train.py:86-100). The trained weights carry over
      into the student (the reference mutates the torch module in place; we
      thread the returned TrainState's params/batch_stats back).
    """
    import os

    module, variables = student_model
    value = config.get('pretrain', fallback='False') or 'False'
    path = config.get('pretrain_checkpoint', fallback='') or value
    if path and os.path.exists(path):
        from mm_distillnet_tpu.models.registry import maybe_load_checkpoint
        logging.warning('Pretrain from %s', path)
        return module, maybe_load_checkpoint(path, variables)

    try:
        enabled = config.getboolean('pretrain', fallback=False)
    except ValueError:
        enabled = False  # non-boolean, non-existent path: nothing to do
    if not enabled:
        return module, variables

    from mm_distillnet_tpu.train.trainer import train
    old_exp_name = config.get('exp_name', 'run')
    config['exp_name'] = f'{old_exp_name}/pretrain'
    os.makedirs(config['exp_name'], exist_ok=True)
    logging.warning('Pretrain stage on %s', config['exp_name'])
    state = train(teacher_models, (module, variables), config,
                  train_set, val_set, method='traditional')
    config['exp_name'] = old_exp_name
    variables = dict(variables)
    variables['params'] = state.params
    if state.batch_stats:
        variables['batch_stats'] = state.batch_stats
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

    # Teacher load order and classes mirror reference train.py:122-134:
    # rgb, audio, depth, thermal — the audio static teacher is built from
    # config['teacher'] with the 'audio_static' modality, so the shipped
    # teacher string ('YetAnotherEfficientDet_D2') yields a PLAIN 8-channel
    # D2 loading yet-another-efficientdet-d2-audio.pth through the key
    # remap (the Generator class is reached only via the
    # 'YetAnotherEfficientDet_D2_audio' registry name, utils.py:506-558).
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

    training_set = get_dataset(config, 'train')
    val_set = get_dataset(config, 'val')

    student_model = load_model(config.get('student'), config,
                               'audio_student')
    student_model = pretrain(teacher_models, student_model, config,
                             training_set, val_set)

    state = train(teacher_models, student_model, config, training_set,
                  val_set, method=config.get('train_method'))

    # The trained weights carry into the final evaluation (the reference
    # mutates the torch module in place, reference train.py:199-213; we
    # thread the returned TrainState), then the best checkpoint — when one
    # was saved — takes precedence, as in the reference.
    trained_vars = dict(student_model[1])
    trained_vars['params'] = state.params
    if state.batch_stats:
        trained_vars['batch_stats'] = state.batch_stats
    student_model = (student_model[0], trained_vars)
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
