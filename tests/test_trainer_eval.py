"""End-to-end trainer + evaluation tests (tiny models, synthetic data)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_distillnet_tpu.config import default_config
from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
from mm_distillnet_tpu.evaluation import evaluate
from mm_distillnet_tpu.models.efficientdet import EfficientDet
from mm_distillnet_tpu.train.trainer import train

from .helpers import fast_init


@pytest.fixture(scope='module')
def tiny_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('run')
    os.chdir(tmp)
    config = default_config(
        image_size=128, synthetic_size=4, batch_size=2, num_epoches=1,
        val_interval=1, fast_run=True, num_workers=1, resume=False,
        use_depth=False, use_thermal=True, max_gt=16, nms_candidates=64,
        max_det_per_teacher=8, max_detections=16, exp_name='tiny-test',
        compute_dtype='float32', rank=0)
    train_set = SyntheticMultimodal(config, 'train')
    val_set = SyntheticMultimodal(config, 'val')

    def mk(seed, ch):
        m = EfficientDet(num_classes=20, compound_coef=-1, dtype=jnp.float32)
        return m, fast_init(m, seed, jnp.zeros((1, 128, 128, ch)))

    teachers = {'rgb': mk(1, 3), 'thermal': mk(2, 1)}
    student = mk(9, 8)
    return config, train_set, val_set, teachers, student


def test_train_runs_and_checkpoints(tiny_setup):
    config, train_set, val_set, teachers, student = tiny_setup
    state = train(teachers, student, config, train_set, val_set)
    assert int(state.step) >= 1
    assert os.path.exists('tiny-test/checkpoint.0')
    assert os.path.exists('tiny-test/best.0')
    assert os.path.exists('tiny-test/all_logs.0.json')


def test_resume_from_checkpoint(tiny_setup):
    config, train_set, val_set, teachers, student = tiny_setup
    # flip resume on: should restore from the checkpoint of the previous
    # test and not crash; epoch counter advances past the saved one
    config['resume'] = 'True'
    config['num_epoches'] = '2'
    state = train(teachers, student, config, train_set, val_set)
    assert int(state.step) >= 1


def test_evaluate_writes_artifacts(tiny_setup):
    config, train_set, val_set, teachers, student = tiny_setup
    ap = evaluate(teachers, student, val_set, config)
    assert set(ap.columns) >= {'exp_name', 'modality', 'AP@Ave', 'AP@0.5',
                               'AP@0.75', 'CDx', 'CDy'}
    assert os.path.exists('tiny-test/results.0.csv')
    assert os.path.exists('tiny-test/resources.0.csv')
    # with two teachers but no depth, testing point is per-modality
    assert list(ap['modality']) == ['rgb', 'thermal']


def test_evaluate_with_dataset_labels(tiny_setup):
    """use_labels=True evaluates against the synthetic dataset's own GT."""
    config, train_set, val_set, teachers, student = tiny_setup
    config['use_labels'] = 'True'
    ap = evaluate(teachers, student, val_set, config)
    config['use_labels'] = 'False'
    assert np.isfinite(ap['AP@Ave']).all()


def test_student_modality_key_honored():
    """The reference's `student_modality` config key selects the student
    input (reference src/utils/utils.py:1771-1776); the TPU-build extension
    `student_input` takes precedence when set."""
    from mm_distillnet_tpu.config import default_config, student_input_key
    assert student_input_key(default_config()) == 'audio'
    assert student_input_key(
        default_config(student_modality='thermal')) == 'thermal'
    assert student_input_key(
        default_config(student_modality='thermal',
                       student_input='rgb')) == 'rgb'


def test_evaluate_all_fuses_audio_static_teacher(tiny_setup):
    """With rgb+thermal+depth enabled the testing point is 'ALL', and a
    use_audio static teacher joins the fusion (reference
    evaluate.py:108-110 + utils.py:2043-2049): four teachers fused."""
    config, train_set, val_set, teachers, student = tiny_setup
    config['use_depth'] = 'True'
    config['use_audio'] = 'True'
    try:
        def mk(seed, ch):
            m = EfficientDet(num_classes=20, compound_coef=-1,
                             dtype=jnp.float32)
            return m, fast_init(m, seed, jnp.zeros((1, 128, 128, ch)))

        four = dict(teachers)
        four['audio'] = mk(3, 8)   # plain 8-channel static teacher
        four['depth'] = mk(4, 3)
        ap = evaluate(four, student, val_set, config)
    finally:
        config['use_depth'] = 'False'
        config['use_audio'] = 'False'
    assert list(ap['modality']) == ['ALL']
    assert np.isfinite(ap['AP@Ave']).all()


def test_eval_batch_size_override(tiny_setup):
    """eval_batch_size decouples inference batch from training batch."""
    config, train_set, val_set, teachers, student = tiny_setup
    config['eval_batch_size'] = '4'
    try:
        ap = evaluate(teachers, student, val_set, config)
    finally:
        del config['eval_batch_size']
    assert np.isfinite(ap['AP@Ave']).all()
