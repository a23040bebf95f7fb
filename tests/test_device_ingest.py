"""Compact audio device-ingest (config `device_audio_resize`).

The reference stretches the (80, T, 8) log-mel stack to image_size^2 on
the host with cv2.INTER_CUBIC and ships the full-size floats to the
device (reference src/datasets/transformations.py:443-448). Bicubic is
separable, so here the host stretches only the time axis and the
compiled step stretches the 80-mel axis on-device
(ops/resize.stretch_mel_axis) — 9.6x fewer audio infeed bytes for an
identical input tensor. These tests pin (a) numerical equality against
the full host stretch, (b) the host pipeline's compact shapes, and
(c) that the fused step / eval predictor consume compact batches and
produce the same numbers as pre-stretched ones.
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from mm_distillnet_tpu.config import default_config
from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
from mm_distillnet_tpu.data.transforms import Resizer
from mm_distillnet_tpu.ops.resize import stretch_mel_axis

SIZE = 128


def test_host_time_plus_device_mel_equals_full_cv2_stretch():
    rng = np.random.default_rng(0)
    # dB-scale values like power_to_db output
    spec = (rng.standard_normal((80, 173, 8)).astype(np.float32) * 20 - 40)
    full = cv2.resize(spec, dsize=(SIZE, SIZE),
                      interpolation=cv2.INTER_CUBIC)
    compact = cv2.resize(spec, dsize=(SIZE, 80),
                         interpolation=cv2.INTER_CUBIC)   # time axis only
    assert compact.shape == (80, SIZE, 8)
    dev = np.asarray(stretch_mel_axis(jnp.asarray(compact), SIZE))
    np.testing.assert_allclose(dev, full, atol=2e-3, rtol=1e-5)


def test_stretch_mel_axis_noop_at_full_size():
    x = jnp.ones((2, SIZE, SIZE, 8), jnp.bfloat16)
    assert stretch_mel_axis(x, SIZE) is x


def test_stretch_mel_axis_keeps_dtype():
    x = jnp.ones((2, 80, SIZE, 8), jnp.bfloat16)
    y = stretch_mel_axis(x, SIZE)
    assert y.shape == (2, SIZE, SIZE, 8)
    assert y.dtype == jnp.bfloat16


def test_resizer_audio_time_only_shapes():
    sample = {
        'rgb': np.random.rand(100, 120, 3).astype(np.float32),
        'audio': np.random.rand(80, 173, 8).astype(np.float32),
        'label': np.array([[10, 10, 50, 50, 6]], np.float32),
    }
    out = Resizer(common_size=96, audio_time_only=True)(dict(sample))
    assert out['audio'].shape == (80, 96, 8)
    assert out['rgb'].shape == (96, 96, 3)
    out_full = Resizer(common_size=96)(dict(sample))
    assert out_full['audio'].shape == (96, 96, 8)


def test_synthetic_compact_mode_shapes_and_other_modalities_unchanged():
    cfg_off = default_config(dataset='Synthetic', synthetic_size='2',
                             image_size=str(SIZE),
                             device_audio_resize='False')
    cfg_on = default_config(dataset='Synthetic', synthetic_size='2',
                            image_size=str(SIZE),
                            device_audio_resize='True')
    a = SyntheticMultimodal(cfg_off, 'train')[0]
    b = SyntheticMultimodal(cfg_on, 'train')[0]
    assert a['audio'].shape == (SIZE, SIZE, 8)
    assert b['audio'].shape == (80, SIZE, 8)
    np.testing.assert_array_equal(a['rgb'], b['rgb'])
    np.testing.assert_array_equal(a['thermal'], b['thermal'])
    np.testing.assert_array_equal(a['label'], b['label'])


def test_eval_loss_step_compact_equals_prestretched():
    """The fused step's on-device stretch must produce the same losses as
    feeding the host-stretched tensor (they share the resize matrix)."""
    from .test_train_step import _setup
    from mm_distillnet_tpu.distill.train_step import make_eval_loss_step

    (student, teachers, teacher_vars, tx, state, batch, anchors,
     class_valid, pred_to_label, cfg) = _setup('traditional_nms')
    compact = jax.random.normal(jax.random.PRNGKey(3), (2, 80, SIZE, 8))
    batch_c = {**batch, 'audio': compact, 'label': np.full((2, 4, 5), -1.0)}
    batch_f = {**batch_c, 'audio': stretch_mel_axis(compact, SIZE)}

    step = jax.jit(make_eval_loss_step(student, teachers, cfg, anchors,
                                       class_valid, pred_to_label))
    m_c = jax.device_get(step(state, teacher_vars, batch_c))
    m_f = jax.device_get(step(state, teacher_vars, batch_f))
    for k in m_f:
        np.testing.assert_allclose(m_c[k], m_f[k], rtol=1e-5, atol=1e-6)


def test_predict_fn_compact_equals_prestretched():
    from .helpers import fast_init
    from mm_distillnet_tpu.evaluation import make_predict_fn
    from mm_distillnet_tpu.models.efficientdet import EfficientDet

    model = EfficientDet(num_classes=20, compound_coef=-1,
                         dtype=jnp.float32)
    compact = jax.random.normal(jax.random.PRNGKey(5), (1, 80, SIZE, 8))
    full = stretch_mel_axis(compact, SIZE)
    variables = fast_init(model, 7, full)
    config = default_config(image_size=str(SIZE))
    predict = make_predict_fn(model, SIZE, config)
    class_valid = jnp.ones((20,), bool)
    pred_to_label = jnp.arange(20)
    rows_c, _ = predict(variables, compact, class_valid, pred_to_label)
    rows_f, _ = predict(variables, full, class_valid, pred_to_label)
    np.testing.assert_allclose(np.asarray(rows_c), np.asarray(rows_f),
                               rtol=1e-5, atol=1e-6)
