"""End-to-end wiring of the multi-modal generator teacher.

Covers the reference behaviors around YetAnotherEfficientDetGenerator:
- registry class dispatch (reference utils.py:441-558: the '_audio' name
  builds the generator; the '_STATIC' name builds the PLAIN detector);
- checkpoint key remapping between plain and generator formats
  (filter_model_dict, utils.py:327-411);
- a distillation step with a use_audio static teacher in the loop;
- hard failure on teacher checkpoints with unmatched parameters.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_distillnet_tpu.config import default_config
from mm_distillnet_tpu.models.efficientdet import EfficientDet
from mm_distillnet_tpu.models.efficientdet_generator import \
    EfficientDetGenerator
from mm_distillnet_tpu.models.registry import (build_model,
                                               get_data_dim_from_config,
                                               maybe_load_checkpoint)

from .helpers import fast_init, fast_train_state

SIZE = 128
CC = -1  # test-tiny profile; real coefs covered by shape/parity suites


def test_registry_generator_dispatch():
    config = default_config(use_rgb=True, use_thermal=True, use_depth=False,
                            use_audio=True, integration_mode='concat')
    m = build_model('YetAnotherEfficientDetGenerator_D2', config)
    assert isinstance(m, EfficientDetGenerator)
    assert m.ordered_modalities == ('audio', 'rgb', 'thermal')

    # the use_audio static teacher name is a generator in the reference
    # registry (utils.py:506-509)
    m = build_model('YetAnotherEfficientDet_D2_audio', config)
    assert isinstance(m, EfficientDetGenerator)

    # ...but the _STATIC name maps to the plain class (utils.py:551-555)
    m = build_model('YetAnotherEfficientDetGenerator_D2_STATIC', config)
    assert isinstance(m, EfficientDet)


def test_audio_static_from_shipped_teacher_string_is_plain():
    """The CLIs build the use_audio static teacher from config['teacher'] +
    modality 'audio_static' (reference train.py:127-129,
    evaluate.py:108-110). With the shipped teacher string
    ('YetAnotherEfficientDet_D2') that resolves to a PLAIN 8-channel D2 —
    the Generator class is reached only via the '_audio' registry name."""
    from mm_distillnet_tpu.models.registry import load_model
    config = default_config(use_rgb=True, use_thermal=True, use_depth=True,
                            use_audio=True, image_size=SIZE,
                            compute_dtype='float32', compound_coef=-1)
    module, variables = load_model('YetAnotherEfficientDet_D2', config,
                                   'audio_static')
    assert isinstance(module, EfficientDet)
    assert module.compound_coef == -1  # config compound_coef honored
    stem = variables['params']['backbone_net']['_conv_stem']['kernel']
    assert stem.shape[2] == 8  # audio_static input channels


def test_plain_checkpoint_fills_generator_slots():
    """A plain-EfficientDet torch state_dict loads into every per-modality
    backbone/neck slot of the generator (reference filter_model_dict
    mapping 'backbone_net'->'model_backbones.<m>', utils.py:342-357)."""
    torch = pytest.importorskip('torch')
    from mm_distillnet_tpu.convert.torch_weights import convert_state_dict

    gen = EfficientDetGenerator(modalities=('audio', 'rgb'), num_classes=4,
                                compound_coef=CC, dtype=jnp.float32)
    inputs = {'rgb': jnp.zeros((1, SIZE, SIZE, 3)),
              'audio': jnp.zeros((1, SIZE, SIZE, 3))}
    variables = fast_init(gen, 0, inputs)

    # synthesize a "plain model" torch checkpoint for one backbone+neck by
    # round-tripping the generator's own rgb slot through the torch naming
    from mm_distillnet_tpu.convert.torch_weights import _torch_key_for
    sd = {}
    for coll in variables:
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for path, leaf in flat:
            keys = tuple(getattr(p, 'key', getattr(p, 'name', str(p)))
                         for p in path)
            if keys[0] != 'backbone_net_rgb':
                continue
            tkey = _torch_key_for(keys, coll)
            # demote the generator key to the plain-model key
            tkey = tkey.replace('model_backbones.rgb.', 'backbone_net.')
            arr = np.asarray(leaf, np.float64) + 0.25
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            sd[tkey] = torch.tensor(arr)

    filled, report = convert_state_dict(sd, variables, strict=False)
    # both modality slots picked up the plain checkpoint's backbone
    # (rgb slot was exported with a +0.25 marker; the audio slot has 3
    # input channels here so the fallback matches it too)
    want = np.asarray(variables['params']['backbone_net_rgb']['_conv_stem'][
        'kernel'], np.float32) + 0.25
    for mod in ('rgb', 'audio'):
        got = filled['params'][f'backbone_net_{mod}']['_conv_stem']['kernel']
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_generator_teacher_distill_step():
    """A distill step with rgb + audio-static generator teachers runs and
    produces finite losses (the use_audio branch, reference train.py:124-135
    + ModelWithNMSLoss audio teacher forward train_methods.py:546-548)."""
    from mm_distillnet_tpu.distill.pseudo_labels import PseudoLabelConfig
    from mm_distillnet_tpu.distill.train_step import (DistillConfig,
                                                      init_train_state,
                                                      make_train_step)
    from mm_distillnet_tpu.ops.anchors import anchor_table
    from mm_distillnet_tpu.ops.postprocess import class_validity_table
    from mm_distillnet_tpu.train.optim import build_optimizer

    rng = jax.random.PRNGKey(0)
    batch = {
        'rgb': jax.random.normal(rng, (2, SIZE, SIZE, 3)),
        'thermal': jax.random.normal(rng, (2, SIZE, SIZE, 1)),
        'audio': jax.random.normal(rng, (2, SIZE, SIZE, 8)),
    }
    teachers = {
        'rgb': EfficientDet(num_classes=20, compound_coef=CC,
                            dtype=jnp.float32),
        'audio': EfficientDetGenerator(
            modalities=('audio', 'rgb', 'thermal'), num_classes=20,
            compound_coef=CC, integration_mode='concat', dtype=jnp.float32),
    }
    t_vars = {
        'rgb': fast_init(teachers['rgb'], 1, batch['rgb']),
        'audio': fast_init(teachers['audio'], 2, batch),
    }
    student = EfficientDet(num_classes=20, compound_coef=CC,
                           dtype=jnp.float32)
    config = default_config(image_size=SIZE)
    tx = build_optimizer(config)
    state = fast_train_state(student, 9, batch['audio'], tx)
    cfg = DistillConfig(train_method='traditional_nms',
                        pl=PseudoLabelConfig(image_size=SIZE,
                                             num_candidates=64,
                                             max_det_per_teacher=8,
                                             max_gt=16))
    anchors = jnp.asarray(anchor_table(SIZE))
    class_valid = jnp.asarray(class_validity_table(20, list(range(20))))
    step = jax.jit(make_train_step(student, teachers, tx, cfg, anchors,
                                   class_valid, jnp.arange(20)))
    new_state, metrics = step(state, t_vars, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics['Total_loss']))
    assert int(new_state.step) == 1


def test_strict_teacher_load_raises(tmp_path):
    """A teacher checkpoint with a drifted key map must fail hard, not warn
    (VERDICT: silent partial teachers poison pseudo-labels)."""
    torch = pytest.importorskip('torch')

    model = EfficientDet(num_classes=4, compound_coef=CC, dtype=jnp.float32)
    variables = fast_init(model, 0, jnp.zeros((1, SIZE, SIZE, 3)))
    path = tmp_path / 'corrupt.pth'
    torch.save({'definitely_not_a_real_key': torch.zeros(3)}, str(path))
    with pytest.raises(ValueError, match='unmatched'):
        maybe_load_checkpoint(str(path), variables, strict=True)
    # non-strict keeps the old lenient behavior
    out = maybe_load_checkpoint(str(path), variables, strict=False)
    assert out is not None


def test_get_data_dim_from_config():
    config = default_config(use_rgb=False, use_thermal=True, use_depth=True,
                            use_audio=False)
    assert get_data_dim_from_config(config) == {'thermal': 1, 'depth': 3}
    config = default_config(use_rgb=False, use_thermal=False,
                            use_depth=False, use_audio=False)
    assert get_data_dim_from_config(config) == {'rgb': 3}
