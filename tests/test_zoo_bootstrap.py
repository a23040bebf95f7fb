"""ImageNet-pretrained backbone bootstrap from a model-zoo checkpoint.

The reference trains new teachers from `from_pretrained` zoo weights with a
stem swap for non-3-channel inputs (reference
src/YetAnotherEfficientNet.py:596-604). These tests build a SYNTHETIC
zoo-layout state_dict (lukemelas key naming: '_conv_stem.weight',
'_blocks.N._depthwise_conv.weight', no '.conv' wrapper level) and assert:

- every backbone param/stat loads bit-exactly into the flax tree;
- BiFPN/heads stay at their init (the zoo has no detector weights);
- 1- and 8-channel stems keep their random init (stem-swap rule) while a
  3-channel stem loads;
- the registry honors `backbone_pretrained=<path>`.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_distillnet_tpu.convert.torch_weights import (
    _torch_key_for, bootstrap_backbone_from_zoo)
from mm_distillnet_tpu.models.efficientdet import EfficientDet

from .helpers import fast_init

SIZE = 128
COEF = -1  # zoo layout is derived from the tree, so the tiny profile
           # exercises the same key mapping; the real-coef .pth round-trip
           # lives in test_data_and_convert.py


def _init(channels: int, seed: int = 0):
    model = EfficientDet(num_classes=20, compound_coef=COEF)
    variables = fast_init(model, seed,
                          jnp.zeros((1, SIZE, SIZE, channels)))
    return model, variables


def _flat(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = tuple(getattr(p, 'key', getattr(p, 'name', str(p)))
                     for p in path)
        out[keys] = np.asarray(leaf)
    return out


def _zoo_state_dict(variables, rng):
    """Synthetic zoo-layout checkpoint whose values are derived from the
    backbone keys of `variables` (shapes) but freshly random (values)."""
    sd = {}
    for coll in ('params', 'batch_stats'):
        for keys, leaf in _flat(variables[coll]).items():
            if keys[0] != 'backbone_net':
                continue
            tkey = _torch_key_for(keys, coll)
            assert tkey.startswith('backbone_net.model.')
            zkey = tkey[len('backbone_net.model.'):]
            # zoo convs subclass nn.Conv2d: no '.conv' wrapper level
            zkey = zkey.replace('.conv.weight', '.weight') \
                       .replace('.conv.bias', '.bias')
            val = rng.standard_normal(leaf.shape).astype(np.float32)
            if val.ndim == 4:
                val = val.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            sd[zkey] = val
    # zoo-only classification-head keys the detector must ignore
    sd['_conv_head.weight'] = rng.standard_normal((1280, 320, 1, 1)) \
        .astype(np.float32)
    sd['_bn1.weight'] = rng.standard_normal((1280,)).astype(np.float32)
    sd['_fc.weight'] = rng.standard_normal((1000, 1280)).astype(np.float32)
    sd['_blocks.0._bn1.num_batches_tracked'] = np.asarray(7)
    return sd


def _expected_flax_value(zoo_val):
    return zoo_val.transpose(2, 3, 1, 0) if zoo_val.ndim == 4 else zoo_val


def test_zoo_bootstrap_3ch_loads_backbone_only():
    _, v_src = _init(3, seed=0)
    rng = np.random.default_rng(42)
    sd = _zoo_state_dict(v_src, rng)

    _, v = _init(3, seed=1)
    before = {c: _flat(v[c]) for c in v}
    loaded, report = bootstrap_backbone_from_zoo(sd, v)
    assert report['stem_swapped'] is False
    assert not report['backbone_missing']
    # zoo-only head keys must not count as unconsumed
    assert not any('_fc' in k or '_conv_head' in k or '_bn1.' in k
                   for k in report['unused']), report['unused']

    for coll in ('params', 'batch_stats'):
        for keys, leaf in _flat(loaded[coll]).items():
            if keys[0] == 'backbone_net':
                tkey = _torch_key_for(keys, coll)
                zkey = tkey[len('backbone_net.model.'):] \
                    .replace('.conv.weight', '.weight') \
                    .replace('.conv.bias', '.bias')
                np.testing.assert_array_equal(
                    leaf, _expected_flax_value(sd[zkey]),
                    err_msg=f'{keys} did not load from {zkey}')
            else:
                np.testing.assert_array_equal(
                    leaf, before[coll][keys],
                    err_msg=f'non-backbone {keys} was modified')


@pytest.mark.parametrize('channels', [1, 8])
def test_zoo_bootstrap_stem_swap(channels):
    _, v3 = _init(3, seed=0)
    rng = np.random.default_rng(7)
    sd = _zoo_state_dict(v3, rng)  # 3-channel zoo stem

    _, v = _init(channels, seed=2)
    stem_before = np.asarray(v['params']['backbone_net']
                             ['_conv_stem']['kernel'])
    loaded, report = bootstrap_backbone_from_zoo(sd, v)
    assert report['stem_swapped'] is True
    assert not report['backbone_missing']
    # stem keeps its random init (the reference rebuilds it post-load)
    np.testing.assert_array_equal(
        np.asarray(loaded['params']['backbone_net']['_conv_stem']['kernel']),
        stem_before)
    # ...but a deeper block did load
    keys = ('backbone_net', '_blocks_0', '_project_conv', 'kernel')
    zkey = '_blocks.0._project_conv.weight'
    got = loaded['params']['backbone_net']['_blocks_0']['_project_conv'][
        'kernel']
    np.testing.assert_array_equal(np.asarray(got),
                                  _expected_flax_value(sd[zkey]),
                                  err_msg=f'{keys} did not load')


def test_registry_backbone_pretrained(tmp_path):
    torch = pytest.importorskip('torch')
    from mm_distillnet_tpu.config import default_config
    from mm_distillnet_tpu.models.registry import load_model

    _, v3 = _init(3, seed=0)
    sd = _zoo_state_dict(v3, np.random.default_rng(3))
    path = os.path.join(tmp_path, 'efficientnet-zoo.pth')
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)

    cfg = default_config(image_size=str(SIZE), compound_coef=str(COEF),
                         saved_path=str(tmp_path),
                         backbone_pretrained=path)
    _, variables = load_model('YetAnotherEfficientDet_D2', cfg,
                              'audio_student')
    # 8-channel student: stem swapped, block weights from the zoo
    got = variables['params']['backbone_net']['_blocks_0']['_project_conv'][
        'kernel']
    np.testing.assert_array_equal(
        np.asarray(got),
        _expected_flax_value(sd['_blocks.0._project_conv.weight']))
    assert np.asarray(variables['params']['backbone_net']['_conv_stem']
                      ['kernel']).shape[2] == 8

    cfg_bad = default_config(image_size=str(SIZE),
                             compound_coef=str(COEF),
                             backbone_pretrained='/nonexistent/b2.pth')
    with pytest.raises(FileNotFoundError):
        load_model('YetAnotherEfficientDet_D2', cfg_bad, 'audio_student')
