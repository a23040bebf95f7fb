"""Shape/structure tests for the detector stack on small inputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_distillnet_tpu.models.efficientdet import EfficientDet
from mm_distillnet_tpu.models.efficientnet import (
    EfficientNetFeatures, backbone_feature_channels, expand_block_args,
    round_filters)
from mm_distillnet_tpu.ops.anchors import anchor_table, num_anchors

from .helpers import fast_init


def test_b2_block_expansion():
    blocks = expand_block_args(2)
    assert len(blocks) == 23  # ceil(1.2 * [1,2,2,3,3,4,1]) = [2,3,3,4,4,5,2]
    assert backbone_feature_channels(2) == (48, 120, 352)
    assert round_filters(32, 1.1) == 32
    assert round_filters(192, 1.1) == 208


def test_backbone_pyramid_shapes():
    # Shape-only: jax.eval_shape traces without compiling or executing —
    # the D2 backbone's numerics are pinned by the torch-parity suite.
    model = EfficientNetFeatures(compound_coef=2, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))
    params = fast_init(model, 0, x)
    feats = jax.eval_shape(model.apply, params, x)
    # [P2, P3, P4, P5] at strides 4, 8, 16, 32
    assert [f.shape for f in feats] == [
        (1, 32, 32, 24), (1, 16, 16, 48), (1, 8, 8, 120), (1, 4, 4, 352)]


def test_anchor_table_counts():
    a = anchor_table(768)
    assert a.shape == (110484, 4)  # reference src/YetAnotherEfficientDet.py:484
    assert num_anchors(768) == 110484
    # first anchor centered at (4, 4) stride 8, scale 1, ratio (1,1): size 32
    np.testing.assert_allclose(a[0], [4 - 16, 4 - 16, 4 + 16, 4 + 16])
    # anchors ordered anchor-minor: second anchor same cell, ratio (1.4, 0.7)
    np.testing.assert_allclose(a[1], [4 - 0.7 * 16, 4 - 1.4 * 16,
                                      4 + 0.7 * 16, 4 + 1.4 * 16])


@pytest.mark.parametrize('in_ch', [1, 8])
def test_efficientdet_forward_shapes(in_ch):
    # Shape-only via jax.eval_shape (no compile/execute): real-coefficient
    # D2 numerics are pinned by test_reference_parity.py.
    size = 128
    model = EfficientDet(num_classes=20, compound_coef=2, dtype=jnp.float32)
    x = jnp.zeros((2, size, size, in_ch))
    variables = fast_init(model, 0, x)
    out = jax.eval_shape(model.apply, variables, x)
    n = num_anchors(size)
    assert out.classification.shape == (2, n, 20)
    assert out.regression.shape == (2, n, 4)
    assert len(out.features) == 5
    assert [f.shape[1] for f in out.features] == [16, 8, 4, 2, 1]
    assert all(f.shape[-1] == 112 for f in out.features)
    assert out.align_features.shape == (2, 1, 1, 224)


def test_efficientdet_classification_is_sigmoid_range():
    # The one VALUE assertion the shape tests used to carry, on the
    # test-tiny profile (the sigmoid head is coefficient-independent).
    model = EfficientDet(num_classes=20, compound_coef=-1,
                         dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128, 8))
    variables = fast_init(model, 0, x)
    out = model.apply(variables, x)
    assert float(out.classification.min()) >= 0.0
    assert float(out.classification.max()) <= 1.0


def test_batchnorm_stats_update_in_train_mode():
    # Test-tiny profile: BN running-stat update semantics are
    # coefficient-independent (same BatchNorm modules, fewer blocks).
    model = EfficientDet(num_classes=4, compound_coef=-1, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
    variables = fast_init(model, 0, x)
    out, mutated = model.apply(
        variables, x, train=True, mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(2)})
    # running stats must change in train mode
    old = jax.tree_util.tree_leaves(variables['batch_stats'])
    new = jax.tree_util.tree_leaves(mutated['batch_stats'])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_generator_integration_modes():
    from mm_distillnet_tpu.models.efficientdet_generator import \
        EfficientDetGenerator
    inputs = {'rgb': jnp.zeros((1, 128, 128, 3)),
              'audio': jnp.zeros((1, 128, 128, 8))}
    # switch mode keeps single-modality head width (num_models_active=1,
    # reference YetAnotherEfficientDet_generator.py:652-668); concat and
    # zeroout heads see num_modalities * fpn width channels
    for mode, width in (('concat', 2 * 64), ('switch', 64),
                        ('zeroout', 2 * 64)):
        m = EfficientDetGenerator(modalities=('rgb', 'audio'),
                                  num_classes=4, compound_coef=0,
                                  integration_mode=mode, dtype=jnp.float32)
        v = fast_init(m, 0, inputs)
        # Shape-only via eval_shape; generator VALUE behavior (zeroout
        # averaging, switch selection, distill step) is pinned by
        # test_generator_wiring.py.
        out = jax.eval_shape(m.apply, v, inputs)
        n = num_anchors(128)
        assert out.classification.shape == (1, n, 4)
        assert out.features[0].shape[-1] == width
