"""Space-to-depth stem rewrite: exact equivalence with the standard stem.

The s2d stem (models/efficientnet.py _SpaceToDepthStem) re-expresses the
3x3 stride-2 stem conv as a 2x2 stride-1 conv over space-to-depth input
with rearranged weights — the SAME parameter tree, so one set of variables
must produce identical outputs through both paths.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mm_distillnet_tpu.models.efficientdet import EfficientDet
from mm_distillnet_tpu.models.efficientnet import EfficientNetFeatures

from .helpers import fast_init


def test_s2d_backbone_matches_standard():
    size = 64
    std = EfficientNetFeatures(compound_coef=-1, dtype=jnp.float32)
    s2d = EfficientNetFeatures(compound_coef=-1, dtype=jnp.float32,
                               s2d_stem=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, size, size, 8))
    variables = fast_init(std, 1, x)
    want = std.apply(variables, x, train=False)
    got = s2d.apply(variables, x, train=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_s2d_param_tree_identical():
    """Checkpoints trained with the standard stem load into the s2d model
    unchanged (same param names/shapes)."""
    size = 32
    std = EfficientNetFeatures(compound_coef=-1, dtype=jnp.float32)
    s2d = EfficientNetFeatures(compound_coef=-1, dtype=jnp.float32,
                               s2d_stem=True)
    x = jnp.zeros((1, size, size, 3))
    v_std = fast_init(std, 0, x)
    v_s2d = fast_init(s2d, 0, x)
    paths_std = [p for p, _ in jax.tree_util.tree_flatten_with_path(v_std)[0]]
    paths_s2d = [p for p, _ in jax.tree_util.tree_flatten_with_path(v_s2d)[0]]
    assert paths_std == paths_s2d
    k_std = v_std['params']['_conv_stem']['kernel']
    k_s2d = v_s2d['params']['_conv_stem']['kernel']
    assert k_std.shape == k_s2d.shape == (3, 3, 3, 8)


def test_s2d_full_detector_matches():
    # 128 is the minimum size whose P7 (stride 128) is >= 1x1 — smaller
    # inputs break the BiFPN's nearest-2x upsample chain (in the reference
    # torch code identically; 768/D2 never hits this).
    size = 128
    std = EfficientDet(num_classes=4, compound_coef=-1, dtype=jnp.float32)
    s2d = EfficientDet(num_classes=4, compound_coef=-1, dtype=jnp.float32,
                       s2d_stem=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, size, size, 8))
    variables = fast_init(std, 4, x)
    a = std.apply(variables, x, train=False)
    b = s2d.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(a.classification),
                               np.asarray(b.classification),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.regression),
                               np.asarray(b.regression),
                               rtol=1e-4, atol=1e-4)
