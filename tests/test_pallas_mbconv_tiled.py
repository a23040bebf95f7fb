"""Row-tiled fused MBConv vs the flax reference block (interpret, CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_distillnet_tpu.models.efficientnet import BlockArgs, MBConvBlock
from mm_distillnet_tpu.ops import pallas_mbconv_tiled
from mm_distillnet_tpu.ops.pallas_mbconv import fold_mbconv
from mm_distillnet_tpu.ops.pallas_mbconv_tiled import mbconv_tiled


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pallas_mbconv_tiled.pl, 'pallas_call',
                        functools.partial(orig, interpret=True))


@pytest.mark.parametrize('args,size,th', [
    (BlockArgs(3, 1, 16, 16, 6, 1), 32, 8),     # expand + skip, 4 tiles
    (BlockArgs(3, 1, 32, 16, 1, 1), 32, 8),     # no expand (block-0 shape)
    (BlockArgs(3, 1, 16, 24, 6, 2), 32, 8),     # stride 2 (block-2 shape)
    (BlockArgs(5, 1, 24, 48, 6, 2), 32, 8),     # stride 2, k5 (block-5)
    (BlockArgs(3, 1, 16, 16, 6, 1), 32, 32),    # single tile (degenerate)
    (BlockArgs(5, 1, 16, 16, 6, 1), 48, 12),    # k5 stride 1, odd halo
])
def test_tiled_matches_flax_block(args, size, th):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, size, size, args.input_filters),
                          jnp.float32)
    block = MBConvBlock(args, dtype=jnp.float32)
    variables = block.init(jax.random.PRNGKey(1), x)
    want = block.apply(variables, x, train=False)

    folded = fold_mbconv(variables['params'], variables['batch_stats'], args)
    got = mbconv_tiled(x.astype(jnp.bfloat16), folded, args, tile_rows=th,
                       interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.05)
    a = np.asarray(got, np.float32).ravel()
    b = np.asarray(want).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr


def test_tiled_matches_untiled_edges():
    """Tiling must not change edge rows: compare 1-tile vs 4-tile runs."""
    args = BlockArgs(5, 1, 16, 24, 6, 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 16),
                          jnp.float32)
    block = MBConvBlock(args, dtype=jnp.float32)
    variables = block.init(jax.random.PRNGKey(3), x)
    folded = fold_mbconv(variables['params'], variables['batch_stats'], args)
    one = mbconv_tiled(x, folded, args, tile_rows=16, interpret=True)
    four = mbconv_tiled(x, folded, args, tile_rows=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(four))
