"""Fused Pallas MBConv vs the flax reference block (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_distillnet_tpu.models.efficientnet import BlockArgs, MBConvBlock
from mm_distillnet_tpu.ops import pallas_mbconv
from mm_distillnet_tpu.ops.pallas_mbconv import fold_mbconv, mbconv_fused


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        functools.partial(orig, interpret=True))
    # the module imported pl directly; patch its reference too
    monkeypatch.setattr(pallas_mbconv.pl, 'pallas_call',
                        functools.partial(orig, interpret=True))


@pytest.mark.parametrize('args', [
    BlockArgs(3, 1, 16, 16, 6, 1),          # expand + skip
    BlockArgs(5, 1, 16, 24, 6, 1),          # expand, no skip (C changes)
    BlockArgs(3, 1, 32, 16, 1, 1),          # no expand (ratio 1)
    BlockArgs(3, 1, 16, 24, 6, 2),          # stride 2
    BlockArgs(5, 1, 16, 24, 6, 2),          # stride 2, k5
])
def test_fused_matches_flax_block(args):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, args.input_filters), jnp.float32)
    block = MBConvBlock(args, dtype=jnp.float32)
    variables = block.init(jax.random.PRNGKey(1), x)
    want = block.apply(variables, x, train=False)

    folded = fold_mbconv(variables['params'], variables['batch_stats'], args)
    got = mbconv_fused(x.astype(jnp.bfloat16), folded, args)
    assert got.shape == want.shape
    # bf16 storage between ops: compare loosely but meaningfully
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.05)
    # correlation should be essentially 1
    a = np.asarray(got, np.float32).ravel()
    b = np.asarray(want).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr
