"""Shared test helpers: cheap deterministic init for plumbing tests.

jit-compiling `module.init` is the single most expensive operation in the
CPU test suite — ~60 s even for the tiny (compound_coef=-1) profile, and
XLA:CPU spends nearly all of it compiling the threefry/truncated-normal
initializer graphs, not the model itself. Plumbing tests don't need
lecun-normal draws — they need finite outputs, sane BN statistics, and
nonzero gradients — so `fast_init` fills parameters from a numpy RNG over
the `jax.eval_shape` skeleton (pure tracing, no XLA compile at all):
~5 s instead of ~60 s per network.

Numerics/parity tests (torch-oracle comparisons, weight conversion) must
keep real inits and real compound coefficients; this helper is for
plumbing tests only.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


def fast_init(module, seed, *args, **kwargs):
    """Variables for `module` with the same tree/shapes/dtypes as
    `module.init`, filled without compiling: BN scale/var = 1,
    bias/mean = 0, everything else ~ N(0, 0.05^2).

    kwargs (e.g. train=False) are bound via partial so eval_shape does not
    trace them — a traced `train` turns flax's python `if train` branches
    into TracerBoolConversionError."""
    shapes = jax.eval_shape(functools.partial(module.init, **kwargs),
                            jax.random.PRNGKey(0), *args)
    rng = np.random.default_rng(seed)

    def fill(path, s):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        if name in ('scale', 'var'):
            return jnp.ones(s.shape, s.dtype)
        if name in ('bias', 'mean'):
            return jnp.zeros(s.shape, s.dtype)
        return jnp.asarray(
            rng.standard_normal(s.shape).astype(np.float32) * 0.05,
            dtype=s.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def fast_train_state(module, seed, sample_input, tx):
    """TrainState built from fast_init variables (no jitted module.init)."""
    from mm_distillnet_tpu.distill.train_step import init_train_state
    variables = fast_init(module, seed, sample_input)
    return init_train_state(module, jax.random.PRNGKey(seed), sample_input,
                            tx, variables=variables)
