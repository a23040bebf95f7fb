"""Exact BatchNorm running-statistics recalibration.

BatchNorm running stats decay toward the true activation statistics at
``momentum`` per step (0.99 here, matching the reference's torch momentum
0.01, src/YetAnotherEfficientDet.py:176). Long reference runs (50 epochs x
56k steps) converge them for free; short runs (convergence tests, few-epoch
smoke training) leave them blended with their random init, which collapses
the eval-mode forward toward an input-independent output while train-mode
predictions are already sharp.

This module recomputes the stats exactly rather than waiting out the decay:
one train-mode forward per batch updates the running stats by
``new = m * old + (1 - m) * batch``, so the RAW batch statistics are
recoverable as ``batch = (new - m * old) / (1 - m)``; averaging the raw
stats over a sweep of batches is the standard BN re-estimation pass
(population mean of batch means / batch variances).
"""
from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp

from ..models.layers import BN_MOMENTUM


def recalibrate_batch_stats(model, variables, batches: Iterable,
                            momentum: float = BN_MOMENTUM,
                            rng=None,
                            apply_fn: Callable = None):
    """Returns variables with batch_stats replaced by the average raw batch
    statistics over ``batches`` (an iterable of model inputs).

    ``apply_fn(variables, x, rng) -> mutated_batch_stats`` can override the
    default train-mode apply (e.g. for models taking dict inputs)."""
    params = variables['params']
    stats = variables.get('batch_stats', {})
    if not stats:
        return variables
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    if apply_fn is None:
        @jax.jit
        def apply_fn(variables, x, rng):
            _, mutated = model.apply(variables, x, train=True,
                                     mutable=['batch_stats'],
                                     rngs={'dropout': rng})
            return mutated['batch_stats']

    @jax.jit
    def raw_and_add(new_stats, old_stats, acc):
        raw = jax.tree_util.tree_map(
            lambda n, o: (n - momentum * o) / (1.0 - momentum),
            new_stats, old_stats)
        return jax.tree_util.tree_map(jnp.add, acc, raw)

    acc = jax.tree_util.tree_map(jnp.zeros_like, stats)
    count = 0
    for x in batches:
        rng, sub = jax.random.split(rng)
        new_stats = apply_fn({'params': params, 'batch_stats': stats}, x,
                             sub)
        acc = raw_and_add(new_stats, stats, acc)
        count += 1
    if count == 0:
        return variables
    mean_stats = jax.tree_util.tree_map(lambda s: s / count, acc)
    out = dict(variables)
    out['batch_stats'] = mean_stats
    return out
