"""Device-time microbenchmark harness immune to dispatch/sync overhead.

The axon relay costs ~27ms per host round-trip and block_until_ready is
unreliable there, so wall-clock measurements of single dispatches are
noise. `device_time` runs the function `iters` times inside ONE compiled
program via lax.scan with a loop-carried data dependency (no DCE, no
per-iteration dispatch), then takes a single host read as the barrier:

    per_iter_seconds = device_time(fn, args, iters=20)

Used by bench.py's component mode and the perf tests.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

def _perturb(args, eps):
    """Mix a tiny data-dependent epsilon into the first float array arg so
    every scan iteration depends on the previous one's result."""
    def mix(x):
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype,
                                                         jnp.floating):
            return x + eps.astype(x.dtype)
        return x
    mixed_first = False
    out = []
    for a in args:
        if not mixed_first and isinstance(a, jnp.ndarray) and \
                jnp.issubdtype(a.dtype, jnp.floating):
            out.append(mix(a))
            mixed_first = True
        else:
            out.append(a)
    return tuple(out)


def device_time(fn: Callable, args: Sequence[Any], iters: int = 20,
                warmup: bool = True) -> float:
    """Seconds per iteration of fn(*args), measured on device."""

    def summarize(res):
        leaves = [l for l in jax.tree_util.tree_leaves(res)
                  if isinstance(l, jnp.ndarray) and
                  jnp.issubdtype(l.dtype, jnp.floating)]
        if not leaves:
            leaves = [jnp.zeros(())]
        return sum(jnp.sum(l.astype(jnp.float32)) * 1e-12 for l in leaves)

    @jax.jit
    def run(args):
        def body(carry, _):
            res = fn(*_perturb(args, carry))
            return summarize(res), None
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return out

    if warmup:
        float(run(tuple(args)))
    t0 = time.perf_counter()
    float(run(tuple(args)))
    return (time.perf_counter() - t0) / iters
