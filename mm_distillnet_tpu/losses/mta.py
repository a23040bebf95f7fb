"""MTA (Multi-Teacher Alignment) attention-distillation loss.

The paper's contribution (reference src/loss/MTALoss.py:9-77):

  at(f) = L2-normalize(flatten(mean_over_channels(f^p)))      (p = 2)
  multi-teacher: elementwise product of per-teacher attention maps,
                 then L1-normalized;
  loss = KL(softmax(at_s / T) || softmax(at_t / T)), batchmean, T = 9.

Parity note: the reference passes softmax (NOT log_softmax) as the first
argument of F.kl_div, which expects log-probabilities. That nonstandard form
IS the trained behavior, so `parity_mode=True` (default) reproduces it:
  kl = sum(target * (log(target) - input)) / B   with input = softmax(s/T).
`parity_mode=False` computes the textbook KL with log_softmax.

Feature maps here are NHWC, so "channel mean" is over axis -1 and the
flattened spatial order (row-major H, W) matches the reference's NCHW
flatten.
"""
from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp


def attention_map(f: jnp.ndarray, p: float = 2.0) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*W) L2-normalized spatial attention
    (reference src/loss/MTALoss.py:76-77)."""
    f = f.astype(jnp.float32)
    a = jnp.mean(jnp.power(f, p), axis=-1)           # (B, H, W)
    a = a.reshape(a.shape[0], -1)                     # (B, HW)
    norm = jnp.linalg.norm(a, axis=1, keepdims=True)
    # F.normalize uses eps=1e-12 clamp on the norm
    return a / jnp.clip(norm, min=1e-12)


def _kl_batchmean(inp: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """F.kl_div(input, target, reduction='batchmean'):
    sum(target * (log(target) - input)) / batch, input given in log-space."""
    safe = jnp.where(target > 0, target * (jnp.log(jnp.clip(target, min=1e-38))
                                           - inp), 0.0)
    return jnp.sum(safe) / inp.shape[0]


def mta_loss_single(f_s: jnp.ndarray,
                    f_t: Union[jnp.ndarray, Sequence[jnp.ndarray]],
                    T: float = 9.0, p: float = 2.0,
                    parity_mode: bool = True) -> jnp.ndarray:
    """MTA loss for one pyramid level: student map vs one teacher map or a
    list of per-teacher maps (multi-teacher attention product,
    reference src/loss/MTALoss.py:36-73)."""
    at_s = attention_map(f_s, p)
    if isinstance(f_t, (list, tuple)):
        if len(f_t) == 1:
            at_t = attention_map(f_t[0], p)
        else:
            prod = attention_map(f_t[0], p)
            for t in f_t[1:]:
                prod = prod * attention_map(t, p)
            l1 = jnp.sum(jnp.abs(prod), axis=1, keepdims=True)
            at_t = prod / jnp.clip(l1, min=1e-12)
    else:
        at_t = attention_map(f_t, p)

    target = jax.nn.softmax(at_t / T, axis=1)
    if parity_mode:
        inp = jax.nn.softmax(at_s / T, axis=1)        # the reference's quirk
    else:
        inp = jax.nn.log_softmax(at_s / T, axis=1)
    return _kl_batchmean(inp, target)


def mta_loss(g_s: Sequence[jnp.ndarray],
             g_t: Sequence,
             T: float = 9.0, p: float = 2.0,
             parity_mode: bool = True) -> jnp.ndarray:
    """Multi-level MTA loss (reference src/loss/MTALoss.py:15-34).

    g_s: list of student pyramid features.
    g_t: either a list of teacher features (same length; one teacher), or a
         list of per-teacher feature lists (kdlist mode: true multi-teacher
         attention product per level).
    Returns a (num_levels,) vector of losses.
    """
    first = g_t[0]
    if isinstance(first, (list, tuple)):
        # kdlist: g_t = [teacher1_features, teacher2_features, ...]
        losses = [mta_loss_single(g_s[i], [ft[i] for ft in g_t], T, p,
                                  parity_mode)
                  for i in range(len(g_s))]
    else:
        losses = [mta_loss_single(fs, ft, T, p, parity_mode)
                  for fs, ft in zip(g_s, g_t)]
    return jnp.stack(losses)
