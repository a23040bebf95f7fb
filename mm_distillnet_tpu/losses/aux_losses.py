"""Auxiliary distillation losses for capability parity.

- DistillKL: Hinton KD (reference src/loss/DistillKL.py:17-31).
- AttentionLoss: Zagoruyko AT transfer, MSE between attention maps with
  adaptive-pool size matching (reference src/loss/AttentionLoss.py:17-40).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .mta import attention_map


def distill_kl(logits_s: jnp.ndarray, logits_t: jnp.ndarray,
               T: float = 4.0, axis: int = 1) -> jnp.ndarray:
    """KL(log_softmax(s/T) || softmax(t/T)) * T^2 / B
    (reference src/loss/DistillKL.py:24-31; axis=1 is the class axis of the
    RepDistiller original's (B, C) inputs — detector callers pass axis=-1
    so the softmax stays over classes for (B, N_anchors, C) logits)."""
    log_p_s = jax.nn.log_softmax(logits_s / T, axis=axis)
    p_t = jax.nn.softmax(logits_t / T, axis=axis)
    kl = jnp.sum(p_t * (jnp.log(jnp.clip(p_t, min=1e-38)) - log_p_s))
    return kl * (T ** 2) / logits_s.shape[0]


def _adaptive_avg_pool_hw(x: jnp.ndarray, out_hw: int) -> jnp.ndarray:
    """NHWC adaptive average pool to (out_hw, out_hw); sizes here are always
    integer multiples (pyramid levels), so a reshape-mean suffices."""
    b, h, w, c = x.shape
    fh, fw = h // out_hw, w // out_hw
    x = x.reshape(b, out_hw, fh, out_hw, fw, c)
    return x.mean(axis=(2, 4))


def attention_transfer_loss(g_s: Sequence[jnp.ndarray],
                            g_t: Sequence[jnp.ndarray],
                            p: float = 2.0) -> jnp.ndarray:
    """Zagoruyko AT: mean squared difference of attention maps per level;
    the smaller map's spatial size wins (reference
    src/loss/AttentionLoss.py:24-35). Returns (num_levels,) losses."""
    losses = []
    for f_s, f_t in zip(g_s, g_t):
        hs, ht = f_s.shape[1], f_t.shape[1]
        if hs > ht:
            f_s = _adaptive_avg_pool_hw(f_s, ht)
        elif ht > hs:
            f_t = _adaptive_avg_pool_hw(f_t, hs)
        losses.append(jnp.mean((attention_map(f_s, p) -
                                attention_map(f_t, p)) ** 2))
    return jnp.stack(losses)
