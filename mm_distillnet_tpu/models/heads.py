"""Box-regression and classification heads (shared towers, per-level BN).

Capability match for reference src/YetAnotherEfficientDet.py:445-532:
- a tower of `num_layers` separable convs whose conv weights are shared
  across pyramid levels, but with per-(level, layer) BatchNorm;
- a separable-conv header projecting to num_anchors*4 (boxes) or
  num_anchors*num_classes (sigmoid scores);
- returns the concatenated (B, sum(H*W*A), 4 or C) predictions plus the
  pre-header feature of the last pyramid level ("alignment" feature used by
  features_from='header').

NHWC makes the reference's permute(0,2,3,1) a no-op: reshaping
(B, H, W, A*K) -> (B, H*W*A, K) preserves the (row-major cell, anchor)
ordering that the anchor table uses.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_EPS, BN_MOMENTUM, swish


class _Tower(nn.Module):
    """Shared-conv / per-level-BN tower + header."""
    num_layers: int
    header_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        in_ch = inputs[0].shape[-1]
        # Shared conv parameters across levels: instantiate once, call per level.
        convs_dw = [nn.Conv(in_ch, (3, 3), padding='SAME',
                            feature_group_count=in_ch, use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f'conv_{i}_depthwise')
                    for i in range(self.num_layers)]
        convs_pw = [nn.Conv(in_ch, (1, 1), padding='SAME', use_bias=True,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f'conv_{i}_pointwise')
                    for i in range(self.num_layers)]
        header_dw = nn.Conv(in_ch, (3, 3), padding='SAME',
                            feature_group_count=in_ch, use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name='header_depthwise')
        header_pw = nn.Conv(self.header_features, (1, 1), padding='SAME',
                            use_bias=True, dtype=self.dtype,
                            param_dtype=jnp.float32, name='header_pointwise')

        outputs: List[jnp.ndarray] = []
        align = None
        for level, feat in enumerate(inputs):
            for i in range(self.num_layers):
                feat = convs_dw[i](feat)
                feat = convs_pw[i](feat)
                feat = nn.BatchNorm(use_running_average=not train,
                                    momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                    dtype=self.dtype, param_dtype=jnp.float32,
                                    name=f'bn_{level}_{i}')(feat)
                feat = swish(feat)
            align = feat  # pre-header feature; last level's survives
            out = header_pw(header_dw(feat))
            outputs.append(out)
        return outputs, align


class Regressor(nn.Module):
    """Box head: outputs (B, total_anchors, 4) deltas (dy, dx, dh, dw)
    (reference src/YetAnotherEfficientDet.py:445-487)."""
    num_anchors: int
    num_layers: int
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs, align = _Tower(self.num_layers, self.num_anchors * 4,
                             dtype=self.dtype, name='tower')(inputs, train)
        flat = [o.reshape(o.shape[0], -1, 4) for o in outs]
        return jnp.concatenate(flat, axis=1), align


class Classifier(nn.Module):
    """Class head: outputs (B, total_anchors, num_classes) sigmoid scores
    (reference src/YetAnotherEfficientDet.py:490-532).

    Also returns the pre-sigmoid logits: the focal loss consumes them
    directly (log(sigmoid(x)) == -softplus(-x)), halving the
    transcendental count of the training step's hottest elementwise chain
    while the sigmoid output keeps API parity with the reference (and is
    dead-code-eliminated by XLA whenever only the logits are used)."""
    num_anchors: int
    num_classes: int
    num_layers: int
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs, align = _Tower(self.num_layers,
                             self.num_anchors * self.num_classes,
                             dtype=self.dtype, name='tower')(inputs, train)
        flat = [o.reshape(o.shape[0], -1, self.num_classes) for o in outs]
        scores = jnp.concatenate(flat, axis=1)
        return nn.sigmoid(scores), scores, align
