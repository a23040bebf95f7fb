"""BiFPN: weighted bidirectional feature pyramid (NHWC).

Capability match for reference src/YetAnotherEfficientDet.py:195-442:
8 separable-conv nodes per cell, fast-normalized attention weights
(ReLU + normalize, eps 1e-4), nearest 2x upsample, zero-padded stride-2
maxpool downsample. The first cell down-channels backbone P3/P4/P5 and
synthesizes P6 = maxpool(conv(P5)), P7 = maxpool(P6).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (BN_EPS, BN_MOMENTUM, SeparableConvBlock, max_pool_same,
                     swish, upsample_nearest_2x)


class _DownChannel(nn.Module):
    """1x1 conv + BN down-channel used by the first BiFPN cell
    (reference src/YetAnotherEfficientDet.py:238-266)."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        x = nn.Conv(self.features, (1, 1), padding='SAME', use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32, name='conv')(x)
        x = nn.BatchNorm(use_running_average=use_running_average,
                         momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name='bn')(x)
        return x


def _fuse2(w, a, b, eps):
    w = nn.relu(w)
    w = w / (jnp.sum(w) + eps)
    return w[0] * a + w[1] * b


def _fuse3(w, a, b, c, eps):
    w = nn.relu(w)
    w = w / (jnp.sum(w) + eps)
    return w[0] * a + w[1] * b + w[2] * c


class BiFPNCell(nn.Module):
    """One BiFPN cell with fast attention
    (reference src/YetAnotherEfficientDet.py:320-392)."""
    num_channels: int
    first_time: bool = False
    epsilon: float = 1e-4
    attention: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        ura = not train
        sep = lambda name: SeparableConvBlock(
            self.num_channels, norm=True, activation=False, dtype=self.dtype,
            name=name)
        eps = self.epsilon

        if self.first_time:
            p3, p4, p5 = inputs
            p6_in = _DownChannel(self.num_channels, dtype=self.dtype,
                                 name='p5_to_p6')(p5, ura)
            p6_in = max_pool_same(p6_in, 3, 2)
            p7_in = max_pool_same(p6_in, 3, 2)
            p3_in = _DownChannel(self.num_channels, dtype=self.dtype,
                                 name='p3_down_channel')(p3, ura)
            p4_in = _DownChannel(self.num_channels, dtype=self.dtype,
                                 name='p4_down_channel')(p4, ura)
            p5_in = _DownChannel(self.num_channels, dtype=self.dtype,
                                 name='p5_down_channel')(p5, ura)
        else:
            p3_in, p4_in, p5_in, p6_in, p7_in = inputs

        if self.attention:
            mk_w = lambda name, n: self.param(name, nn.initializers.ones,
                                              (n,), jnp.float32)
            fuse2 = lambda name, a, b: _fuse2(mk_w(name, 2), a, b, eps)
            fuse3 = lambda name, a, b, c: _fuse3(mk_w(name, 3), a, b, c, eps)
        else:
            fuse2 = lambda name, a, b: a + b
            fuse3 = lambda name, a, b, c: a + b + c

        # Top-down pathway
        p6_up = sep('conv6_up')(swish(fuse2('p6_w1', p6_in,
                                            upsample_nearest_2x(p7_in))), ura)
        p5_up = sep('conv5_up')(swish(fuse2('p5_w1', p5_in,
                                            upsample_nearest_2x(p6_up))), ura)
        p4_up = sep('conv4_up')(swish(fuse2('p4_w1', p4_in,
                                            upsample_nearest_2x(p5_up))), ura)
        p3_out = sep('conv3_up')(swish(fuse2('p3_w1', p3_in,
                                             upsample_nearest_2x(p4_up))), ura)

        if self.first_time:
            p4_in = _DownChannel(self.num_channels, dtype=self.dtype,
                                 name='p4_down_channel_2')(inputs[1], ura)
            p5_in = _DownChannel(self.num_channels, dtype=self.dtype,
                                 name='p5_down_channel_2')(inputs[2], ura)

        # Bottom-up pathway
        p4_out = sep('conv4_down')(swish(fuse3(
            'p4_w2', p4_in, p4_up, max_pool_same(p3_out, 3, 2))), ura)
        p5_out = sep('conv5_down')(swish(fuse3(
            'p5_w2', p5_in, p5_up, max_pool_same(p4_out, 3, 2))), ura)
        p6_out = sep('conv6_down')(swish(fuse3(
            'p6_w2', p6_in, p6_up, max_pool_same(p5_out, 3, 2))), ura)
        p7_out = sep('conv7_down')(swish(fuse2(
            'p7_w2', p7_in, max_pool_same(p6_out, 3, 2))), ura)

        return p3_out, p4_out, p5_out, p6_out, p7_out


class BiFPN(nn.Module):
    """Stack of BiFPN cells (first cell `first_time=True`), e.g. 112ch x 5
    repeats for D2 (reference src/YetAnotherEfficientDet.py:611-644)."""
    num_channels: int
    num_repeats: int
    attention: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, features, train: bool = False):
        for i in range(self.num_repeats):
            features = BiFPNCell(self.num_channels, first_time=(i == 0),
                                 attention=self.attention, dtype=self.dtype,
                                 name=f'cell_{i}')(features, train=train)
        return features
