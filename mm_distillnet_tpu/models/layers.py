"""Shared NN layers with TF-SAME semantics, NHWC, for all model families.

The reference reproduces Keras/TF "SAME" padding inside PyTorch
(reference src/YetAnotherEfficientNet.py:27-104). On the JAX side,
``lax.conv_general_dilated`` with ``padding='SAME'`` implements exactly the
same asymmetric padding rule, so convolutions need no custom code. Max-pool
is different: the reference zero-pads then max-pools
(MaxPool2dStaticSamePadding, reference src/YetAnotherEfficientNet.py:68-104),
whereas a naive reduce_window 'SAME' pads with -inf — the results differ on
border cells whenever all in-window activations are negative. We replicate
the zero-pad semantics for weight parity.

All modules use NHWC layout (TPU-native) and accept a ``dtype`` for compute
(bf16 by default at call sites) while keeping fp32 parameters.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# BatchNorm constants used across every model in the reference
# (momentum 0.01 / eps 1e-3, reference src/YetAnotherEfficientDet.py:176).
# flax momentum is the running-average decay: 1 - torch_momentum.
BN_MOMENTUM = 0.99
BN_EPS = 1e-3


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x). The reference's MemoryEfficientSwish custom autograd op
    (src/YetAnotherEfficientNet.py:126-142) is identical math; XLA fuses it."""
    return x * jax.nn.sigmoid(x)


def same_pad_amounts(size: int, stride: int, kernel: int) -> Tuple[int, int]:
    """TF-SAME padding (lo, hi) for one spatial dim.

    Matches reference src/YetAnotherEfficientNet.py:53-60: extra =
    (ceil(s/stride)-1)*stride - s + k, split low = extra//2, high = rest.
    """
    extra = max((math.ceil(size / stride) - 1) * stride - size + kernel, 0)
    lo = extra // 2
    return lo, extra - lo


def max_pool_same(x: jnp.ndarray, kernel: int = 3, stride: int = 2) -> jnp.ndarray:
    """Zero-padded TF-SAME max pool, NHWC.

    Replicates MaxPool2dStaticSamePadding (F.pad with zeros then MaxPool,
    reference src/YetAnotherEfficientNet.py:90-103).
    """
    h, w = x.shape[-3], x.shape[-2]
    ph = same_pad_amounts(h, stride, kernel)
    pw = same_pad_amounts(w, stride, kernel)
    x = jnp.pad(x, ((0, 0), ph, pw, (0, 0)), mode='constant', constant_values=0)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding='VALID',
    ).astype(x.dtype)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC (nn.Upsample(scale_factor=2,
    mode='nearest') in reference src/YetAnotherEfficientDet.py:223-226)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ConvSame(nn.Module):
    """Conv2d with TF-SAME padding (NHWC). Equivalent to the reference's
    Conv2dStaticSamePadding (src/YetAnotherEfficientNet.py:27-65)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding='SAME',
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name='conv',
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm2d with the reference's momentum/eps; NHWC channel-last."""
    dtype: Any = None
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name='bn',
        )(x)


class SeparableConvBlock(nn.Module):
    """Depthwise 3x3 (no bias) + pointwise 1x1 (bias) [+ BN] [+ swish].

    Mirrors reference src/YetAnotherEfficientDet.py:154-192 (bias only on the
    pointwise conv).
    """
    features: int
    norm: bool = True
    activation: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), padding='SAME', feature_group_count=in_ch,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name='depthwise_conv')(x)
        x = nn.Conv(self.features, (1, 1), padding='SAME', use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name='pointwise_conv')(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=use_running_average,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name='bn')(x)
        if self.activation:
            x = swish(x)
        return x


def drop_connect(x: jnp.ndarray, rate: float, deterministic: bool,
                 rng: Optional[jax.Array]) -> jnp.ndarray:
    """Per-sample stochastic depth (reference src/YetAnotherEfficientNet.py:176-186)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jnp.floor(keep + jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype))
    return x / keep * mask
