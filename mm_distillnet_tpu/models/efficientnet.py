"""EfficientNet backbone (B0..B7), NHWC feature-pyramid extractor.

Re-implements the capability of reference src/YetAnotherEfficientNet.py
(stem conv s2 -> MBConv blocks with expand/depthwise/SE/project -> feature
taps before each stride-2 block) as a flax module, TPU-first: NHWC layout,
bf16-friendly, TF-SAME padding via XLA's native 'SAME'.

Scaling rules follow the published EfficientNet recipe, matching
round_filters / round_repeats (reference src/YetAnotherEfficientNet.py:150-172)
so that converted PyTorch weights line up shape-for-shape.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_EPS, BN_MOMENTUM, drop_connect, swish


@dataclass(frozen=True)
class BlockArgs:
    kernel_size: int
    num_repeat: int
    input_filters: int
    output_filters: int
    expand_ratio: int
    stride: int
    se_ratio: float = 0.25
    id_skip: bool = True


# The canonical EfficientNet-B0 stage table (reference
# src/YetAnotherEfficientNet.py:321-326, 'r1_k3_s11_e1_i32_o16_se0.25' etc.)
BASE_BLOCKS: Tuple[BlockArgs, ...] = (
    BlockArgs(3, 1, 32, 16, 1, 1),
    BlockArgs(3, 2, 16, 24, 6, 2),
    BlockArgs(5, 2, 24, 40, 6, 2),
    BlockArgs(3, 3, 40, 80, 6, 2),
    BlockArgs(5, 3, 80, 112, 6, 1),
    BlockArgs(5, 4, 112, 192, 6, 2),
    BlockArgs(3, 1, 192, 320, 6, 1),
)

# width, depth, resolution, dropout (reference src/YetAnotherEfficientNet.py:226-241)
# Key -1 is the TEST-TINY profile: same topology (stem + 7 stages, same
# stride structure, so the P3..P5 taps exist), ~10x fewer channels and one
# block per stage — for plumbing tests and doc examples where compile time
# matters and capacity doesn't. NOT a reference configuration; no
# pretrained weights exist for it.
EFFICIENTNET_PARAMS = {
    -1: (0.25, 0.1, 64, 0.0),
    0: (1.0, 1.0, 224, 0.2),
    1: (1.0, 1.1, 240, 0.2),
    2: (1.1, 1.2, 260, 0.3),
    3: (1.2, 1.4, 300, 0.3),
    4: (1.4, 1.8, 380, 0.4),
    5: (1.6, 2.2, 456, 0.4),
    6: (1.8, 2.6, 528, 0.5),
    7: (2.0, 3.1, 600, 0.5),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """Reference src/YetAnotherEfficientNet.py:150-162."""
    if not width:
        return filters
    filters *= width
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth: float) -> int:
    """Reference src/YetAnotherEfficientNet.py:165-170."""
    if not depth:
        return repeats
    return int(math.ceil(depth * repeats))


def expand_block_args(compound_coef: int) -> List[BlockArgs]:
    """Expand the stage table into the per-block list (after width/depth
    scaling), one entry per MBConv block; first block of each stage carries
    the stage stride (reference src/YetAnotherEfficientNet.py:524-538)."""
    width, depth, _, _ = EFFICIENTNET_PARAMS[compound_coef]
    blocks: List[BlockArgs] = []
    for args in BASE_BLOCKS:
        inp = round_filters(args.input_filters, width)
        out = round_filters(args.output_filters, width)
        reps = round_repeats(args.num_repeat, depth)
        blocks.append(BlockArgs(args.kernel_size, 1, inp, out,
                                args.expand_ratio, args.stride,
                                args.se_ratio, args.id_skip))
        for _ in range(reps - 1):
            blocks.append(BlockArgs(args.kernel_size, 1, out, out,
                                    args.expand_ratio, 1,
                                    args.se_ratio, args.id_skip))
    return blocks


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck: expand 1x1 -> depthwise kxk -> SE ->
    project 1x1, swish activations, drop-connect on the skip
    (reference src/YetAnotherEfficientNet.py:402-489)."""
    args: BlockArgs
    drop_connect_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.args
        inputs = x
        oup = a.input_filters * a.expand_ratio
        conv = lambda feats, k, s, groups, bias, name: nn.Conv(
            feats, (k, k), strides=(s, s), padding='SAME',
            feature_group_count=groups, use_bias=bias, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)

        if a.expand_ratio != 1:
            x = conv(oup, 1, 1, 1, False, '_expand_conv')(x)
            x = bn('_bn0')(x)
            x = swish(x)

        x = conv(oup, a.kernel_size, a.stride, oup, False, '_depthwise_conv')(x)
        x = bn('_bn1')(x)
        x = swish(x)

        # Squeeze-and-excitation: squeeze channels derived from *input*
        # filters (reference src/YetAnotherEfficientNet.py:440-443).
        if a.se_ratio and 0 < a.se_ratio <= 1:
            squeezed = max(1, int(a.input_filters * a.se_ratio))
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
            s = conv(squeezed, 1, 1, 1, True, '_se_reduce')(s)
            s = swish(s)
            s = conv(oup, 1, 1, 1, True, '_se_expand')(s)
            x = jax.nn.sigmoid(s) * x

        x = conv(a.output_filters, 1, 1, 1, False, '_project_conv')(x)
        x = bn('_bn2')(x)

        if a.id_skip and a.stride == 1 and a.input_filters == a.output_filters:
            rng = self.make_rng('dropout') if (train and self.drop_connect_rate) else None
            x = drop_connect(x, self.drop_connect_rate, not train, rng)
            x = x + inputs
        return x


class _SpaceToDepthStem(nn.Module):
    """The 3x3 stride-2 stem conv re-expressed EXACTLY as a 2x2 stride-1
    conv over a 2x2 space-to-depth rearrangement of the input.

    Motivation (TPU): the stem sees 1/3/8 input channels — a tiny fraction
    of the 128-lane registers the conv gets tiled onto; s2d quadruples the
    contraction depth (4C channels at half resolution) for the same math.
    Derivation: with TF-SAME (pad (0,1) both dims for even input),
    y[i,j] = sum_{di,dj<3} w[di,dj] x[2i+di, 2j+dj]; writing 2i+di =
    2(i+p)+a with p=di//2, a=di%2 maps every tap onto block offset
    p in {0,1} and within-block offset a in {0,1} — a 2x2 kernel over the
    (a, b, c) channels, zero where 2p+a > 2. The parameter keeps the
    reference shape (3, 3, C, O) under the same '_conv_stem' name, so
    checkpoints load unchanged and the rewrite is a pure runtime choice.
    """
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, 's2d stem needs even input dims'
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, c, self.features), jnp.float32)
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        w2 = jnp.zeros((2, 2, 2, 2, c, self.features), kernel.dtype)
        for p in (0, 1):
            for q in (0, 1):
                for a in (0, 1):
                    for bb in (0, 1):
                        di, dj = 2 * p + a, 2 * q + bb
                        if di <= 2 and dj <= 2:
                            w2 = w2.at[p, q, a, bb].set(kernel[di, dj])
        w2 = w2.reshape(2, 2, 4 * c, self.features)
        if self.dtype is not None:
            xs = xs.astype(self.dtype)
            w2 = w2.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            xs, w2, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class EfficientNetFeatures(nn.Module):
    """Backbone feature extractor returning the 4-level pyramid
    [P2, P3, P4, P5] (the reference taps the activation before each stride-2
    block plus the final block output and drops the first tap,
    src/YetAnotherEfficientDet.py:550-572 — callers use [1:], i.e. P3..P5).

    in_channels is carried by the input array (1 thermal / 3 rgb+depth /
    8 audio); flax infers the stem kernel from it
    (reference src/YetAnotherEfficientNet.py:596-604 stem swap).
    s2d_stem=True runs the stem as the space-to-depth rewrite
    (_SpaceToDepthStem — same parameters, same values).
    """
    compound_coef: int = 2
    drop_connect_rate: float = 0.2
    dtype: Any = None
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, _, _, _ = EFFICIENTNET_PARAMS[self.compound_coef]
        blocks = expand_block_args(self.compound_coef)

        stem = round_filters(32, width)
        if self.s2d_stem:
            x = _SpaceToDepthStem(stem, dtype=self.dtype,
                                  name='_conv_stem')(x)
        else:
            x = nn.Conv(stem, (3, 3), strides=(2, 2), padding='SAME',
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name='_conv_stem')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype,
                         param_dtype=jnp.float32, name='_bn0')(x)
        x = swish(x)

        feature_maps = []
        last_x = None
        n = len(blocks)
        for idx, args in enumerate(blocks):
            rate = self.drop_connect_rate * float(idx) / n
            if args.stride == 2:
                feature_maps.append(last_x)
            x = MBConvBlock(args, drop_connect_rate=rate, dtype=self.dtype,
                            name=f'_blocks_{idx}')(x, train=train)
            if idx == n - 1:
                feature_maps.append(x)
            last_x = x
        # feature_maps = [P1, P2, P3, P4, P5]; drop P1.
        return feature_maps[1:]


def backbone_feature_channels(compound_coef: int) -> Tuple[int, int, int]:
    """Channels of P3/P4/P5 for the BiFPN first cell (reference
    src/YetAnotherEfficientDet.py:625-634 conv_channel_coef)."""
    width, _, _, _ = EFFICIENTNET_PARAMS[compound_coef]
    # P3 = stage2 out, P4 = stage4 out (112 base), P5 = stage6 out (320 base)
    return (round_filters(40, width), round_filters(112, width),
            round_filters(320, width))
