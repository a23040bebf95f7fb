"""StereoSoundNet: YOLOv2/Darknet-19-style 8-channel audio baseline (NHWC).

Capability match for reference src/StereoSoundNet.py:10-204 — the paper's
prior-work comparison model: 13 Darknet conv stages, a parallel passthrough
branch with a space-to-depth reorg (2x2 -> channels), concat, detection
head with 5 anchors x (5 + num_classes) outputs. Returns (output, features)
like the reference so it plugs into the same distillation machinery.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

YOLO_ANCHORS = ((1.3221, 1.73145), (3.19275, 4.00944), (5.05587, 8.09892),
                (9.47112, 4.84053), (11.2364, 10.0071))


class _ConvBNLeaky(nn.Module):
    features: int
    kernel: int = 3
    pool: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding='SAME' if self.kernel == 3 else 'VALID',
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name='bn')(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        if self.pool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def space_to_depth_2x(x: jnp.ndarray) -> jnp.ndarray:
    """The YOLOv2 passthrough reorg (reference src/StereoSoundNet.py:180-193):
    (B, H, W, C) -> (B, H/2, W/2, 4C) with the reference's exact channel
    ordering (spatial offsets major, channels minor, after the /4 split)."""
    b, h, w, c = x.shape
    # torch: view(B, C/4, H, 2, W, 2) on NCHW -> permute(0,3,5,1,2,4)
    # -> view(B, -1, H/2, W/2). Emulate via NCHW round-trip for exactness.
    # torch's view is a flat reinterpretation of the contiguous (C, H, W)
    # buffer as (C/4, H, 2, W, 2) — NOT a standard space-to-depth; jnp
    # reshape on the NCHW layout reproduces it bit-exactly.
    nchw = jnp.transpose(x, (0, 3, 1, 2))
    v = nchw.reshape(b, c // 4, h, 2, w, 2)
    v = jnp.transpose(v, (0, 3, 5, 1, 2, 4))
    v = v.reshape(b, -1, h // 2, w // 2)
    return jnp.transpose(v, (0, 2, 3, 1))


class StereoSoundNet(nn.Module):
    num_classes: int = 20
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype) if self.dtype is not None else x
        cfg1 = [(32, 3, True), (64, 3, True), (128, 3, False), (64, 1, False),
                (128, 3, True), (256, 3, False), (128, 1, False),
                (256, 3, True), (512, 3, False), (256, 1, False),
                (512, 3, False), (256, 1, False), (512, 3, False)]
        for i, (f, k, p) in enumerate(cfg1):
            x = _ConvBNLeaky(f, k, p, dtype=self.dtype,
                             name=f'stage1_conv{i + 1}')(x, train)
        residual = x

        y = nn.max_pool(x, (2, 2), strides=(2, 2))
        cfg2 = [(1024, 3), (512, 1), (1024, 3), (512, 1), (1024, 3),
                (1024, 3), (1024, 3)]
        for i, (f, k) in enumerate(cfg2):
            y = _ConvBNLeaky(f, k, False, dtype=self.dtype,
                             name=f'stage2_a_conv{i + 1}')(y, train)

        z = _ConvBNLeaky(64, 1, False, dtype=self.dtype,
                         name='stage2_b_conv')(residual, train)
        z = space_to_depth_2x(z)

        out = jnp.concatenate([y, z], axis=-1)
        out = _ConvBNLeaky(1024, 3, False, dtype=self.dtype,
                           name='stage3_conv1')(out, train)
        features = out
        out = nn.Conv(len(YOLO_ANCHORS) * (5 + self.num_classes), (1, 1),
                      padding='VALID', use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name='stage3_conv2')(out)
        return out.astype(jnp.float32), features
