"""Separable bicubic resize as two matmuls (cv2.INTER_CUBIC-compatible).

The reference stretches the (80, T, 8) spectrogram to 768x768 with
cv2.resize(..., interpolation=cv2.INTER_CUBIC)
(reference src/datasets/transformations.py:443-448,
src/datasets/MultimodalDetection.py:347-351). OpenCV's bicubic kernel uses
A = -0.75 with half-pixel centers and replicated borders. We precompute the
(out, in) interpolation matrices per axis and apply them as two dense
matmuls — MXU work instead of a gather-heavy kernel, and jit-fusable with
the rest of the input pipeline.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

_A = -0.75  # OpenCV's bicubic coefficient


def _cubic_kernel(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (_A + 2.0) * ax3 - (_A + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0,
                 _A * ax3 - 5.0 * _A * ax2 + 8.0 * _A * ax - 4.0 * _A,
                 0.0))
    return w


@functools.lru_cache(maxsize=None)
def resize_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) bicubic interpolation matrix with half-pixel
    centers and clamped (replicated) borders, matching cv2.resize."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in (-1, 0, 1, 2):
        w = _cubic_kernel(tap - frac)
        idx = np.clip(base + tap, 0, in_size - 1)
        np.add.at(mat, (dst.astype(np.int64), idx), w)
    return mat.astype(np.float32)


@functools.partial(jax.jit, static_argnames=('out_h', 'out_w'))
def resize_bicubic(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(..., H, W, C) -> (..., out_h, out_w, C) bicubic resize."""
    h, w = img.shape[-3], img.shape[-2]
    wy = jnp.asarray(resize_matrix(out_h, h))
    wx = jnp.asarray(resize_matrix(out_w, w))
    x = img.astype(jnp.float32)
    x = jnp.einsum('oh,...hwc->...owc', wy, x,
                   preferred_element_type=jnp.float32)
    x = jnp.einsum('pw,...owc->...opc', wx, x,
                   preferred_element_type=jnp.float32)
    return x


@functools.partial(jax.jit, static_argnames=('out_h', 'out_w'))
def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear variant (cv2 default INTER_LINEAR) for image modalities."""
    return jax.image.resize(img.astype(jnp.float32),
                            img.shape[:-3] + (out_h, out_w, img.shape[-1]),
                            method='linear')


def stretch_mel_axis(x: jnp.ndarray, out_h: int) -> jnp.ndarray:
    """(..., H_mel, W, C) -> (..., out_h, W, C): the device half of the
    compact audio ingest (config `device_audio_resize`).

    The reference stretches the (80, T, 8) log-mel stack to 768x768 on the
    HOST with cv2.INTER_CUBIC (src/datasets/transformations.py:443-448) and
    ships 768^2 x 8 floats per frame over the host->device link. Bicubic is
    separable, so the host instead stretches only the (cheap, 80-row) time
    axis to `common_size` and this matmul stretches the 80-mel axis
    on-device — 9.6x fewer audio infeed bytes for an identical result
    (tests/test_device_ingest.py pins equality against the full cv2
    stretch). No-op when the input is already at out_h."""
    h = x.shape[-3]
    if h == out_h:
        return x
    wy = jnp.asarray(resize_matrix(out_h, h))
    y = jnp.einsum('oh,...hwc->...owc', wy, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


# The dataset mel frontend produces exactly this many mel bins
# (reference src/utils/post_processing.py librosa n_mels=80); the compact
# ingest ships (B, 80, S, M) stacks, so 80 is the ONLY height besides
# image_size that a well-formed batch can carry.
MEL_BINS = 80


def maybe_stretch_mel_axis(x: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """Static-shape dispatch for the compact audio ingest: full-size
    batches pass through untouched; (B, 80, S, M) compact stacks get the
    on-device mel-axis stretch; anything else is a malformed batch and
    raises at trace time rather than being silently resized."""
    h = x.shape[-3]
    if h == image_size:
        return x
    if h != MEL_BINS:
        raise ValueError(
            f'batch height {h} is neither image_size={image_size} nor the '
            f'compact-ingest mel-bin count {MEL_BINS}; refusing to resize a '
            f'malformed input (shape {x.shape})')
    return stretch_mel_axis(x, image_size)
