"""TF-SAME padding parity: JAX 'SAME' conv vs the reference's manual-pad
PyTorch conv semantics; zero-padded maxpool parity."""
import jax
import jax.numpy as jnp
import math
import numpy as np
import torch
import torch.nn.functional as F

from mm_distillnet_tpu.models.layers import max_pool_same, same_pad_amounts


def _torch_same_conv(x_nchw, w_oihw, stride, groups=1):
    """Manual TF-SAME pad + VALID conv, as Conv2dStaticSamePadding does."""
    h, w = x_nchw.shape[-2:]
    k = w_oihw.shape[-1]
    eh = max((math.ceil(w / stride) - 1) * stride - w + k, 0)
    ev = max((math.ceil(h / stride) - 1) * stride - h + k, 0)
    x = F.pad(x_nchw, [eh // 2, eh - eh // 2, ev // 2, ev - ev // 2])
    return F.conv2d(x, w_oihw, stride=stride, groups=groups)


def test_same_conv_matches_torch_manual_pad():
    rng = np.random.default_rng(0)
    for size, k, stride in [(13, 3, 2), (12, 3, 2), (12, 5, 2), (9, 3, 1),
                            (7, 1, 1), (10, 5, 1)]:
        x = rng.normal(size=(1, size, size, 4)).astype(np.float32)
        w = rng.normal(size=(k, k, 4, 6)).astype(np.float32) * 0.1
        out_jax = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (stride, stride), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        w_t = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
        out_t = _torch_same_conv(torch.from_numpy(x).permute(0, 3, 1, 2),
                                 w_t, stride)
        np.testing.assert_allclose(
            np.asarray(out_jax), out_t.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4)


def test_depthwise_same_conv_matches_torch():
    rng = np.random.default_rng(1)
    c = 8
    x = rng.normal(size=(2, 12, 12, c)).astype(np.float32)
    w = rng.normal(size=(3, 3, 1, c)).astype(np.float32) * 0.1
    out_jax = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=c)
    w_t = torch.from_numpy(w).permute(3, 2, 0, 1)  # (C,1,3,3)
    out_t = _torch_same_conv(torch.from_numpy(x).permute(0, 3, 1, 2),
                             w_t, 2, groups=c)
    np.testing.assert_allclose(np.asarray(out_jax),
                               out_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_maxpool_zero_pad_semantics():
    """The reference zero-pads before max-pooling: border maxes of an
    all-negative map are 0 there, not the map max. Verify we match torch
    F.pad + max_pool2d, not -inf padding."""
    rng = np.random.default_rng(2)
    for size in (12, 13, 96):
        x = (-np.abs(rng.normal(size=(1, size, size, 3)))).astype(np.float32)
        ours = np.asarray(max_pool_same(jnp.asarray(x), 3, 2))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        eh = max((math.ceil(size / 2) - 1) * 2 - size + 3, 0)
        xt = F.pad(xt, [eh // 2, eh - eh // 2, eh // 2, eh - eh // 2])
        theirs = F.max_pool2d(xt, 3, 2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=0)


def test_same_pad_amounts():
    assert same_pad_amounts(96, 2, 3) == (0, 1)
    assert same_pad_amounts(97, 2, 3) == (1, 1)
    assert same_pad_amounts(8, 1, 3) == (1, 1)
