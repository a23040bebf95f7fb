"""Fused MBConv inference kernel (Pallas, TPU).

Motivation (measured on v5e): the XLA lowering of EfficientNet runs each
MBConv block as ~10 separate kernels (expand conv, BN, swish, depthwise
conv, BN, swish, SE mean, 2 tiny SE matmuls, gating, project conv, BN,
skip) with HBM round-trips between them. For the deep half of the net
(input spatial <= 48..96 of B2 at 768px) the whole block's working set fits
in VMEM, so this kernel runs the ENTIRE block — expand 1x1 (MXU) -> swish
-> depthwise kxk (VPU shifted-MACs, fp32 accumulation) -> squeeze-excite ->
project 1x1 (MXU) -> residual — as ONE pallas_call per image, with the
BatchNorms folded into the conv weights beforehand (inference only;
reference semantics preserved since teachers and eval always run with
frozen BN, reference train_methods.py:891-893).

Mosaic-specific structure (each earned by a compile failure):
- expanded channels are padded to multiples of 128 at fold time so lane
  slices are aligned; padded channels are exact zeros end-to-end;
- the expanded activation lives in a VMEM scratch ref, written in static
  channel chunks (never materializing the full fp32 tensor);
- the depthwise taps run as a fori_loop over rows (dynamic offsets are
  unconstrained in dim 0) with a lax.switch over the k column offsets
  (static slices inside each branch; one live window at a time — a fully
  unrolled tap loop makes Mosaic stack-allocate every window -> VMEM OOM,
  and dynamic sublane offsets can't be proven 8-aligned).

Layout: NHWC; the 1x1 convs are (H*W, Cin) @ (Cin, Cout) MXU matmuls.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.efficientnet import BlockArgs
from ..models.layers import BN_EPS, same_pad_amounts

LANE = 128
CHUNK = 256  # channel chunk for the expand/dw/project loops


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


class FoldedMBConv(NamedTuple):
    """BN-folded MBConv weights, expanded channels padded to LANE multiples.
    Missing expand (expand_ratio == 1) is signalled by w_exp is None."""
    w_exp: Optional[jnp.ndarray]   # (Cin, CeP)
    b_exp: Optional[jnp.ndarray]   # (1, CeP)
    w_dw: jnp.ndarray              # (k, k, CeP)
    b_dw: jnp.ndarray              # (1, CeP)
    w_se1: jnp.ndarray             # (CeP, CsP)
    b_se1: jnp.ndarray             # (1, CsP)
    w_se2: jnp.ndarray             # (CsP, CeP)
    b_se2: jnp.ndarray             # (1, CeP)
    w_prj: jnp.ndarray             # (CeP, Co)
    b_prj: jnp.ndarray             # (1, Co)


def _fold_conv_bn(kernel, bn, eps=BN_EPS):
    scale = bn['scale'] / np.sqrt(bn['var'] + eps)
    k = kernel * scale.reshape((1,) * (kernel.ndim - 1) + (-1,))
    b = bn['bias'] - bn['mean'] * scale
    return k, b


def _pad_last(a: np.ndarray, size: int) -> np.ndarray:
    pad = size - a.shape[-1]
    if pad == 0:
        return a
    widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return np.pad(a, widths)


def _pad_axis(a: np.ndarray, size: int, axis: int) -> np.ndarray:
    pad = size - a.shape[axis]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return np.pad(a, widths)


def fold_mbconv(params: Dict, stats: Dict, args: BlockArgs) -> FoldedMBConv:
    """params/stats: the `_blocks_i` subtree of a trained EfficientNet."""
    p = {k: np.asarray(v['kernel']) for k, v in params.items()
         if 'kernel' in v}
    bn = lambda name: {k: np.asarray(v) for k, v in
                       {**params[name], **stats[name]}.items()}

    ce = args.input_filters * args.expand_ratio
    cep = _round_up(ce, LANE)

    if args.expand_ratio != 1:
        k, b = _fold_conv_bn(p['_expand_conv'], bn('_bn0'))
        w_exp = jnp.asarray(_pad_last(k[0, 0], cep), jnp.bfloat16)
        b_exp = jnp.asarray(_pad_last(b, cep)[None], jnp.float32)
    else:
        # no expand: Ce == Cin and the input is used directly (unpadded;
        # the kernel handles cep == round_up(cin) by padding on write)
        w_exp, b_exp = None, None

    k, b = _fold_conv_bn(p['_depthwise_conv'], bn('_bn1'))
    w_dw = jnp.asarray(_pad_last(k[:, :, 0, :], cep), jnp.float32)
    b_dw = jnp.asarray(_pad_last(b, cep)[None], jnp.float32)

    k, b = _fold_conv_bn(p['_project_conv'], bn('_bn2'))
    w_prj = jnp.asarray(_pad_axis(k[0, 0], cep, 0), jnp.bfloat16)
    b_prj = jnp.asarray(b[None], jnp.float32)

    cs = np.asarray(params['_se_reduce']['kernel']).shape[-1]
    csp = _round_up(cs, LANE)
    w_se1 = _pad_last(_pad_axis(
        np.asarray(params['_se_reduce']['kernel'])[0, 0], cep, 0), csp)
    b_se1 = _pad_last(np.asarray(params['_se_reduce']['bias']), csp)
    w_se2 = _pad_last(_pad_axis(
        np.asarray(params['_se_expand']['kernel'])[0, 0], csp, 0), cep)
    b_se2 = _pad_last(np.asarray(params['_se_expand']['bias']), cep)
    return FoldedMBConv(
        w_exp, b_exp, w_dw, b_dw,
        jnp.asarray(w_se1, jnp.float32), jnp.asarray(b_se1[None],
                                                     jnp.float32),
        jnp.asarray(w_se2, jnp.float32), jnp.asarray(b_se2[None],
                                                     jnp.float32),
        w_prj, b_prj)


def _swish_f32(x):
    return x * jax.nn.sigmoid(x)


def _mbconv_kernel(args: BlockArgs, h: int, w: int, cep: int,
                   has_skip: bool,
                   x_ref, w_exp_ref, b_exp_ref, w_dw_ref, b_dw_ref,
                   w_se1_ref, b_se1_ref, w_se2_ref, b_se2_ref,
                   w_prj_ref, b_prj_ref, o_ref):
    k = args.kernel_size
    s = args.stride
    ho, wo = h // s, w // s
    cin = args.input_filters
    co = o_ref.shape[-1]
    x = x_ref[0]                                   # (H, W, Cin) bf16
    xm = x.reshape(h * w, cin)

    (pt, pb) = same_pad_amounts(h, s, k)
    (pl_, pr) = same_pad_amounts(w, s, k)
    extra = s - 1
    hp = h + pt + pb + extra
    wp = w + pl_ + pr + extra
    n_chunks = max(1, cep // CHUNK)
    cc = cep // n_chunks                           # uniform chunk (128-mult)

    def body(ep_ref, d_ref, m_ref):
        # ---- expand 1x1 + swish, written in channel chunks ----
        ep_ref[:] = jnp.zeros((hp, wp, cep), jnp.bfloat16)
        for c in range(n_chunks):
            sl = slice(c * cc, (c + 1) * cc)
            if args.expand_ratio != 1:
                e_c = jnp.dot(xm, w_exp_ref[:, sl],
                              preferred_element_type=jnp.float32)
                e_c = _swish_f32(e_c + b_exp_ref[:, sl])
                e_c = e_c.astype(jnp.bfloat16)
            else:
                pad_c = cc - cin if cep > cin and c == n_chunks - 1 else 0
                src = xm[:, c * cc: c * cc + cc - pad_c]
                if pad_c:
                    src = jnp.pad(src, ((0, 0), (0, pad_c)))
                e_c = src
            ep_ref[pt:pt + h, pl_:pl_ + w, sl] = e_c.reshape(h, w, cc)

        # ---- depthwise kxk + swish + per-channel mean, chunked ----
        for c in range(n_chunks):
            sl = slice(c * cc, (c + 1) * cc)
            acc0 = jnp.broadcast_to(b_dw_ref[:, sl], (ho, wo, cc)) \
                .astype(jnp.float32)

            def row_taps(dy, acc):
                span = ep_ref[pl.ds(dy, s * ho), :, sl]  # (s*ho, wp, cc)
                wrow = w_dw_ref[pl.ds(dy, 1), :, sl]     # (1, k, cc)

                def make_branch(dx):
                    def branch(a):
                        win = jax.lax.slice(span, (0, dx, 0),
                                            (s * ho, dx + s * wo, cc))
                        if s != 1:
                            win = win.reshape(ho, s, wo, s, cc)[:, 0, :, 0, :]
                        return a + win.astype(jnp.float32) * wrow[0, dx]
                    return branch

                def tap(dx, a):
                    return jax.lax.switch(dx, [make_branch(i)
                                               for i in range(k)], a)

                return jax.lax.fori_loop(0, k, tap, acc)

            d_c = _swish_f32(jax.lax.fori_loop(0, k, row_taps, acc0))
            d_ref[:, :, sl] = d_c.astype(jnp.bfloat16)
            m_ref[:, sl] = jnp.mean(d_c.reshape(ho * wo, cc), axis=0,
                                    keepdims=True)

        # ---- squeeze-excite scales ----
        m = m_ref[:]                               # (1, CeP)
        s1 = _swish_f32(jnp.dot(m, w_se1_ref[:],
                                preferred_element_type=jnp.float32)
                        + b_se1_ref[:])
        s2 = jax.nn.sigmoid(jnp.dot(s1, w_se2_ref[:],
                                    preferred_element_type=jnp.float32)
                            + b_se2_ref[:])        # (1, CeP)

        # ---- project 1x1 (chunk-accumulated) + skip ----
        pm = jnp.broadcast_to(b_prj_ref[:], (ho * wo, co)).astype(
            jnp.float32)
        for c in range(n_chunks):
            sl = slice(c * cc, (c + 1) * cc)
            d_c = d_ref[:, :, sl].reshape(ho * wo, cc).astype(jnp.float32)
            d_c = (d_c * s2[:, sl]).astype(jnp.bfloat16)
            pm = pm + jnp.dot(d_c, w_prj_ref[sl, :],
                              preferred_element_type=jnp.float32)
        if has_skip:
            pm = pm + xm.astype(jnp.float32)
        o_ref[0] = pm.reshape(ho, wo, co).astype(jnp.bfloat16)

    pl.run_scoped(body,
                  pltpu.VMEM((hp, wp, cep), jnp.bfloat16),
                  pltpu.VMEM((ho, wo, cep), jnp.bfloat16),
                  pltpu.VMEM((1, cep), jnp.float32))


def mbconv_vmem_bytes(args: BlockArgs, h: int) -> int:
    """Upper-bound VMEM footprint of the fused kernel at input spatial h."""
    s = args.stride
    k = args.kernel_size
    ho = h // s
    cep = _round_up(args.input_filters * args.expand_ratio, LANE)
    cc = cep // max(1, cep // CHUNK)
    hp = h + k - 1 + s
    ep = hp * hp * cep * 2
    d = ho * ho * cep * 2
    x = h * h * args.input_filters * 2
    chunk_f32 = ho * ho * cc * 4
    span = s * ho * hp * cc * 2
    out = ho * ho * args.output_filters * 2
    return ep + d + x + 3 * chunk_f32 + 2 * span + out


def mbconv_fused(x: jnp.ndarray, folded: FoldedMBConv,
                 args: BlockArgs) -> jnp.ndarray:
    """x (B, H, W, Cin) bf16 -> (B, H/s, W/s, Co) bf16; one kernel per
    image (grid over batch)."""
    b, h, w, cin = x.shape
    s = args.stride
    co = folded.w_prj.shape[-1]
    cep = folded.w_dw.shape[-1]
    has_skip = args.id_skip and s == 1 and cin == co

    kernel = functools.partial(_mbconv_kernel, args, h, w, cep, has_skip)
    rep = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    if folded.w_exp is None:
        w_exp = jnp.zeros((1, LANE), jnp.bfloat16)
        b_exp = jnp.zeros((1, LANE), jnp.float32)
    else:
        w_exp, b_exp = folded.w_exp, folded.b_exp

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            rep(*w_exp.shape), rep(*b_exp.shape),
            rep(*folded.w_dw.shape), rep(*folded.b_dw.shape),
            rep(*folded.w_se1.shape), rep(*folded.b_se1.shape),
            rep(*folded.w_se2.shape), rep(*folded.b_se2.shape),
            rep(*folded.w_prj.shape), rep(*folded.b_prj.shape),
        ],
        out_specs=pl.BlockSpec((1, h // s, w // s, co),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // s, w // s, co),
                                       jnp.bfloat16),
    )(x.astype(jnp.bfloat16), w_exp, b_exp, folded.w_dw, folded.b_dw,
      folded.w_se1, folded.b_se1, folded.w_se2, folded.b_se2,
      folded.w_prj, folded.b_prj)
    return out
