"""Row-tiled fused MBConv kernel for the bandwidth-bound EARLY blocks.

Why a second MBConv kernel (see ops/pallas_mbconv.py for the deep-block
one): at 768px input, the first 6 blocks of B2 run at 384/192px where the
6x-expanded intermediate is enormous (block 2: 384x384x96 ~= 906 MB at
batch 32 bf16). XLA materializes it in HBM twice (expand write, depthwise
read) plus the depthwise output twice more — the whole early backbone is
HBM-bandwidth-bound, so fusing expand -> depthwise -> SE -> project into
one kernel that touches HBM only for the block input and output removes
the dominant traffic. The deep-block kernel can't be reused: it stages the
full expanded tensor in VMEM, which only fits for spatial <= ~96.

Structure (one pallas_call per block, grid (B, T) sequential on core):
- the whole input image block (1, H, W, Cin) sits in VMEM; its BlockSpec
  index map is constant in the tile index, so Mosaic keeps it resident
  instead of refetching (revisiting rule);
- each grid step t computes TH output rows: expand 1x1 (MXU matmul over
  the halo'd input rows) -> swish -> zero-padded into a SAME-halo VMEM
  buffer -> depthwise kxk taps (VPU, fp32 accumulation) -> swish ->
  written into a persistent VMEM scratch holding the FULL per-image
  depthwise output (the trick: at 192px x 144ch that's only ~19 MB — the
  depthwise OUTPUT always fits in VMEM; it's the expanded INPUT-resolution
  tensor that doesn't); per-channel sums accumulate for SE;
- the last tile finishes squeeze-excite (two tiny matmuls on the means)
  and projects the whole image from the VMEM scratch (MXU), adding the
  residual from the resident input block.

HBM traffic per block collapses to: read input once + write output once
(vs XLA's additional expanded-tensor write+read and depthwise write+read;
see BENCH_NOTES.md round 2 for measurements).

BatchNorms are folded into the conv weights (inference path only, like
ops/pallas_mbconv.py; reference semantics preserved since teachers and
eval always run frozen-BN, reference train_methods.py:891-893).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.efficientnet import BlockArgs
from ..models.layers import same_pad_amounts
from .pallas_mbconv import LANE, FoldedMBConv, _round_up, fold_mbconv

__all__ = ['fold_mbconv', 'mbconv_tiled', 'tiled_vmem_bytes']


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _kernel(args: BlockArgs, h: int, w: int, cep: int, th: int,
            has_skip: bool,
            x_ref, w_exp_ref, b_exp_ref, w_dw_ref, b_dw_ref,
            w_se1_ref, b_se1_ref, w_se2_ref, b_se2_ref,
            w_prj_ref, b_prj_ref, ident_ref, o_ref, dw_ref, sum_ref,
            eb_ref):
    k = args.kernel_size
    s = args.stride
    ho, wo = h // s, w // s
    cin = args.input_filters
    co = w_prj_ref.shape[-1]        # o_ref's minor dim is merged (wo*co)
    t = pl.program_id(1)
    n_tiles = ho // th

    @pl.when(t == 0)
    def _init():
        sum_ref[:] = jnp.zeros_like(sum_ref)

    # Input rows needed by this tile's depthwise windows, in SAME-padding
    # "virtual" coordinates: output row (t*th + i) reads virtual rows
    # t*th*s + i*s + dy - pt for dy in [0, k). We load the in-range window
    # [safe0, safe0+span_h) of x, expand it, and place it into the
    # zero-initialized halo buffer eb at the offset that realigns virtual
    # row r to eb row k + r - t*th*s; out-of-image rows stay zero (exact
    # SAME zero-padding — the pad is applied to the POST-activation
    # expanded tensor, matching flax's padding='SAME' on the depthwise).
    (pt, _) = same_pad_amounts(h, s, k)
    (plft, prgt) = same_pad_amounts(w, s, k)
    # the halo'd span can exceed the image when one tile covers it all
    span_h = min((th - 1) * s + k, h)
    row0 = t * th * s - pt                # first needed virtual row
    safe0 = jnp.clip(row0, 0, h - span_h)
    shift = row0 - safe0                  # -pt (top tile) .. +pb (bottom)

    # x_ref carries (1, H, Cin, W): H is UNTILED (the dynamic row offset
    # below is legal) and the tiled minor dims (Cin, W) avoid Mosaic
    # lane-padding a 16/24-channel minor dim to 128 (72 MB window at
    # 384px otherwise). The expand matmul contracts Cin directly from this
    # layout via dot_general — no in-kernel transpose/lane-split reshape.
    x_rows = x_ref[0, pl.ds(safe0, span_h)]          # (span_h, Cin, W)

    # ---- expand 1x1 + swish: (span_h, Cin, W) x (Cin, CeP) ----
    dn = (((1,), (0,)), ((), ()))
    e = jax.lax.dot_general(x_rows, w_exp_ref[:], dn,
                            preferred_element_type=jnp.float32)
    # (span_h, W, CeP)
    if args.expand_ratio != 1:
        e = _swish(e + b_exp_ref[:])
    e = e.astype(jnp.bfloat16)

    # ---- place into the zero halo buffer ----
    eb_ref[:] = jnp.zeros_like(eb_ref)
    eb_ref[pl.ds(k - shift, span_h), plft:plft + w] = e

    # ---- depthwise kxk + swish into the persistent VMEM dw scratch ----
    acc0 = jnp.broadcast_to(b_dw_ref[:], (th, wo, cep)).astype(jnp.float32)

    def row_taps(dy, acc):
        span = eb_ref[pl.ds(k + dy, s * th)]          # (s*th, WP, cep)
        wrow = w_dw_ref[pl.ds(dy, 1)]                 # (1, k, cep)

        def make_branch(dx):
            def branch(a):
                win = jax.lax.slice(span, (0, dx, 0),
                                    (s * th, dx + s * wo, cep))
                if s != 1:
                    win = win.reshape(th, s, wo, s, cep)[:, 0, :, 0, :]
                return a + win.astype(jnp.float32) * wrow[0, dx]
            return branch

        return jax.lax.fori_loop(
            0, k, lambda dx, a: jax.lax.switch(
                dx, [make_branch(i) for i in range(k)], a), acc)

    d = _swish(jax.lax.fori_loop(0, k, row_taps, acc0))   # (th, wo, cep)
    dw_ref[pl.ds(t * th, th)] = d.astype(jnp.bfloat16)
    sum_ref[:] = sum_ref[:] + jnp.sum(d.reshape(th * wo, cep), axis=0,
                                      keepdims=True)

    # ---- final tile: SE + project the whole image from VMEM ----
    @pl.when(t == n_tiles - 1)
    def _finish():
        m = sum_ref[:] / float(ho * wo)               # (1, cep)
        s1 = _swish(jnp.dot(m, w_se1_ref[:],
                            preferred_element_type=jnp.float32)
                    + b_se1_ref[:])
        s2 = jax.nn.sigmoid(jnp.dot(s1, w_se2_ref[:],
                                    preferred_element_type=jnp.float32)
                            + b_se2_ref[:])           # (1, cep)
        # Project in row chunks: a single (Ho*Wo, CeP) f32 gated temp would
        # be ~75 MB at 384px and overflow VMEM together with the scratches.
        n_pc = 1
        while (ho // n_pc) * wo * cep * 4 > 8 * 2 ** 20 and n_pc < ho // 8:
            n_pc *= 2
        rc = ho // n_pc
        s2b = s2.astype(jnp.bfloat16)
        for c in range(n_pc):
            dm = dw_ref[c * rc:(c + 1) * rc].reshape(rc * wo, cep)
            gated = dm * s2b
            out = jnp.dot(gated, w_prj_ref[:],
                          preferred_element_type=jnp.float32) + b_prj_ref[:]
            if has_skip:
                # x is (rc, Cin, W); route it through the identity matmul
                # to (rc, W, Cin) without a lane-layout transpose
                xs = jax.lax.dot_general(
                    x_ref[0, c * rc:(c + 1) * rc], ident_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = out + xs.reshape(rc * wo, cin)
            o_ref[0, c * rc:(c + 1) * rc] = out.astype(jnp.bfloat16) \
                .reshape(rc, wo, co)


def _default_tile(ho: int) -> int:
    for cand in (16, 24, 32, 48):
        if ho % cand == 0:
            return cand
    return ho


def tiled_vmem_bytes(args: BlockArgs, h: int, th: int = 0) -> int:
    """Rough VMEM footprint of mbconv_tiled at square input spatial h."""
    s = args.stride
    k = args.kernel_size
    ho = h // s
    th = th or _default_tile(ho)
    cep = _round_up(args.input_filters * args.expand_ratio, LANE)
    wp = w_padded(h, s, k)
    x = h * h * args.input_filters * 2
    dw = ho * ho * cep * 2
    eb = (s * th + 3 * k) * wp * cep * 2
    span_h = (th - 1) * s + k
    e_f32 = span_h * h * cep * 4
    acc = th * ho * cep * 4
    prj = ho * ho * max(args.output_filters, LANE) * 4
    return x + dw + eb + e_f32 + 2 * acc + prj


def w_padded(w: int, s: int, k: int) -> int:
    (plft, prgt) = same_pad_amounts(w, s, k)
    return plft + w + prgt + (s - 1) + 1


@functools.partial(jax.jit, static_argnames=('args', 'tile_rows',
                                             'interpret'))
def mbconv_tiled(x: jnp.ndarray, folded: FoldedMBConv, args: BlockArgs,
                 tile_rows: int = 0, interpret: bool = False) -> jnp.ndarray:
    """x (B, H, W, Cin) -> (B, H/s, W/s, Co) bf16, one fused kernel."""
    b, h, w, cin = x.shape
    s = args.stride
    k = args.kernel_size
    co = folded.w_prj.shape[-1]
    cep = folded.w_dw.shape[-1]
    ho, wo = h // s, w // s
    th = tile_rows or _default_tile(ho)
    assert ho % th == 0, (ho, th)
    has_skip = args.id_skip and s == 1 and cin == co

    kernel = functools.partial(_kernel, args, h, w, cep, th, has_skip)
    rep = lambda a: pl.BlockSpec(a.shape, lambda bi, ti: (0,) * a.ndim,
                                 memory_space=pltpu.VMEM)
    ident = jnp.eye(cin, dtype=jnp.bfloat16)
    if folded.w_exp is None:
        # expand_ratio == 1: route x through a padded identity so the
        # dot_general still converts (rows, Cin, W) -> (rows, W, CeP)
        w_exp = jnp.pad(ident, ((0, 0), (0, cep - cin)))
        b_exp = jnp.zeros((1, cep), jnp.float32)
    else:
        w_exp, b_exp = folded.w_exp, folded.b_exp

    out = pl.pallas_call(
        kernel,
        grid=(b, ho // th),
        in_specs=[
            # constant index in t -> Mosaic keeps the image resident.
            # (1, H, Cin, W): H untiled (dynamic row offsets legal); the
            # tiled minor dims (Cin, W) avoid lane-padding small Cin
            pl.BlockSpec((1, h, cin, w), lambda bi, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            rep(w_exp), rep(b_exp),
            rep(folded.w_dw), rep(folded.b_dw),
            rep(folded.w_se1), rep(folded.b_se1),
            rep(folded.w_se2), rep(folded.b_se2),
            rep(folded.w_prj), rep(folded.b_prj),
            rep(ident),
        ],
        out_specs=pl.BlockSpec((1, ho, wo, co),
                               lambda bi, ti: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, co), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((ho, wo, cep), jnp.bfloat16),          # dw output
            pltpu.VMEM((1, cep), jnp.float32),                # SE sums
            pltpu.VMEM((s * th + 3 * k, w_padded(w, s, k), cep),
                       jnp.bfloat16),                         # halo buffer
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(x.astype(jnp.bfloat16).transpose(0, 1, 3, 2),
      w_exp, b_exp, folded.w_dw, folded.b_dw,
      folded.w_se1, folded.b_se1, folded.w_se2, folded.b_se2,
      folded.w_prj, folded.b_prj, ident)
    return out
