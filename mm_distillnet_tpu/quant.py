"""Post-training int8 quantization for TPU serving (TPU-build addition).

The reference has no quantization story; this module exists because the
round-3 roofline (BENCH_NOTES.md) proved the D2 eval forward is
HBM-bandwidth-bound at bf16 (~70% of speed-of-light, pointwise convs near
the ridge point). The only remaining lever the implementation controls is
BYTES: int8 activations/weights halve the boundary traffic bf16 moves, and
the v5e MXU's s8xs8->s32 path has ~2x the bf16 matmul throughput. Both
gains attack exactly the bound the roofline identified.

Design — interceptor-based, zero model-code changes:

- ``flax.linen.intercept_methods`` wraps every ``nn.Conv.__call__`` in the
  existing models (backbone, BiFPN, heads, generator — they all build on
  nn.Conv), so the SAME module tree runs fp or int8 by context, and every
  non-conv op (BN, swish, SE gating, pooling, fast-attention) keeps its
  exact fp semantics.
- Static symmetric quantization: per-TENSOR activation scales calibrated
  offline (absmax over calibration batches), per-OUTPUT-CHANNEL weight
  scales. Scales are baked into the jitted serving function — no dynamic
  range pass at serve time.
- int8 x int8 -> int32 convolution via ``lax.conv_general_dilated`` with
  ``preferred_element_type=int32``; the fp32 rescale (sx*sw) + bias is the
  conv epilogue XLA fuses.
- Per-conv policy: SE squeeze/excite convs (tiny (B,1,1,C) tensors gating
  a sigmoid) and the final head projections (``header_pointwise`` — the
  logits) stay fp by default; everything else quantizes. Depthwise convs
  are policy-switchable (``quantize_depthwise``) so the TPU A/B can
  isolate their effect.

Calibration and quantized execution are both trace-compatible: calibration
returns the per-conv absmax dict as a jit output, and the quantized
forward is an ordinary jittable function of (x,) with weights/scales
closed over (the serving convention, serving.py).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ['QuantPolicy', 'QuantPack', 'collect_conv_specs',
           'calibrate_activations', 'quantize_weights', 'build_quant_pack',
           'quantized_apply']


class QuantPolicy(NamedTuple):
    """Which convs quantize. Paths are '/'-joined flax module paths."""
    quantize_depthwise: bool = True
    skip_substrings: Tuple[str, ...] = ('_se_reduce', '_se_expand',
                                        'header_pointwise')

    def wants(self, path: str, feature_group_count: int) -> bool:
        if any(s in path for s in self.skip_substrings):
            return False
        if feature_group_count > 1 and not self.quantize_depthwise:
            return False
        return True


class QuantPack(NamedTuple):
    """Everything the quantized forward needs beyond the fp variables.

    qkernels:  path -> int8 (kh, kw, in_per_group, out)
    wscales:   path -> fp32 (out,)   weight dequant scale (absmax/127)
    ascales:   path -> fp32 scalar   input activation scale (absmax/127)
    """
    qkernels: Dict[str, jnp.ndarray]
    wscales: Dict[str, jnp.ndarray]
    ascales: Dict[str, jnp.ndarray]


def _path_str(module: nn.Module) -> str:
    return '/'.join(str(p) for p in module.path)


def _norm2(v) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    t = tuple(v)
    return (t[0], t[1]) if len(t) == 2 else (t[0], t[0])


def _get_by_path(tree, path: str):
    node = tree
    for part in path.split('/'):
        node = node[part]
    return node


def collect_conv_specs(model: nn.Module, variables, example_input,
                       policy: QuantPolicy = QuantPolicy(),
                       **apply_kwargs) -> Dict[str, Dict[str, Any]]:
    """One abstract-eval pass recording every nn.Conv the policy selects:
    path -> {strides, feature_group_count, use_bias, padding}."""
    specs: Dict[str, Dict[str, Any]] = {}

    def interc(next_fun, args, kwargs, context):
        mod = context.module
        if isinstance(mod, nn.Conv) and context.method_name == '__call__':
            path = _path_str(mod)
            if policy.wants(path, mod.feature_group_count):
                specs[path] = dict(
                    strides=_norm2(mod.strides or 1),
                    feature_group_count=mod.feature_group_count,
                    use_bias=mod.use_bias,
                    padding=mod.padding)
        return next_fun(*args, **kwargs)

    def run(x):
        with nn.intercept_methods(interc):
            return model.apply(variables, x, **apply_kwargs)

    jax.eval_shape(run, example_input)
    return specs


def calibrate_activations(model: nn.Module, variables,
                          batches: Iterable[np.ndarray],
                          policy: QuantPolicy = QuantPolicy(),
                          **apply_kwargs) -> Dict[str, float]:
    """Per-conv-input absmax over calibration batches (path -> float).

    The per-batch pass is jitted: the interceptor records one absmax tracer
    per selected conv, returned as an auxiliary dict output.
    """
    def batch_stats(x):
        stats: Dict[str, jnp.ndarray] = {}

        def interc(next_fun, args, kwargs, context):
            mod = context.module
            if (isinstance(mod, nn.Conv)
                    and context.method_name == '__call__'):
                path = _path_str(mod)
                if policy.wants(path, mod.feature_group_count):
                    stats[path] = jnp.max(
                        jnp.abs(args[0].astype(jnp.float32)))
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interc):
            model.apply(variables, x, **apply_kwargs)
        return stats

    jitted = jax.jit(batch_stats)
    absmax: Dict[str, float] = {}
    for batch in batches:
        stats = jax.device_get(jitted(jnp.asarray(batch)))
        for path, v in stats.items():
            absmax[path] = max(absmax.get(path, 0.0), float(v))
    return absmax


def quantize_weights(variables, specs: Dict[str, Dict[str, Any]]
                     ) -> Tuple[Dict[str, jnp.ndarray],
                                Dict[str, jnp.ndarray]]:
    """Symmetric per-output-channel int8 weights (host-side, once)."""
    params = variables['params']
    qkernels: Dict[str, jnp.ndarray] = {}
    wscales: Dict[str, jnp.ndarray] = {}
    for path in specs:
        kernel = np.asarray(_get_by_path(params, path)['kernel'],
                            dtype=np.float32)
        absmax = np.max(np.abs(kernel), axis=(0, 1, 2))
        scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.rint(kernel / scale), -127, 127).astype(np.int8)
        qkernels[path] = jnp.asarray(q)
        wscales[path] = jnp.asarray(scale)
    return qkernels, wscales


def build_quant_pack(model: nn.Module, variables, example_input,
                     calibration_batches: Iterable[np.ndarray],
                     policy: QuantPolicy = QuantPolicy(),
                     **apply_kwargs) -> QuantPack:
    """Calibrate + quantize: the one-call offline step."""
    specs = collect_conv_specs(model, variables, example_input, policy,
                               **apply_kwargs)
    absmax = calibrate_activations(model, variables, calibration_batches,
                                   policy, **apply_kwargs)
    qkernels, wscales = quantize_weights(variables, specs)
    ascales = {p: jnp.float32(max(absmax.get(p, 0.0), 1e-12) / 127.0)
               for p in specs}
    return QuantPack(qkernels, wscales, ascales)


def quantized_apply(model: nn.Module, variables, pack: QuantPack, x,
                    policy: QuantPolicy = QuantPolicy(),
                    compute_dtype: Any = jnp.bfloat16, **apply_kwargs):
    """model.apply with every packed conv run as int8 x int8 -> int32.

    Jittable; close over (variables, pack) and jit for serving. Convs not
    in the pack (policy-skipped, or newly added modules) fall through to
    the fp path untouched.
    """
    params = variables['params']

    def interc(next_fun, args, kwargs, context):
        mod = context.module
        if (not isinstance(mod, nn.Conv)
                or context.method_name != '__call__'):
            return next_fun(*args, **kwargs)
        path = _path_str(mod)
        if path not in pack.qkernels:
            return next_fun(*args, **kwargs)

        inp = args[0]
        sx = pack.ascales[path]
        qx = jnp.clip(jnp.round(inp.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            qx, pack.qkernels[path],
            window_strides=_norm2(mod.strides or 1),
            padding=mod.padding,
            feature_group_count=mod.feature_group_count,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (sx * pack.wscales[path])
        if mod.use_bias:
            y = y + _get_by_path(params, path)['bias'].astype(jnp.float32)
        return y.astype(compute_dtype)

    with nn.intercept_methods(interc):
        return model.apply(variables, x, **apply_kwargs)
