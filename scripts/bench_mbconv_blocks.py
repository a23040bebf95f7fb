#!/usr/bin/env python
"""Per-block A/B: XLA (flax) vs the whole-block Pallas MBConv kernel.

Times every MBConv block of the D2 backbone at its real 768px shapes on
the current device and prints a winner table — the data behind the
FusedBackbone default plan (models/fused_forward.py).

Usage: BENCH_BATCH=32 python scripts/bench_mbconv_blocks.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('MMDT_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['MMDT_PLATFORM'])
import jax  # noqa: E402
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('MMDT_COMPILE_CACHE',
                                 os.path.expanduser('~/.cache/mmdt_xla')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import jax.numpy as jnp  # noqa: E402

from mm_distillnet_tpu.models.efficientnet import (  # noqa: E402
    MBConvBlock, expand_block_args)
from mm_distillnet_tpu.models.fused_forward import \
    VMEM_BUDGET_BYTES  # noqa: E402
from mm_distillnet_tpu.ops.pallas_mbconv import (  # noqa: E402
    fold_mbconv, mbconv_fused, mbconv_vmem_bytes)
from mm_distillnet_tpu.utils.profiling import device_time  # noqa: E402

SIZE = int(os.environ.get('BENCH_SIZE', '768'))
BATCH = int(os.environ.get('BENCH_BATCH', '32'))
ITERS = int(os.environ.get('BENCH_ITERS', '20'))
COEF = int(os.environ.get('BENCH_COEF', '2'))


def main():
    rng = jax.random.PRNGKey(0)
    blocks = expand_block_args(COEF)
    spatial = SIZE // 2
    rows = []
    for i, args in enumerate(blocks):
        x = jax.random.normal(jax.random.fold_in(rng, i),
                              (BATCH, spatial, spatial, args.input_filters),
                              jnp.float32).astype(jnp.bfloat16)
        block = MBConvBlock(args, dtype=jnp.bfloat16)
        variables = jax.jit(block.init)(jax.random.PRNGKey(i), x)
        folded = fold_mbconv(variables['params'], variables['batch_stats'],
                             args)
        t_flax = device_time(
            lambda v, x: block.apply(v, x, train=False).astype(jnp.float32),
            (variables, x), iters=ITERS)
        t_pallas = None
        if mbconv_vmem_bytes(args, spatial) <= VMEM_BUDGET_BYTES:
            t_pallas = device_time(
                lambda f, x: mbconv_fused(x, f, args).astype(jnp.float32),
                (folded, x), iters=ITERS)
        ms = lambda t: None if t is None else round(t * 1000, 2)
        cand = {'flax': t_flax, 'pallas': t_pallas}
        winner = min((v, k) for k, v in cand.items() if v is not None)[1]
        rows.append({'block': i, 'spatial': spatial, 'k': args.kernel_size,
                     's': args.stride, 'cin': args.input_filters,
                     'cout': args.output_filters, 'e': args.expand_ratio,
                     'flax_ms': ms(t_flax), 'pallas_ms': ms(t_pallas),
                     'winner': winner})
        print(json.dumps(rows[-1]), flush=True)
        spatial //= args.stride
        del x, variables, folded

    print('\n| block | shape | XLA ms | pallas ms | winner |')
    print('|---|---|---|---|---|')
    for r in rows:
        print(f"| {r['block']} | {r['spatial']}px {r['cin']}->{r['cout']} "
              f"k{r['k']} s{r['s']} e{r['e']} | {r['flax_ms']} | "
              f"{r['pallas_ms']} | {r['winner']} |")
    best = {}
    for r in rows:
        best[r['block']] = r['winner']
    spec = ','.join(f"{k}:{i}" for i, k in best.items())
    print('\nplan_spec =', spec)


if __name__ == '__main__':
    main()
