#!/usr/bin/env python
"""Serving latency sweep: ms/request for the weight-baked predictor at
small batch sizes (the serving regime), vs the throughput regime bench.py
measures at batch 128.

Usage:  python scripts/bench_serving.py            (TPU)
        MMDT_PLATFORM=cpu SERVE_SIZES=1,2 python scripts/bench_serving.py
        python scripts/bench_serving.py --quant    (int8 path A/B)
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

from mm_distillnet_tpu.models.efficientdet import EfficientDet  # noqa: E402
from mm_distillnet_tpu.serving import make_serving_fn  # noqa: E402
from mm_distillnet_tpu.utils.profiling import device_time  # noqa: E402

SIZE = int(os.environ.get('SERVE_IMAGE_SIZE', '768'))
ITERS = int(os.environ.get('SERVE_ITERS', '20'))
BATCHES = [int(b) for b in
           os.environ.get('SERVE_SIZES', '1,2,4,8,16').split(',')]
APPROX = os.environ.get('SERVE_APPROX', '1') not in ('0', '', 'false')
QUANT = ('--quant' in sys.argv
         or os.environ.get('SERVE_QUANT', '') not in ('0', '', 'false'))


def main():
    model = EfficientDet(num_classes=20, compound_coef=2,
                         dtype=jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, SIZE, SIZE, 8),
                           jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x0)

    quant_pack = None
    if QUANT:
        from mm_distillnet_tpu.quant import build_quant_pack
        quant_pack = build_quant_pack(
            model, variables, x0, [jax.device_get(x0)], train=False)

    rows = []
    for batch in BATCHES:
        predict = make_serving_fn(model, variables, SIZE,
                                  num_candidates=256, max_detections=32,
                                  approx=APPROX, quant_pack=quant_pack)
        x = jax.random.normal(jax.random.PRNGKey(2),
                              (batch, SIZE, SIZE, 8), jnp.float32)

        def run(x):
            d = predict(x)
            return d.scores.sum() + d.boxes.sum()

        t = device_time(run, (x,), iters=ITERS)
        row = {'batch': batch, 'ms_per_request': round(t * 1000, 2),
               'ms_per_image': round(t * 1000 / batch, 2),
               'fps': round(batch / t, 1), 'approx': APPROX,
               'quant': QUANT, 'image_size': SIZE}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print('\n| batch | ms/request | ms/image | fps |')
    print('|---|---|---|---|')
    for r in rows:
        print(f"| {r['batch']} | {r['ms_per_request']} | "
              f"{r['ms_per_image']} | {r['fps']} |")


if __name__ == '__main__':
    main()
