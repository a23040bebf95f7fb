#!/usr/bin/env python
"""A/B candidate-selection strategies inside the REAL eval graph.

VERDICT round-4 item 5: the headline eval number still quotes the
approx_max_k path (722.6 fps) over exact top_k (651.9 fps) — a ~10% gap
that is pure candidate-selection cost over the packed (B, N) int32 scores
(N = 110484 at 768px). This times the full predictor (forward + decode +
NMS) under selection variants:

  int_topk    exact jax.lax.top_k over the packed int32 (round 2-4 default)
  f32_topk    exact top_k over the order-preserving bias+bitcast float
              (bit-identical selections; round-5 default if it wins)
  approx      jax.lax.approx_max_k recall_target=0.99 (the opt-in path)

Run on TPU:  python scripts/ab_topk.py
Options:     AB_BATCH=128 AB_ITERS=20 AB_SIZE=768
Prints one JSON line per variant plus a markdown table for BENCH_NOTES.
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
import numpy as np  # noqa: E402

from mm_distillnet_tpu.models.efficientdet import EfficientDet  # noqa: E402
from mm_distillnet_tpu.ops.anchors import anchor_table  # noqa: E402
from mm_distillnet_tpu.ops import postprocess as PP  # noqa: E402
from mm_distillnet_tpu.utils.profiling import device_time  # noqa: E402

BATCH = int(os.environ.get('AB_BATCH', '128'))
ITERS = int(os.environ.get('AB_ITERS', '20'))
SIZE = int(os.environ.get('AB_SIZE', '768'))


def build():
    model = EfficientDet(num_classes=20, compound_coef=2,
                         dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, SIZE, SIZE, 8))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x[:1])
    anchors = jnp.asarray(anchor_table(SIZE))
    class_valid = jnp.asarray(PP.class_validity_table(20, [6]))
    return model, variables, x, anchors, class_valid


def time_variant(name: str, approx: bool, int_topk: bool, built):
    model, variables, x, anchors, class_valid = built

    def fwd(variables, x):
        out = model.apply(variables, x, train=False)
        dets = PP.postprocess_detections(
            out.classification, out.regression, anchors, class_valid,
            image_size=SIZE, num_candidates=256, max_detections=32,
            approx=approx, int_topk=int_topk)
        return dets.boxes, dets.scores, dets.classes, dets.valid

    t = device_time(jax.jit(fwd), (variables, x), iters=ITERS)
    row = {'variant': name, 'ms_per_batch': round(t * 1000, 2),
           'fps': round(BATCH / t, 1), 'batch': BATCH, 'size': SIZE}
    print(json.dumps(row), flush=True)
    return row


def main():
    built = build()
    rows = [
        time_variant('f32_topk_exact', approx=False, int_topk=False, built=built),
        time_variant('int_topk_exact', approx=False, int_topk=True, built=built),
        time_variant('approx_max_k_0.99', approx=True, int_topk=False, built=built),
    ]
    print('\n| variant | ms/batch | fps |')
    print('|---|---|---|')
    for r in rows:
        print(f"| {r['variant']} | {r['ms_per_batch']} | {r['fps']} |")


if __name__ == '__main__':
    main()
