#!/usr/bin/env python
"""Microbench: post-processing candidate packing — Pallas kernel vs XLA.

Measures the (B, 110484, 20) score-readout front half of
postprocess_detections (quantize + class-pack + threshold/validity) and the
full postprocess, with the fused Pallas kernel (ops/pallas_postprocess.py)
vs the plain XLA lowering, on the real chip.

    python scripts/bench_postprocess.py            # B=32 by default
    BENCH_BATCH=8 python scripts/bench_postprocess.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/mmdt_xla'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
import jax.numpy as jnp  # noqa: E402

from mm_distillnet_tpu.ops.anchors import anchor_table  # noqa: E402
from mm_distillnet_tpu.ops.pallas_postprocess import \
    packed_candidate_scores  # noqa: E402
from mm_distillnet_tpu.ops.postprocess import (  # noqa: E402
    class_validity_table, postprocess_detections)
from mm_distillnet_tpu.utils.profiling import device_time  # noqa: E402

SIZE = 768
B = int(os.environ.get('BENCH_BATCH', '32'))
N, C = 110484, 20
ITERS = int(os.environ.get('BENCH_ITERS', '50'))


def main():
    rng = jax.random.PRNGKey(0)
    cls = jax.nn.sigmoid(jax.random.normal(rng, (B, N, C)) * 3)
    reg = jax.random.normal(jax.random.fold_in(rng, 1), (B, N, 4)) * 0.1
    anchors = jnp.asarray(anchor_table(SIZE))
    cv = jnp.asarray(class_validity_table(C, [6]))

    def pack_pallas(cls):
        return packed_candidate_scores(cls, cv, 0.3)

    def pack_xla(cls):
        # the XLA chain the kernel replaces (postprocess.py fast path)
        q = (cls * float(1 << 24)).astype(jnp.int32)
        packed = (q << 5) | jnp.arange(C, dtype=jnp.int32)
        overall = jnp.max(packed, axis=-1)
        ok = (cls > 0.3) & (cv != 0)
        best = jnp.max(jnp.where(ok, packed, -1), axis=-1)
        return jnp.where(best == overall, best, -1)

    def full(cls, reg, pallas):
        d = postprocess_detections(cls, reg, anchors, cv, image_size=SIZE,
                                   num_candidates=256, max_detections=32,
                                   pallas=pallas)
        return d.boxes, d.scores

    out = {'batch': B}
    out['pack_pallas_ms'] = round(
        device_time(pack_pallas, (cls,), iters=ITERS) * 1000, 2)
    out['pack_xla_ms'] = round(
        device_time(pack_xla, (cls,), iters=ITERS) * 1000, 2)
    out['full_pallas_ms'] = round(
        device_time(lambda c, r: full(c, r, True), (cls, reg),
                    iters=ITERS) * 1000, 2)
    out['full_xla_ms'] = round(
        device_time(lambda c, r: full(c, r, False), (cls, reg),
                    iters=ITERS) * 1000, 2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
