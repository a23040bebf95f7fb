#!/usr/bin/env python
"""Per-component device-time breakdown of the eval forward.

Times, on the real chip (or MMDT_PLATFORM=cpu):
  stem            3x3/s2 conv + BN + swish on the raw input
  block i         every MBConv block standalone at its real shapes
  backbone        the whole EfficientNetFeatures apply
  full fwd        EfficientDet forward (backbone + BiFPN + heads)
  postprocess     decode + NMS readout on the forward's outputs

Standalone block times include their HBM activation reads/writes (the
whole-graph XLA schedule may fuse neighbours), so treat them as targeting
hints, not exact attributions. Prints a JSON line per component plus a
stage-grouped markdown table for BENCH_NOTES.md.

Usage: PROF_SIZE=768 PROF_BATCH=32 python scripts/profile_backbone.py
"""
from __future__ import annotations

import collections
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

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mm_distillnet_tpu.models.efficientnet import (  # noqa: E402
    EFFICIENTNET_PARAMS, BN_EPS, BN_MOMENTUM, EfficientNetFeatures,
    MBConvBlock, expand_block_args, round_filters, swish)
from mm_distillnet_tpu.models.efficientdet import EfficientDet  # noqa: E402
from mm_distillnet_tpu.ops.anchors import anchor_table  # noqa: E402
from mm_distillnet_tpu.ops.postprocess import (  # noqa: E402
    class_validity_table, postprocess_detections)
from mm_distillnet_tpu.utils.profiling import device_time  # noqa: E402

SIZE = int(os.environ.get('PROF_SIZE', '768'))
BATCH = int(os.environ.get('PROF_BATCH', '32'))
ITERS = int(os.environ.get('PROF_ITERS', '30'))
COEF = int(os.environ.get('PROF_COEF', '2'))
CH = int(os.environ.get('PROF_CH', '8'))
DTYPE = jnp.bfloat16


class _Stem(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.filters, (3, 3), strides=(2, 2), padding='SAME',
                    use_bias=False, dtype=DTYPE, param_dtype=jnp.float32,
                    name='_conv_stem')(x)
        x = nn.BatchNorm(use_running_average=True, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=DTYPE,
                         param_dtype=jnp.float32, name='_bn0')(x)
        return swish(x)


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, SIZE, SIZE, CH), jnp.float32)
    width, _, _, _ = EFFICIENTNET_PARAMS[COEF]
    blocks = expand_block_args(COEF)
    results = {}

    # stem
    stem = _Stem(round_filters(32, width))
    sv = jax.jit(stem.init)(rng, x)
    results['stem'] = device_time(lambda v, x: stem.apply(v, x), (sv, x),
                                  iters=ITERS)

    # every block standalone at its real input shape
    res = SIZE // 2
    per_block = []
    for i, a in enumerate(blocks):
        blk = MBConvBlock(a, dtype=DTYPE)
        bx = jax.random.normal(jax.random.fold_in(rng, i),
                               (BATCH, res, res, a.input_filters))
        bv = jax.jit(blk.init)(rng, bx)
        t = device_time(lambda v, x: blk.apply(v, x), (bv, bx), iters=ITERS)
        per_block.append((i, a, res, t))
        if a.stride == 2:
            res //= 2
        del bv, bx

    # whole backbone / full model / postprocess
    bb = EfficientNetFeatures(compound_coef=COEF, dtype=DTYPE)
    bbv = jax.jit(bb.init)(rng, x)
    results['backbone'] = device_time(
        lambda v, x: bb.apply(v, x)[-1], (bbv, x), iters=ITERS)
    del bbv

    model = EfficientDet(num_classes=20, compound_coef=COEF, dtype=DTYPE)
    mv = jax.jit(model.init)(rng, x)
    anchors = jnp.asarray(anchor_table(SIZE))
    class_valid = jnp.asarray(class_validity_table(20, [6]))

    results['full_fwd'] = device_time(
        lambda v, x: model.apply(v, x, train=False).classification,
        (mv, x), iters=ITERS)

    out = model.apply(mv, x, train=False)

    def post(cls_out, reg_out):
        d = postprocess_detections(cls_out, reg_out, anchors, class_valid,
                                   image_size=SIZE, num_candidates=256,
                                   max_detections=32)
        return d.scores

    results['postprocess'] = device_time(
        post, (out.classification, out.regression), iters=ITERS)

    ms = {k: round(v * 1000, 2) for k, v in results.items()}
    print(json.dumps({'size': SIZE, 'batch': BATCH, 'coef': COEF, 'ms': ms}))

    # stage-grouped block table
    stage_ms = collections.defaultdict(float)
    stage_meta = {}
    stage = -1
    for i, a, res, t in per_block:
        if a.stride == 2 or i == 0:
            stage += 1
        stage_ms[stage] += t * 1000
        stage_meta[stage] = (res if stage not in stage_meta
                             else stage_meta[stage][0],
                             a.kernel_size, a.output_filters)
    print('\n| component | ms | note |')
    print('|---|---|---|')
    print(f"| stem | {ms['stem']} | {SIZE}x{SIZE}x{CH} -> /2 |")
    for s in sorted(stage_ms):
        res0, k, cout = stage_meta[s]
        print(f'| stage {s} | {stage_ms[s]:.2f} | {res0}px in, k{k}, '
              f'-> {cout}ch |')
    blocks_total = sum(t for _, _, _, t in per_block) * 1000
    print(f'| sum(blocks standalone) | {blocks_total:.2f} | vs backbone '
          f"{ms['backbone']} |")
    print(f"| BiFPN+heads (full-backbone) | "
          f"{ms['full_fwd'] - ms['backbone']:.2f} | |")
    print(f"| postprocess | {ms['postprocess']} | |")
    for i, a, res, t in per_block:
        print(f'  block {i:2d}: {t * 1000:7.2f} ms  {res:3d}px '
              f'{a.input_filters:3d}->{a.output_filters:3d}ch k{a.kernel_size}'
              f' s{a.stride} x{a.expand_ratio}')


if __name__ == '__main__':
    main()
