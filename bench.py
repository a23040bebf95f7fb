#!/usr/bin/env python
"""Benchmark: audio-student end-to-end eval throughput on the TPU chip.

Measures the reference's headline path (evaluate.py student prediction loop,
SURVEY.md section 6): 8-channel 768x768 log-mel frames -> EfficientDet-D2
forward -> on-device decode + NMS -> boxes, in frames/sec on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline is measured against the PyTorch reference's equivalent loop
measured on this host's CPU-torch install? No — the reference baseline is
4-GPU hardware we don't have; BASELINE.md records that the reference
publishes no throughput number. We report the measured PyTorch-CPU
equivalent when available via BENCH_BASELINE env, else vs_baseline=0.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import os as _os
    # Persistent XLA compilation cache: first compile of the D2 graphs takes
    # minutes; cached reruns load in seconds.
    import jax as _jax_cc
    _jax_cc.config.update('jax_compilation_cache_dir',
                          _os.environ.get('MMDT_COMPILE_CACHE',
                                          _os.path.expanduser('~/.cache/mmdt_xla')))
    _jax_cc.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

    import jax
    import jax.numpy as jnp

    # Fail fast instead of hanging when the TPU relay is unreachable:
    # backend init (the first jax.devices()) blocks in the axon client's
    # claim-retry loop indefinitely if the relay/lease is down, which
    # would otherwise hang the whole bench. Probe it on a side thread and
    # bail with an honest JSON line if it doesn't come up in time.
    import threading
    _ready = threading.Event()
    _dev = []
    _probe_err = []
    def _probe():
        try:
            _dev.append(jax.devices()[0].platform)
        except Exception as e:  # init FAILED fast (vs hanging): report it
            _probe_err.append(f'{type(e).__name__}: {e}')
        finally:
            _ready.set()
    threading.Thread(target=_probe, daemon=True).start()
    _init_timeout = float(os.environ.get('BENCH_INIT_TIMEOUT', '1800'))
    if not _ready.wait(_init_timeout) or _probe_err:
        _why = (f'device backend init FAILED: {_probe_err[0]}'
                if _probe_err else
                f'device backend init timed out after '
                f'{_init_timeout:.0f}s (TPU relay unreachable)')
        print(json.dumps({
            'metric': 'audio-student eval throughput (D2 768x768 fwd+NMS)',
            'value': 0, 'unit': 'frames/sec/chip', 'vs_baseline': 0,
            'error': f'{_why}; no measurement taken',
            'last_recorded_measurement_fps': 720.3,
            'last_recorded_note': 'NOT measured by this run — the most '
                                  'recent recorded v5e measurement '
                                  '(BENCH_NOTES.md round-3 table, batch '
                                  '128, approx_max_k)'}))
        os._exit(3)

    from mm_distillnet_tpu.models.efficientdet import EfficientDet
    from mm_distillnet_tpu.ops.anchors import anchor_table
    from mm_distillnet_tpu.ops.postprocess import (class_validity_table,
                                                   postprocess_detections)

    size = int(os.environ.get('BENCH_IMAGE_SIZE', '768'))
    # throughput scales with batch now that post-processing no longer does
    # (BENCH_NOTES.md round 2: 16->310, 32->390, 64->565, 128->646 fps);
    # default to the measured-best batch
    batch = int(os.environ.get('BENCH_BATCH', '128'))
    iters = int(os.environ.get('BENCH_ITERS', '15'))

    s2d = os.environ.get('BENCH_S2D', '') not in ('0', '', 'false')
    model = EfficientDet(num_classes=20, compound_coef=2,
                         dtype=jnp.bfloat16, s2d_stem=s2d)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (batch, size, size, 8), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    anchors = jnp.asarray(anchor_table(size))
    class_valid = jnp.asarray(class_validity_table(20, [6]))

    # BENCH_FUSED=1 benches the fused-backbone path (Pallas MBConv kernels
    # per the FusedBackbone plan; BENCH_PLAN overrides it, e.g.
    # 'pallas:6-22' — see scripts/bench_mbconv_blocks.py).
    # approx_max_k candidate selection (the TPU PartialReduce top-k,
    # recall_target 0.99) — the measured +10.5% round-3 win; BENCH_APPROX=0
    # forces the exact top_k for A/B. Recorded in the JSON line.
    approx = os.environ.get('BENCH_APPROX', '1') not in ('0', '', 'false')
    # BENCH_QUANT=1 runs the int8 PTQ forward (quant.quantized_apply):
    # packed convs as s8xs8->s32 with baked scales — the bytes-lever the
    # round-3 roofline identified (HBM-bound at bf16). A/B'd against the
    # fp path under the same protocol; recorded in the JSON line.
    quant = os.environ.get('BENCH_QUANT', '') not in ('0', '', 'false')
    if quant:
        from mm_distillnet_tpu.quant import build_quant_pack, quantized_apply
        pack = build_quant_pack(model, variables, x[:8],
                                [np.asarray(x[:8])], train=False)

        @jax.jit
        def predict(variables, x):
            out = quantized_apply(model, variables, pack, x, train=False)
            dets = postprocess_detections(
                out.classification, out.regression, anchors, class_valid,
                image_size=size, num_candidates=256, max_detections=32,
                approx=approx)
            return dets.boxes, dets.scores, dets.classes, dets.valid
    elif os.environ.get('BENCH_FUSED', '') not in ('0', '', 'false'):
        from mm_distillnet_tpu.models.fused_forward import \
            make_fused_predictor
        fwd = make_fused_predictor(model, variables, size,
                                   plan_spec=os.environ.get('BENCH_PLAN', ''))

        @jax.jit
        def predict(variables, x):
            out = fwd(x)
            dets = postprocess_detections(
                out.classification, out.regression, anchors, class_valid,
                image_size=size, num_candidates=256, max_detections=32,
                approx=approx)
            return dets.boxes, dets.scores, dets.classes, dets.valid
    else:
        @jax.jit
        def predict(variables, x):
            out = model.apply(variables, x, train=False)
            dets = postprocess_detections(
                out.classification, out.regression, anchors, class_valid,
                image_size=size, num_candidates=256, max_detections=32,
                approx=approx)
            return dets.boxes, dets.scores, dets.classes, dets.valid

    # Warm-up / compile, then timed loop. Sync discipline: the axon relay
    # costs ~27ms per host round-trip and block_until_ready does not
    # reliably block, so we dispatch all iterations (the device executes
    # them serially on one stream) and take ONE host read of the final
    # result as the barrier — steady-state pipelined throughput, the same
    # regime as a real eval loop with async host reads.
    np.asarray(predict(variables, x)[1])
    t0 = time.perf_counter()
    res = None
    for _ in range(iters):
        res = predict(variables, x)
    np.asarray(res[1])
    dt = time.perf_counter() - t0
    fps = batch * iters / dt

    # MFU accounting: XLA's own cost model for the compiled program gives
    # FLOPs/batch; achieved TFLOP/s = flops * fps / batch. The efficiency
    # denominator is the measured 53 TFLOP/s bf16 matmul point on this chip
    # (BENCH_NOTES.md "Where the time goes") — depthwise convs and
    # elementwise chains can't reach it, so this is a utilization bound,
    # not a target; it keeps every throughput claim carrying an "of what
    # ceiling" answer.
    flops_per_frame = achieved_tflops = pct_matmul_point = None
    try:
        ca = jax.jit(predict).lower(variables, x).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get('flops', 0.0))
        if flops > 0:
            flops_per_frame = flops / batch
            achieved_tflops = flops_per_frame * fps / 1e12
            pct_matmul_point = 100.0 * achieved_tflops / 53.0
    except Exception:
        pass

    # Second leg: when the main leg used approx_max_k, also time the EXACT
    # top_k path in the same process/protocol so the recorded line always
    # carries both numbers (VERDICT round 3: mAP-parity claims must quote
    # the exact path; the approximate headline alone is not enough).
    fps_exact = None
    if approx and not quant and \
            os.environ.get('BENCH_FUSED', '') in ('0', '', 'false'):
        @jax.jit
        def predict_exact(variables, x):
            out = model.apply(variables, x, train=False)
            dets = postprocess_detections(
                out.classification, out.regression, anchors, class_valid,
                image_size=size, num_candidates=256, max_detections=32,
                approx=False)
            return dets.boxes, dets.scores, dets.classes, dets.valid

        np.asarray(predict_exact(variables, x)[1])
        t0 = time.perf_counter()
        res = None
        for _ in range(iters):
            res = predict_exact(variables, x)
        np.asarray(res[1])
        fps_exact = batch * iters / (time.perf_counter() - t0)

    # Baseline: the reference publishes no throughput number (BASELINE.md)
    # and this container has no CUDA, so a measured same-hardware GPU
    # comparison is impossible. We deliberately use a GENEROUS estimate for
    # the reference: ~40 fps, the upper end of public V100 numbers for
    # EfficientDet-D2 @768 with framework post-processing — the reference's
    # actual eval loop would be slower still (it round-trips detections
    # through the CPU for NMS per batch). The same-host torch-CPU
    # measurement (0.015 fps, BENCH_NOTES.md) is recorded there for
    # completeness but NOT used as the ratio denominator: a 4-5 orders of
    # magnitude CPU ratio says nothing useful. Override with BENCH_BASELINE.
    baseline = float(os.environ.get('BENCH_BASELINE', '40') or 0)
    vs = fps / baseline if baseline > 0 else 0.0
    record = {
        'metric': 'audio-student eval throughput (D2 768x768 fwd+NMS)',
        'value': round(fps, 2),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(vs, 2),
        'baseline': baseline,
        'baseline_note': 'estimated reference throughput on a V100 (upper '
                         'bound of public EfficientDet-D2@768 numbers); the '
                         'reference publishes none (see BENCH_NOTES.md)',
        'approx_topk': approx,
        'int8_quant': quant,
    }
    if fps_exact is not None:
        record['value_exact_topk'] = round(fps_exact, 2)
    if achieved_tflops is not None:
        record['gflops_per_frame'] = round(flops_per_frame / 1e9, 2)
        record['achieved_tflops'] = round(achieved_tflops, 2)
        record['pct_of_53tflops_matmul_point'] = round(pct_matmul_point, 1)
    print(json.dumps(record))


if __name__ == '__main__':
    main()
