#!/usr/bin/env python
"""Measure the PyTorch reference's eval throughput — the missing fps
baseline (BASELINE.md: "the PyTorch frames/sec baseline must be measured;
the reference publishes none").

This container has torch-CPU only (~0.015 fps at 768px, BENCH_NOTES.md
round 2), so the GPU number BENCH_r*.json compares against is carried as an
ESTIMATE (~40 fps V100, upper bound of public EfficientDet-D2@768
numbers). Run this script on a CUDA host with /root/reference checked out
to replace the estimate with a measurement under the same protocol as our
bench.py:

  * same model: EfficientDet-D2, 8-channel audio input, 768x768;
  * same work: forward + full post-processing (regressBoxes/clipBoxes/
    postprocess = the reference's eval inner loop, evaluate.py:120-170)
    on synthetic input (weights random — throughput only; load real .pth
    via --checkpoint for a trained-model measurement);
  * same measurement: warmup, then N timed iterations, one final
    synchronize as the barrier.

Usage:
    python scripts/baseline_torch_gpu.py [--reference /root/reference]
        [--batch 8] [--iters 30] [--size 768] [--checkpoint <pth>]

Prints one JSON line: {"fps": ..., "ms_per_batch": ..., "device": ...}.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--reference', default='/root/reference')
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--iters', type=int, default=30)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--size', type=int, default=768)
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--threshold', type=float, default=0.3)
    p.add_argument('--nms_threshold', type=float, default=0.5)
    args = p.parse_args()

    sys.path.insert(0, args.reference)
    import torch

    # the reference's own model + post-processing stack
    try:
        from src.YetAnotherEfficientDet import EfficientDetBackbone
        from src.utils.utils import postprocess
        from src.YetAnotherEfficientDet import BBoxTransform, ClipBoxes
    except ModuleNotFoundError as e:
        # this script targets a CUDA host with the reference's full deps
        # (requirements.txt: torchvision for its nms op); the TPU dev
        # container deliberately ships torch-CPU without torchvision
        print(json.dumps({'error': f'reference deps missing: {e.name}. '
                          'Run on a CUDA host with the reference '
                          'requirements installed (pip install '
                          'torchvision); this container has torch-CPU '
                          'only.'}))
        sys.exit(2)

    device = 'cuda' if torch.cuda.is_available() else 'cpu'
    if device == 'cpu':
        print('WARNING: no CUDA device; this measures torch-CPU '
              '(expect ~0.015 fps/core at 768px)', file=sys.stderr)

    model = EfficientDetBackbone(num_classes=20, compound_coef=2,
                                 in_channels=8)
    if args.checkpoint:
        sd = torch.load(args.checkpoint, map_location='cpu',
                        weights_only=False)
        sd = sd.get('model', sd)
        model.load_state_dict(
            {k.replace('module.', ''): v for k, v in sd.items()},
            strict=False)
    model = model.to(device).eval()
    if device == 'cuda':
        model = model.half()

    x = torch.randn(args.batch, 8, args.size, args.size, device=device)
    if device == 'cuda':
        x = x.half()
    regress_boxes, clip_boxes = BBoxTransform(), ClipBoxes()

    def step():
        with torch.no_grad():
            features, regression, classification, anchors = model(x)
            return postprocess(x, anchors, regression, classification,
                               regress_boxes, clip_boxes,
                               args.threshold, args.nms_threshold)

    for _ in range(args.warmup):
        step()
    if device == 'cuda':
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    if device == 'cuda':
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0

    ms = dt / args.iters * 1e3
    fps = args.batch * args.iters / dt
    print(json.dumps({'fps': round(fps, 2), 'ms_per_batch': round(ms, 2),
                      'batch': args.batch, 'size': args.size,
                      'device': device,
                      'dtype': 'fp16' if device == 'cuda' else 'fp32'}))


if __name__ == '__main__':
    main()
