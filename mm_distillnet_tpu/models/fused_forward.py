"""Fused inference forward: Pallas MBConv blocks + flax BiFPN/heads.

Inference-only fast path for the detector: deep backbone blocks (input
spatial <= 96 at 768px, i.e. blocks 6..22 of B2) run as single fused Pallas
kernels per image with BN folded into the conv weights
(ops.pallas_mbconv); the memory-heavy early blocks and the BiFPN/heads
remain on XLA, applied as standalone flax modules from the same variable
tree. Numerics match the standard path to bf16 tolerance (tests).

Used by bench.py and evaluate.py when config `fused_inference=True`.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bifpn import BiFPN
from ..models.efficientdet import (BACKBONE_COEF, BOX_CLASS_REPEATS,
                                   FPN_CELL_REPEATS, FPN_NUM_FILTERS,
                                   NUM_ANCHORS_PER_CELL, DetectorOutput,
                                   EfficientDet)
from ..models.efficientnet import MBConvBlock, expand_block_args
from ..models.heads import Classifier, Regressor
from ..models.layers import BN_EPS, swish
from ..ops.pallas_mbconv import (fold_mbconv, mbconv_fused,
                                 mbconv_vmem_bytes)

VMEM_BUDGET_BYTES = 13 * 1024 * 1024  # leave headroom under the 16MB limit


def _parse_plan(spec: str, n_blocks: int):
    """'pallas:6-10,flax:11-22' -> {block_index: kind}."""
    if not spec:
        return {}
    out = {}
    for part in spec.split(','):
        kind, _, rng = part.strip().partition(':')
        if kind not in ('pallas', 'flax'):
            raise ValueError(f'unknown fused-plan kind {kind!r}')
        lo, _, hi = rng.partition('-')
        lo = int(lo)
        hi = int(hi) if hi else lo
        for i in range(lo, min(hi, n_blocks - 1) + 1):
            out[i] = kind
    return out


class FusedBackbone:
    """Holds folded weights + dispatch plan for one trained backbone."""

    def __init__(self, variables: Dict, compound_coef: int,
                 image_size: int, dtype=jnp.bfloat16,
                 plan_spec: str = ''):
        self.compound_coef = compound_coef
        self.dtype = dtype
        params = variables['params']['backbone_net']
        stats = variables['batch_stats']['backbone_net']
        self.blocks = expand_block_args(compound_coef)

        # stem: conv + folded BN
        kernel = np.asarray(params['_conv_stem']['kernel'])
        bn = {**{k: np.asarray(v) for k, v in params['_bn0'].items()},
              **{k: np.asarray(v) for k, v in stats['_bn0'].items()}}
        scale = bn['scale'] / np.sqrt(bn['var'] + BN_EPS)
        self.stem_kernel = jnp.asarray(kernel * scale, dtype)
        self.stem_bias = jnp.asarray(bn['bias'] - bn['mean'] * scale,
                                     jnp.float32)

        # Plan which kernel runs each block:
        #   flax   — XLA, the DEFAULT for every block (the measured winner
        #            on all 23 blocks: BENCH_NOTES.md round-2 per-block
        #            A/B; the row-tiled early-block kernel was retired
        #            after losing 3-10x everywhere);
        #   pallas — whole-block-in-VMEM kernel (ops/pallas_mbconv),
        #            opt-in ONLY via plan_spec (e.g. 'pallas:6-22' for
        #            benchmarking); blocks whose working set exceeds the
        #            VMEM budget fall back to flax.
        spatial = image_size // 2
        override = dict(_parse_plan(plan_spec, len(self.blocks)))
        self.plan: List[Tuple[str, Any]] = []
        for i, args in enumerate(self.blocks):
            bp = params[f'_blocks_{i}']
            bs = stats[f'_blocks_{i}']
            kind = override.get(i, 'flax')
            if (kind == 'pallas'
                    and mbconv_vmem_bytes(args, spatial) > VMEM_BUDGET_BYTES):
                kind = 'flax'
            if kind == 'flax':
                self.plan.append(('flax', (args, {'params': bp,
                                                  'batch_stats': bs})))
            else:
                self.plan.append((kind, (args, fold_mbconv(bp, bs, args))))
            spatial //= args.stride

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = x.astype(self.dtype)
        x = jax.lax.conv_general_dilated(
            x, self.stem_kernel, (2, 2), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = swish(x + self.stem_bias.astype(self.dtype))

        feature_maps = []
        last_x = None
        n = len(self.plan)
        for i, (kind, payload) in enumerate(self.plan):
            args = payload[0]
            if args.stride == 2:
                feature_maps.append(last_x)
            if kind == 'pallas':
                x = mbconv_fused(x, payload[1], args)
            else:
                x = MBConvBlock(args, dtype=self.dtype).apply(
                    payload[1], x, train=False)
            if i == n - 1:
                feature_maps.append(x)
            last_x = x
        return feature_maps[1:]


def make_fused_predictor(model: EfficientDet, variables: Dict,
                         image_size: int, plan_spec: str = ''):
    """Returns fn(x) -> DetectorOutput using the fused backbone. The
    closure captures folded weights as constants of the jitted function."""
    cc = model.compound_coef
    backbone = FusedBackbone(variables, BACKBONE_COEF[cc], image_size,
                             dtype=model.dtype, plan_spec=plan_spec)
    bifpn = BiFPN(num_channels=FPN_NUM_FILTERS[cc],
                  num_repeats=FPN_CELL_REPEATS[cc], attention=cc < 6,
                  dtype=model.dtype)
    regressor = Regressor(num_anchors=NUM_ANCHORS_PER_CELL,
                          num_layers=BOX_CLASS_REPEATS[cc],
                          dtype=model.dtype)
    classifier = Classifier(num_anchors=NUM_ANCHORS_PER_CELL,
                            num_classes=model.num_classes,
                            num_layers=BOX_CLASS_REPEATS[cc],
                            dtype=model.dtype)
    p = variables['params']
    s = variables['batch_stats']
    bifpn_vars = {'params': p['bifpn'], 'batch_stats': s['bifpn']}
    reg_vars = {'params': p['regressor'], 'batch_stats': s['regressor']}
    cls_vars = {'params': p['classifier'], 'batch_stats': s['classifier']}

    def forward(x: jnp.ndarray) -> DetectorOutput:
        feats = backbone(x)
        features = bifpn.apply(bifpn_vars, (feats[1], feats[2], feats[3]),
                               train=False)
        regression, align_reg = regressor.apply(reg_vars, features,
                                                train=False)
        classification, cls_logits, align_cls = classifier.apply(
            cls_vars, features, train=False)
        align = jnp.concatenate([align_reg, align_cls], axis=-1)
        return DetectorOutput(
            classification=classification.astype(jnp.float32),
            regression=regression.astype(jnp.float32),
            features=tuple(features), align_features=align,
            logits=cls_logits.astype(jnp.float32))

    return forward
