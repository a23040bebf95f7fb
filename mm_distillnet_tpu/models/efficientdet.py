"""EfficientDet-D0..D7 assembly (NHWC, flax).

Capability match for YetAnotherEfficientDet (reference
src/YetAnotherEfficientDet.py:605-694): EfficientNet backbone -> BiFPN stack
-> shared regressor/classifier heads. Differences by design (TPU-first):

- NHWC everywhere; activations run in a configurable compute dtype (bf16).
- The anchor table is NOT produced by the forward pass; it is a precomputed
  constant (ops.anchors.anchor_table), eliminating the reference's
  per-forward numpy rebuild + device cache and the DataParallel
  anchor-concat artifact (reference src/utils/utils.py:164-168).
- forward returns a NamedTuple instead of nested lists.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .bifpn import BiFPN
from .efficientnet import EfficientNetFeatures
from .heads import Classifier, Regressor

# Per-coefficient scaling tables (reference src/YetAnotherEfficientDet.py:611-629).
# Dicts keyed by compound_coef; key -1 is the TEST-TINY profile (same
# topology — 5-level pyramid, BiFPN, shared heads — at ~50x smaller graph)
# for plumbing tests and doc examples. It is NOT a reference configuration.
def _coef_table(tiny, *d0_to_d7):
    table = dict(enumerate(d0_to_d7))
    table[-1] = tiny
    return table


BACKBONE_COEF = _coef_table(-1, 0, 1, 2, 3, 4, 5, 6, 6)
FPN_NUM_FILTERS = _coef_table(16, 64, 88, 112, 160, 224, 288, 384, 384)
FPN_CELL_REPEATS = _coef_table(1, 3, 4, 5, 6, 7, 7, 8, 8)
INPUT_SIZES = _coef_table(128, 512, 640, 768, 896, 1024, 1280, 1280, 1536)
BOX_CLASS_REPEATS = _coef_table(1, 3, 3, 3, 4, 4, 4, 5, 5)
ANCHOR_SCALE = _coef_table(4., 4., 4., 4., 4., 4., 4., 4., 5.)
NUM_ANCHORS_PER_CELL = 9  # 3 scales x 3 ratios


class DetectorOutput(NamedTuple):
    classification: jnp.ndarray          # (B, N, num_classes) sigmoid scores
    regression: jnp.ndarray              # (B, N, 4) deltas (dy, dx, dh, dw)
    features: Tuple[jnp.ndarray, ...]    # 5 BiFPN maps (features_from='efficientnet')
    align_features: jnp.ndarray          # concat of head pre-header features
                                         # (features_from='header')
    logits: Any = None                   # (B, N, num_classes) pre-sigmoid
                                         # scores; the focal loss consumes
                                         # these (losses/focal.py)


class EfficientDet(nn.Module):
    """One parameterization serves all four networks: RGB/depth teachers
    (3-channel input), thermal teacher (1-channel), audio student
    (8-channel) — input channels are inferred from the input array."""
    num_classes: int = 20
    compound_coef: int = 2
    features_from: str = 'efficientnet'
    dtype: Any = jnp.bfloat16
    s2d_stem: bool = False  # space-to-depth stem rewrite (same params)

    @nn.compact
    def __call__(self, x, train: bool = False) -> DetectorOutput:
        if self.features_from not in ('efficientnet', 'header'):
            raise NotImplementedError(self.features_from)
        cc = self.compound_coef
        x = x.astype(self.dtype) if self.dtype is not None else x

        # Backbone returns [P2, P3, P4, P5]; BiFPN consumes P3..P5
        # (reference src/YetAnotherEfficientDet.py:664-667).
        feats = EfficientNetFeatures(
            compound_coef=BACKBONE_COEF[cc], dtype=self.dtype,
            s2d_stem=self.s2d_stem, name='backbone_net')(x, train=train)
        p3, p4, p5 = feats[1], feats[2], feats[3]

        features = BiFPN(num_channels=FPN_NUM_FILTERS[cc],
                         num_repeats=FPN_CELL_REPEATS[cc],
                         attention=cc < 6, dtype=self.dtype,
                         name='bifpn')((p3, p4, p5), train=train)

        regression, align_reg = Regressor(
            num_anchors=NUM_ANCHORS_PER_CELL,
            num_layers=BOX_CLASS_REPEATS[cc], dtype=self.dtype,
            name='regressor')(features, train=train)
        classification, cls_logits, align_cls = Classifier(
            num_anchors=NUM_ANCHORS_PER_CELL, num_classes=self.num_classes,
            num_layers=BOX_CLASS_REPEATS[cc], dtype=self.dtype,
            name='classifier')(features, train=train)

        align = jnp.concatenate([align_reg, align_cls], axis=-1)
        return DetectorOutput(
            classification=classification.astype(jnp.float32),
            regression=regression.astype(jnp.float32),
            features=tuple(features),
            align_features=align,
            logits=cls_logits.astype(jnp.float32),
        )

    def distill_features(self, out: DetectorOutput):
        """The feature set handed to the KD loss, per features_from
        (reference src/YetAnotherEfficientDet.py:680-685)."""
        if self.features_from == 'efficientnet':
            return list(out.features)
        return [out.align_features]
