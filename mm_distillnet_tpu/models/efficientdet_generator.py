"""Multi-modal EfficientDet "generator": one backbone+BiFPN per modality.

Capability match for YetAnotherEfficientDetGenerator (reference
src/YetAnotherEfficientDet_generator.py:595-771): per-modality backbone and
BiFPN stacks feeding shared regressor/classifier heads over features of
width `fpn_filters * num_modalities`, with three integration modes
(reference :687-751):
  concat  - concatenate per-modality BiFPN features channel-wise;
  switch  - pick ONE random modality per step and tile its features;
  zeroout - zero a random modality's features before concat.

NOTE: the reference class is broken as written (its forward references an
unassigned self.features_from -> NameError, reference
src/YetAnotherEfficientDet_generator.py:757; SURVEY.md section 2.1). This
is the working redesign: same architecture and integration semantics, minus
the crash.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .bifpn import BiFPN
from .efficientdet import (BACKBONE_COEF, BOX_CLASS_REPEATS,
                           FPN_CELL_REPEATS, FPN_NUM_FILTERS,
                           NUM_ANCHORS_PER_CELL, DetectorOutput)
from .efficientnet import EfficientNetFeatures
from .heads import Classifier, Regressor


class EfficientDetGenerator(nn.Module):
    modalities: Tuple[str, ...] = ('rgb', 'thermal', 'depth', 'audio')
    num_classes: int = 20
    compound_coef: int = 2
    integration_mode: str = 'concat'
    features_from: str = 'efficientnet'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool = False,
                 ) -> DetectorOutput:
        cc = self.compound_coef
        per_modality = {}
        for m in self.modalities:
            if m not in inputs:
                raise ValueError(f'missing modality input: {m}')
            x = inputs[m].astype(self.dtype)
            feats = EfficientNetFeatures(
                compound_coef=BACKBONE_COEF[cc], dtype=self.dtype,
                name=f'backbone_net_{m}')(x, train=train)
            pyramid = BiFPN(num_channels=FPN_NUM_FILTERS[cc],
                            num_repeats=FPN_CELL_REPEATS[cc],
                            attention=cc < 6, dtype=self.dtype,
                            name=f'bifpn_{m}')(
                (feats[1], feats[2], feats[3]), train=train)
            per_modality[m] = pyramid

        n_mod = len(self.modalities)
        mode = self.integration_mode
        if mode == 'concat':
            features = [jnp.concatenate([per_modality[m][lvl]
                                         for m in self.modalities], axis=-1)
                        for lvl in range(5)]
        elif mode in ('switch', 'zeroout'):
            choice = jax.random.randint(
                self.make_rng('integration') if train else
                jax.random.PRNGKey(0), (), 0, n_mod)
            features = []
            for lvl in range(5):
                stacked = jnp.stack([per_modality[m][lvl]
                                     for m in self.modalities])  # (M,B,H,W,C)
                if mode == 'switch':
                    # one modality's features tiled to the full width
                    sel = stacked[choice]
                    features.append(jnp.concatenate([sel] * n_mod, axis=-1))
                else:
                    mask = (jnp.arange(n_mod) != choice).astype(
                        stacked.dtype)[:, None, None, None, None]
                    dropped = stacked * mask
                    features.append(jnp.concatenate(
                        [dropped[i] for i in range(n_mod)], axis=-1))
        else:
            raise NotImplementedError(mode)

        regression, align_reg = Regressor(
            num_anchors=NUM_ANCHORS_PER_CELL,
            num_layers=BOX_CLASS_REPEATS[cc], dtype=self.dtype,
            name='regressor')(features, train=train)
        classification, align_cls = Classifier(
            num_anchors=NUM_ANCHORS_PER_CELL, num_classes=self.num_classes,
            num_layers=BOX_CLASS_REPEATS[cc], dtype=self.dtype,
            name='classifier')(features, train=train)

        align = jnp.concatenate([align_reg, align_cls], axis=-1)
        return DetectorOutput(
            classification=classification.astype(jnp.float32),
            regression=regression.astype(jnp.float32),
            features=tuple(features),
            align_features=align)
