"""Multi-modal EfficientDet "generator": one backbone+BiFPN per modality.

Capability match for YetAnotherEfficientDetGenerator (reference
src/YetAnotherEfficientDet_generator.py:595-771): per-modality backbone and
BiFPN stacks feeding shared regressor/classifier heads, with three
integration modes (reference :687-751, width sizing :652-668):

  concat   heads sized ``fpn_filters * n_modalities``; concatenate all
           per-modality BiFPN features channel-wise.
  switch   heads sized ``fpn_filters`` (num_models_active=1, reference
           :655-659): training picks ONE random modality per step; eval
           uses the alphabetically-first modality (the reference breaks
           out of its eval loop after the first, :747-748).
  zeroout  heads sized ``fpn_filters * n_modalities``: training zeroes a
           random modality's INPUT and still runs its backbone (reference
           :713-732 forwards torch.zeros_like through the backbone, which
           is not the same as zeroing the features — BN biases make the
           zero-input response nonzero); eval concatenates all.

Modalities are processed in sorted order, mirroring the reference's
``ordered_models.sort()`` (:646-648).

NOTE: the reference class is broken as written (its forward references an
unassigned ``self.features_from`` -> AttributeError, reference :757;
SURVEY.md section 2.1). This is the working redesign: same architecture
and integration semantics, minus the crash.
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
    """``modalities`` is the generator's input config (reference
    ``input_data_config`` from get_data_dim_from_config, utils.py:414-438);
    inputs arrive as a dict {modality: NHWC array}."""
    modalities: Tuple[str, ...] = ('audio', 'depth', 'rgb', 'thermal')
    num_classes: int = 20
    compound_coef: int = 2
    integration_mode: str = 'concat'
    features_from: str = 'efficientnet'
    dtype: Any = jnp.bfloat16

    @property
    def ordered_modalities(self) -> Tuple[str, ...]:
        return tuple(sorted(self.modalities))

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool = False,
                 ) -> DetectorOutput:
        cc = self.compound_coef
        mods = self.ordered_modalities
        n_mod = len(mods)
        mode = self.integration_mode

        choice = None
        if mode in ('switch', 'zeroout') and n_mod > 1:
            choice = jax.random.randint(
                self.make_rng('integration') if train else
                jax.random.PRNGKey(0), (), 0, n_mod)

        per_modality = {}
        for i, m in enumerate(mods):
            if m not in inputs:
                raise ValueError(f'missing modality input: {m}')
            x = inputs[m].astype(self.dtype)
            if mode == 'zeroout' and train and choice is not None:
                # the reference forwards torch.zeros_like(input) through the
                # dropped modality's backbone (:713-732)
                x = x * (i != choice).astype(x.dtype)
            feats = EfficientNetFeatures(
                compound_coef=BACKBONE_COEF[cc], dtype=self.dtype,
                name=f'backbone_net_{m}')(x, train=train)
            pyramid = BiFPN(num_channels=FPN_NUM_FILTERS[cc],
                            num_repeats=FPN_CELL_REPEATS[cc],
                            attention=cc < 6, dtype=self.dtype,
                            name=f'bifpn_{m}')(
                (feats[1], feats[2], feats[3]), train=train)
            per_modality[m] = pyramid

        if n_mod == 1:
            # single modality: plain pass-through (reference :690-694)
            features = list(per_modality[mods[0]])
        elif mode == 'concat' or (mode == 'zeroout'):
            features = [jnp.concatenate([per_modality[m][lvl] for m in mods],
                                        axis=-1)
                        for lvl in range(5)]
        elif mode == 'switch':
            if train:
                # one modality's features, head width stays fpn_filters
                # (num_models_active=1, reference :655-659)
                features = []
                for lvl in range(5):
                    stacked = jnp.stack([per_modality[m][lvl] for m in mods])
                    features.append(stacked[choice])
            else:
                # eval: the first (alphabetical) modality is representative
                # (reference :747-748 breaks after the first)
                features = list(per_modality[mods[0]])
        else:
            raise NotImplementedError(mode)

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
            logits=cls_logits.astype(jnp.float32))
