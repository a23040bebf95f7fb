"""Model registry: string name -> (module, variables), checkpoint-aware.

Mirrors the reference's load_model registry (reference
src/utils/utils.py:441-590): the same model-type strings resolve to
EfficientDet-D2 instances with modality-specific input channels (rgb 3 /
thermal 1 / depth 3 / audio 8) and modality-specific checkpoint paths under
trained_models/. Checkpoints may be (a) our native orbax format, (b) a
PyTorch .pth (converted on load via convert.torch_weights), or (c) absent
-> randomly initialized (the audio student trains from scratch,
utils.py:547-550).
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .efficientdet import EfficientDet
from .efficientdet_generator import EfficientDetGenerator
from .stereosoundnet import StereoSoundNet

logger = logging.getLogger(__name__)

MODALITY_CHANNELS = {'rgb': 3, 'thermal': 1, 'depth': 3, 'audio': 8,
                     'audio_static': 8, 'audio_student': 8}

MODALITY_CHECKPOINTS = {
    'rgb': 'yet-another-efficientdet-d2-rgb.pth',
    'thermal': 'yet-another-efficientdet-d2-thermal.pth',
    'depth': 'yet-another-efficientdet-d2-depth.pth',
    'audio_static': 'yet-another-efficientdet-d2-audio.pth',
    'audio_student': None,  # student trains from scratch
}

KNOWN_MODEL_TYPES = (
    'YetAnotherEfficientDet_D2',
    'YetAnotherEfficientDet_D2_embedding',
    'YetAnotherEfficientDet_D2_input8',
    'YetAnotherEfficientDet_D2_input1',
    'YetAnotherEfficientDetGenerator_D2',
    'YetAnotherEfficientDetGenerator_D2_STATIC',
    'YetAnotherEfficientDet_D2_audio',
    'StereoSoundNet',
)


def _compute_dtype(config) -> Any:
    name = (config.get('compute_dtype', 'bfloat16')
            if config is not None else 'bfloat16')
    return {'bfloat16': jnp.bfloat16, 'float32': jnp.float32,
            'float16': jnp.float16}[name]


def get_data_dim_from_config(config) -> Dict[str, int]:
    """Modality -> input channels from the config's use_* flags (reference
    get_data_dim_from_config, utils.py:414-438); sizes the generator's
    per-modality stacks."""
    out: Dict[str, int] = {}
    if config is not None:
        if config.getboolean('use_thermal', fallback=False):
            out['thermal'] = 1
        if config.getboolean('use_depth', fallback=False):
            out['depth'] = 3
        if config.getboolean('use_audio', fallback=False):
            out['audio'] = 8
        if config.getboolean('use_rgb', fallback=True):
            out['rgb'] = 3
    if not out:
        out['rgb'] = 3
    return out


def _is_generator_type(model_type: str) -> bool:
    """Which registry names build the multi-modal generator class.

    Mirrors the reference's model_dict classes (utils.py:441-558):
    'YetAnotherEfficientDetGenerator_D2' and 'YetAnotherEfficientDet_D2_audio'
    map to YetAnotherEfficientDetGenerator, while — counter-intuitively —
    'YetAnotherEfficientDetGenerator_D2_STATIC' maps to the PLAIN
    YetAnotherEfficientDet (utils.py:551-555: the static-audio checkpoint is
    a single-modality export)."""
    if model_type == 'YetAnotherEfficientDetGenerator_D2_STATIC':
        return False
    return ('Generator' in model_type
            or model_type == 'YetAnotherEfficientDet_D2_audio')


def _compound_coef(config) -> int:
    """The registry's model strings are all _D2 (reference utils.py:441-558
    hardcodes compound_coef=2); the TPU build adds an optional
    `compound_coef` config key so synthetic-data proofs (the convergence
    harness) can drive the public CLIs with small-coefficient models."""
    if config is None:
        return 2
    return config.getint('compound_coef', fallback=2)


def build_model(model_type: str, config, num_classes: int = 20):
    """Instantiate the module for a registry name (no weights)."""
    if 'StereoSoundNet' in model_type:
        return StereoSoundNet(num_classes=num_classes,
                              dtype=_compute_dtype(config))
    if 'YetAnotherEfficientDet' not in model_type:
        raise Exception(f"Unsupported model type {model_type} provided")
    if _is_generator_type(model_type):
        dims = get_data_dim_from_config(config)
        integration = (config.get('integration_mode', 'concat')
                       if config is not None else 'concat') or 'concat'
        return EfficientDetGenerator(
            modalities=tuple(sorted(dims)), num_classes=num_classes,
            compound_coef=_compound_coef(config),
            integration_mode=integration,
            dtype=_compute_dtype(config))
    features_from = (config.get('features_from', 'efficientnet')
                     if config is not None else 'efficientnet')
    return EfficientDet(num_classes=num_classes,
                        compound_coef=_compound_coef(config),
                        features_from=features_from,
                        dtype=_compute_dtype(config))


def init_variables(model, in_channels: int, image_size: int, seed: int = 0,
                   config=None):
    if isinstance(model, EfficientDetGenerator):
        dims = get_data_dim_from_config(config)
        dummy = {m: jnp.zeros((1, image_size, image_size, c))
                 for m, c in dims.items()}
    else:
        dummy = jnp.zeros((1, image_size, image_size, in_channels))
    # jit the init: on TPU an eager init dispatches every op individually
    # (minutes); a single compiled program initializes in seconds.
    return jax.jit(model.init)(jax.random.PRNGKey(seed), dummy)


def load_model(model_type: str, config, modality: Optional[str] = None,
               num_classes: int = 20, seed: int = 0
               ) -> Tuple[Any, Dict]:
    """Returns (module, variables). Modality decides input channels and the
    default checkpoint path, as in the reference (utils.py:540-558)."""
    if model_type not in KNOWN_MODEL_TYPES and \
            'YetAnotherEfficientDet' not in model_type:
        raise Exception(f"Unsupported model type {model_type} provided")
    model = build_model(model_type, config, num_classes)

    in_channels = 3
    ckpt_name = None
    if modality is not None:
        if modality not in MODALITY_CHANNELS:
            raise Exception(f"Unsupported modality={modality} on load model")
        in_channels = MODALITY_CHANNELS[modality]
        ckpt_name = MODALITY_CHECKPOINTS.get(modality)
    if model_type.endswith('_input8'):
        in_channels = 8
    elif model_type.endswith('_input1'):
        in_channels = 1

    image_size = config.getint('image_size') if config is not None else 768
    variables = init_variables(model, in_channels, image_size, seed,
                               config=config)

    saved_path = (config.get('saved_path', 'trained_models')
                  if config is not None else 'trained_models')
    saved_path = saved_path.strip('"')

    # ImageNet-pretrained backbone bootstrap (config `backbone_pretrained`
    # = path to a stock model-zoo EfficientNet .pth): applied BEFORE any
    # task checkpoint so a full task load overrides it — the reference's
    # `from_pretrained` + stem-swap path for training new teachers
    # (reference src/YetAnotherEfficientNet.py:596-604).
    zoo_path = (config.get('backbone_pretrained', fallback=None)
                if config is not None else None)
    if zoo_path and str(zoo_path).lower() not in ('none', 'false', ''):
        if not os.path.exists(zoo_path):
            raise FileNotFoundError(
                f'backbone_pretrained={zoo_path} does not exist')
        from ..convert.torch_weights import load_zoo_backbone
        variables, report = load_zoo_backbone(zoo_path, variables,
                                              strict=True)
        logger.info('backbone bootstrapped from %s (stem_swapped=%s)',
                    zoo_path, report['stem_swapped'])

    if ckpt_name is not None:
        path = os.path.join(saved_path, ckpt_name)
        # Teacher checkpoints must load completely: a silently partial
        # teacher poisons every pseudo-label downstream. The student's
        # '_embedding' incremental update is the one sanctioned partial
        # load (reference utils.py:585-589).
        variables = maybe_load_checkpoint(path, variables, strict=True)
        if 'embedding' in model_type:
            emb = os.path.join(saved_path,
                               'yet-another-efficientdet-d2-embedding.pth')
            variables = maybe_load_checkpoint(emb, variables, strict=False)
    return model, variables


def maybe_load_checkpoint(path: str, variables, strict: bool = False):
    """Load weights from .pth (torch) or orbax dir if present; otherwise
    return the passed-in (random) variables.

    strict=True raises if any flax parameter has no matching torch key —
    required for teacher loads (a drifted key map would leave teachers
    partially random and silently corrupt distillation)."""
    if path and os.path.exists(path):
        # Dispatch on what the path IS, not its suffix: a directory is an
        # orbax checkpoint even when named like the reference's .pth files
        # (the convergence harness saves trained flax teachers under the
        # registry's canonical names so the public CLIs pick them up).
        if os.path.isdir(path):
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            variables = ckptr.restore(os.path.abspath(path), variables)
        elif path.endswith(('.pth', '.pth.tar', '.pt')):
            from ..convert.torch_weights import load_torch_checkpoint
            variables, report = load_torch_checkpoint(path, variables,
                                                      strict=strict)
            if report['missing']:
                logger.warning('checkpoint %s: %d flax paths unmatched',
                               path, len(report['missing']))
        else:
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            variables = ckptr.restore(os.path.abspath(path), variables)
    else:
        logger.info('checkpoint %s absent; using random init', path)
    return variables
