"""Config system: INI files + ``--overwrite`` JSON merge.

Reproduces the reference's public config API (reference train.py:267-276,
evaluate.py:84-93): a ``configparser`` INI file whose ``[DEFAULT]`` section is
threaded through the whole program, with typed accessors
(``.getboolean/.getint/.getfloat``) and a JSON ``--overwrite`` CLI merge, so
that existing ``configs/*.cfg`` files run unchanged.
"""
from __future__ import annotations

import configparser
import json
import os
from typing import Any, Mapping, Optional


def load_config(config_file: str, overwrite: Optional[str] = None,
                extra: Optional[Mapping[str, Any]] = None):
    """Parse an INI config file and apply a JSON overwrite string.

    Returns the ``[DEFAULT]`` SectionProxy, matching the object the reference
    passes around (reference train.py:267-276).
    """
    if not os.path.exists(config_file):
        raise FileNotFoundError(f"config file not found: {config_file}")
    parser = configparser.ConfigParser()
    parser.read(config_file)
    if overwrite:
        for key, value in json.loads(overwrite).items():
            parser['DEFAULT'][str(key)] = str(value)
    if extra:
        for key, value in extra.items():
            parser['DEFAULT'][str(key)] = str(value)
    return parser['DEFAULT']


def config_from_dict(values: Mapping[str, Any]):
    """Build a config SectionProxy from a plain dict (tests, synthetic runs)."""
    parser = configparser.ConfigParser()
    parser['DEFAULT'] = {str(k): str(v) for k, v in values.items()}
    return parser['DEFAULT']


# Defaults mirroring configs/mm-distillnet.cfg in the reference; used by
# tests and as a base for synthetic-data runs.
DEFAULTS = {
    'exp_name': 'MM-DistillNet',
    'log_path': 'tensorboard',
    'saved_path': 'trained_models',
    'fast_run': 'False',
    'dataset': 'MultimodalDetection',
    'data_path': 'data',
    'id_filter': 'None',
    'drive_type': 'all',
    'valid_labels': 'car',
    'use_labels': 'False',
    'use_thermal': 'True',
    'use_depth': 'True',
    'use_rgb': 'True',
    'use_audio': 'False',
    'student_modality': 'audio',
    'image_size': '768',
    'thermal_size': '768',
    'depth_size': '768',
    'audio_size': '768',
    'normalize': 'True',
    'train_transformations': 'Normalizer,Resizer',
    'val_transformations': 'Normalizer,Resizer',
    'seed': '24',
    'batch_size': '2',
    'ngpu': '1',
    'num_workers': '6',
    'engine': 'DataParallel',
    'teacher': 'YetAnotherEfficientDet_D2',
    'student': 'YetAnotherEfficientDet_D2_embedding',
    'features_from': 'efficientnet',
    'main_loss': 'YetAnotherFocalLoss',
    'div_loss': 'None',
    'kd_loss': 'MTALoss',
    'adv_loss': 'None',
    'T': '9',
    'p': '2',
    'data_augment_shift': 'False',
    'w_main': '1.0',
    'w_div': '1.0',
    'w_kd': '0.005',
    'w_adv': '1.0',
    'resume': 'True',
    'train_method': 'traditional_nms_augmented',
    'integration_mode': 'concat',
    'es_patience': '5',
    'num_epoches': '50',
    'val_interval': '5',
    'enable_bohb': 'False',
    'bohb_iterations': '4',
    'enable_prev_bohb_run': 'False',
    'pretrain': 'False',
    'weights_init': 'False',
    'grad_clip': '-1',
    'optimizer': 'Adam',
    'lr': '1e-4',
    'momentum': '0.9',
    'weight_decay': '5e-4',
    'b1': '0.9',
    'b2': '0.999',
    'scheduler': 'ReduceLROnPlateau',
    'step_size': '10',
    'gamma': '0.1',
    'iou_thres': '0.5',
    'conf_threshold': '0.3',
    'nms_threshold': '0.5',
    # TPU-build additions (do not exist in the reference; all optional).
    'max_detections': '100',       # fixed-shape detections per image
    'nms_candidates': '512',       # pre-NMS top-k candidates
    'max_gt': '64',                # padded pseudo-label capacity per image
    'compute_dtype': 'bfloat16',   # activations dtype inside the model
    'transfer_dtype': '',          # host->device input copy dtype; empty =
                                   # follow compute_dtype (bf16 halves the
                                   # infeed bytes; set float32 for the
                                   # reference's byte-exact input path)
    'device_audio_resize': 'True',  # compact audio ingest: host stretches
                                   # only the spectrogram's time axis, the
                                   # compiled step stretches the 80-mel
                                   # axis on-device (9.6x fewer audio
                                   # infeed bytes, cv2-exact result).
                                   # Default ON since round 5: measured
                                   # 1.58x steady-state CLI epoch at
                                   # D2@768 (BENCH_NOTES round 5); set
                                   # False for the reference-parity
                                   # full-size audio input path.
    'mta_parity_mode': 'True',     # reproduce kl_div(softmax, softmax) quirk
    'mesh_shape': '-1',            # -1: all local devices on the data axis
    'compound_coef': '2',          # EfficientDet coefficient for registry
                                   # builds (D2 in the reference; small
                                   # coefs drive synthetic-data proofs)
}


def default_config(**overrides: Any):
    values = dict(DEFAULTS)
    values.update({str(k): str(v) for k, v in overrides.items()})
    return config_from_dict(values)


def transfer_dtype_from(config):
    """Host->device input transfer dtype (a numpy dtype, or None for no
    cast). Defaults to the compute dtype: when the models run bf16,
    shipping f32 inputs doubles the infeed bytes only to have the first
    conv cast them down — at 768px batch 8 that is 283 MB/step of which
    half is pure waste (measured: the public train.py CLI on the axon
    relay host is transfer-bound, BENCH_NOTES round 4). Override with the
    `transfer_dtype` config key (`float32` restores the reference's
    byte-exact input path)."""
    name = (config.get('transfer_dtype', fallback='') or
            config.get('compute_dtype', fallback='float32') or 'float32')
    if name == 'bfloat16':
        import ml_dtypes
        import numpy as np
        return np.dtype(ml_dtypes.bfloat16)
    return None  # float32 inputs: no cast


def student_input_key(config) -> str:
    """The batch modality fed to the student network.

    The reference's config key is ``student_modality`` (dispatched at
    reference src/utils/utils.py:1771-1776); ``student_input`` is this
    build's extension (used by the convergence harness to train RGB-input
    students) and takes precedence when set.
    """
    return (config.get('student_input', fallback=None)
            or config.get('student_modality', fallback='audio')
            or 'audio')
