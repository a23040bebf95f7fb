"""Dataset base: class vocabularies and label-mapping dictionaries.

Mirrors BaseDataset (reference src/datasets/BaseDataset.py:44-310): the
4-way `valid_classes_dict` (labels<->ids in dataset label space,
predictions<->ids in teacher/VOC prediction space), restricted to the
configured `valid_labels` (shipped config: 'car').
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

VOC_CLASSES = (
    'aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus', 'car', 'cat',
    'chair', 'cow', 'diningtable', 'dog', 'horse', 'motorbike', 'person',
    'pottedplant', 'sheep', 'sofa', 'train', 'tvmonitor')

# VOC prediction-id table (reference src/datasets/BaseDataset.py:142-165)
VOC_PREDICTION_IDS = {name: i for i, name in enumerate(VOC_CLASSES)}
COCO_PREDICTION_IDS = {'car': 2}


def build_valid_classes_dict(classes: Sequence[str], config,
                             prediction_ids: Optional[Dict[str, int]] = None
                             ) -> Dict[str, Dict]:
    """Reference src/datasets/BaseDataset.py:127-138."""
    if prediction_ids is None:
        prediction_ids = VOC_PREDICTION_IDS
    valid = None
    if config is not None and 'valid_labels' in config:
        valid = set(config['valid_labels'].split(','))
    d = {'labels_i2txt': {}, 'labels_txt2i': {},
         'predictions_txt2i': {}, 'predictions_i2txt': {}}
    for i, name in enumerate(classes):
        if valid is not None and name not in valid:
            continue
        d['labels_txt2i'][name] = i
        d['labels_i2txt'][i] = name
        d['predictions_txt2i'][name] = prediction_ids[name]
        d['predictions_i2txt'][prediction_ids[name]] = name
    return d


def prediction_to_label_lut(valid_classes_dict: Dict, num_classes: int
                            ) -> np.ndarray:
    """(num_classes,) int LUT: prediction-space id -> label-space id
    (the remap in logits_to_ground_truth, reference
    src/utils/utils.py:297-300); unmapped ids -> -1."""
    lut = -np.ones((num_classes,), dtype=np.int32)
    for pid, name in valid_classes_dict['predictions_i2txt'].items():
        lut[pid] = valid_classes_dict['labels_txt2i'][name]
    return lut


def valid_prediction_ids(valid_classes_dict: Dict) -> List[int]:
    return sorted(valid_classes_dict['predictions_txt2i'].values())


def filter_labels(labels: np.ndarray, valid_classes_dict: Dict) -> np.ndarray:
    """Keep rows whose label id is valid (reference BaseDataset.py:186-189)."""
    if labels.size == 0:
        return labels
    mask = np.isin(labels[:, 4],
                   list(valid_classes_dict['labels_txt2i'].values()))
    return labels[mask]


class BaseDataset:
    """Minimal common behavior: config extraction + class maps + id lists."""

    classes: Sequence[str] = VOC_CLASSES

    def __init__(self, config, mode: str):
        self.config = config
        self.mode = mode
        self.data_path = config.get('data_path', 'data')
        self.drive_type = ('_' + config['drive_type']
                           if config.get('drive_type') else '')
        self.daytime = ('_' + config['daytime']
                        if config.get('daytime') else '')
        self.image_size = config.getint('image_size')
        self.use_thermal = config.getboolean('use_thermal')
        self.use_depth = config.getboolean('use_depth')
        self.use_rgb = config.getboolean('use_rgb', fallback=True)
        self.normalize = config.getboolean('normalize')
        self.valid_classes_dict = build_valid_classes_dict(
            self.classes, config)

    def __len__(self):
        return self.num_images

    @property
    def num_classes(self) -> int:
        return len(self.classes)
