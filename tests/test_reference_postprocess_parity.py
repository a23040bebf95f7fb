"""Post-processing parity against the actual reference pipeline.

Runs the reference's EfficientDet_post_processing (imported from
/root/reference with stub modules for its unused heavy deps) and our
on-device fixed-shape postprocess on IDENTICAL logits, and asserts the same
boxes/scores/classes come out in the same order. This closes the parity
chain: test_reference_parity covers the network forward; this covers
decode + clip + confidence filter + class masking + batched NMS.
"""
import configparser
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = '/root/reference'

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference checkout unavailable')


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope='module')
def reference_postprocess():
    import torch
    from tests.test_reference_parity import _install_torchvision_shim
    _install_torchvision_shim()
    # stub the reference's unused heavy deps (never exercised by the
    # post-processing code path)
    _stub('librosa')
    _stub('librosa.display')
    sys.modules['librosa'].display = sys.modules['librosa.display']
    _stub('google_drive_downloader', GoogleDriveDownloader=object)
    hp = _stub('hpbandster')
    _stub('hpbandster.core')
    _stub('hpbandster.core.result')
    _stub('hpbandster.visualization')
    hp.core = sys.modules['hpbandster.core']
    hp.core.result = sys.modules['hpbandster.core.result']
    hp.visualization = sys.modules['hpbandster.visualization']
    _stub('albumentations', Blur=lambda *a, **k: None)
    sys.path.insert(0, REFERENCE)
    import importlib
    utils = importlib.import_module('src.utils.utils')
    det = importlib.import_module('src.YetAnotherEfficientDet')
    return utils, det


def test_postprocess_matches_reference(reference_postprocess):
    import jax.numpy as jnp
    import torch

    from mm_distillnet_tpu.ops.anchors import anchor_table
    from mm_distillnet_tpu.ops.postprocess import (class_validity_table,
                                                   postprocess_detections)
    utils, det = reference_postprocess

    size = 128
    anchors = anchor_table(size)
    n, c = anchors.shape[0], 20
    rng = np.random.default_rng(3)
    # realistic-ish logits: mostly low scores, a few confident detections
    cls = rng.uniform(0.0, 0.25, (2, n, c)).astype(np.float32)
    hot = rng.integers(0, n, 40)
    cls[0, hot[:20], 6] = rng.uniform(0.35, 0.99, 20)
    cls[1, hot[20:], 6] = rng.uniform(0.35, 0.99, 20)
    reg = rng.normal(scale=0.05, size=(2, n, 4)).astype(np.float32)

    parser = configparser.ConfigParser()
    parser['DEFAULT'] = {'conf_threshold': '0.3', 'nms_threshold': '0.5',
                         'image_size': str(size), 'student':
                         'YetAnotherEfficientDet_D2'}
    config = parser['DEFAULT']
    vcd = {'predictions_txt2i': {'car': 6}, 'predictions_i2txt': {6: 'car'}}

    ref_out = utils.EfficientDet_post_processing(
        logits=[torch.from_numpy(cls), torch.from_numpy(reg),
                torch.from_numpy(anchors[None])],
        valid_classes_dict=vcd,
        anchors=None, config=config, text_classes=False,
        regressBoxes=det.YetAnotherEfficientDetBBoxTransform())

    dets = postprocess_detections(
        jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(class_validity_table(c, [6])), image_size=size,
        conf_threshold=0.3, nms_threshold=0.5, num_candidates=128,
        max_detections=64, fast=True)

    for i in range(2):
        ref_rows = np.asarray(ref_out[i], np.float64)
        ours_valid = np.asarray(dets.valid[i])
        ours_boxes = np.asarray(dets.boxes[i])[ours_valid]
        ours_scores = np.asarray(dets.scores[i])[ours_valid]
        ours_classes = np.asarray(dets.classes[i])[ours_valid]
        assert len(ref_rows) == len(ours_boxes), (len(ref_rows),
                                                  len(ours_boxes))
        if len(ref_rows) == 0:
            continue
        np.testing.assert_allclose(ours_boxes, ref_rows[:, :4],
                                    rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(ours_scores, ref_rows[:, 4], atol=1e-6)
        np.testing.assert_array_equal(ours_classes,
                                      ref_rows[:, 5].astype(int))
