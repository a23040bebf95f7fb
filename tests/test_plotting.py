"""Debug-plot parity: --just_plot writes attention maps, modality overlays,
fused-teacher pseudo-GT, and per-mic spectrograms (reference
plot_audio_predictions, utils.py:2214-2414)."""
import glob
import os

import jax
import jax.numpy as jnp

from mm_distillnet_tpu.config import default_config
from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
from mm_distillnet_tpu.models.efficientdet import EfficientDet
from mm_distillnet_tpu.utils.plotting import plot_audio_predictions

from .helpers import fast_init

SIZE = 128


def test_plot_audio_predictions_artifacts(tmp_path):
    config = default_config(image_size=SIZE, synthetic_size=2,
                            max_detections=16, nms_candidates=64,
                            compute_dtype='float32',
                            exp_name=str(tmp_path / 'plots'))
    dataset = SyntheticMultimodal(config, 'val')

    def mk(seed, ch):
        m = EfficientDet(num_classes=20, compound_coef=-1, dtype=jnp.float32)
        return m, fast_init(m, seed, jnp.zeros((1, SIZE, SIZE, ch)))

    teachers = {'rgb': mk(1, 3)}
    student = mk(9, 8)
    frame_id = dataset.ids[0]
    rows = plot_audio_predictions(teachers, student, dataset, config,
                                  frame_id)
    assert isinstance(rows, list)

    out_dir = str(tmp_path / 'plots')
    safe_id = frame_id.replace('/', '_')
    # per-level attention dumps: one per BiFPN level (P3..P7)
    acts = glob.glob(os.path.join(out_dir, f'{safe_id}.activation_*.png'))
    assert len(acts) == 5
    for name in ('student', 'rgb', 'thermal', 'depth'):
        assert os.path.exists(os.path.join(out_dir, f'{safe_id}.{name}.png'))
    # one spectrogram per microphone
    specs = glob.glob(os.path.join(out_dir, f'{safe_id}.specshow_*.png'))
    assert len(specs) == 8
    # fused teacher overlay appears whenever the teachers produced any
    # pseudo-GT rows (random teachers may or may not clear the confidence
    # threshold, so only check when present)
    fused = glob.glob(os.path.join(out_dir,
                                   f'{safe_id}.rgb.fused_teachers.png'))
    assert len(fused) in (0, 1)
