"""Visual verification utilities (reference src/utils/utils.py:625-955,
2214-2414): prediction overlays on images and spectrograms, attention-map
dumps. These are debug tools, host-side cv2/matplotlib."""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import cv2
import numpy as np

# deterministic box color palette (replaces the reference's pickled palette,
# src/utils/pallete)
_PALETTE = [(np.array([37 * (i + 1) % 256, 17 * (i + 3) % 256,
                       29 * (i + 7) % 256])).tolist() for i in range(64)]


def draw_predictions(image: np.ndarray, rows: Sequence[Sequence[float]],
                     class_names: Optional[Sequence[str]] = None
                     ) -> np.ndarray:
    """rows: [x1, y1, x2, y2, (score,) label]. Returns a uint8 BGR image
    with boxes + labels drawn."""
    img = image.copy()
    if img.dtype != np.uint8:
        lo, hi = float(img.min()), float(img.max())
        img = ((img - lo) / (hi - lo + 1e-9) * 255).astype(np.uint8)
    if img.ndim == 2 or img.shape[-1] == 1:
        img = cv2.cvtColor(img.reshape(img.shape[0], img.shape[1]),
                           cv2.COLOR_GRAY2BGR)
    elif img.shape[-1] > 3:
        img = cv2.cvtColor(img[..., 0], cv2.COLOR_GRAY2BGR)
    for row in rows:
        label = int(row[-1])
        color = _PALETTE[label % len(_PALETTE)]
        x1, y1, x2, y2 = (int(v) for v in row[:4])
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        text = (class_names[label] if class_names and
                0 <= label < len(class_names) else str(label))
        if len(row) == 6:
            text += f' {row[4]:.2f}'
        cv2.putText(img, text, (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return img


def save_attention_map(feature: np.ndarray, path: str, p: float = 2.0):
    """Dump the MTA spatial attention map of an NHWC feature as a heatmap
    (reference plot_audio_predictions attention dumps, utils.py:2276-2282)."""
    att = np.mean(np.power(feature, p), axis=-1)
    att = (att - att.min()) / (att.max() - att.min() + 1e-9)
    att = (att * 255).astype(np.uint8)
    cv2.imwrite(path, cv2.applyColorMap(att, cv2.COLORMAP_JET))


def plot_audio_predictions(teacher_models: Dict[str, Tuple[Any, Any]],
                           student_model: Tuple[Any, Any], dataset, config,
                           frame_id: str, out_dir: Optional[str] = None):
    """Render student predictions + fused teacher pseudo-GT for one frame
    (--just_plot path of evaluate.py)."""
    import jax.numpy as jnp

    from ..data.base import prediction_to_label_lut, valid_prediction_ids
    from ..evaluation import make_predict_fn
    from ..ops.postprocess import class_validity_table

    out_dir = out_dir or config.get('exp_name', 'run')
    os.makedirs(out_dir, exist_ok=True)
    idx = dataset.ids.index(frame_id) if frame_id in dataset.ids else 0
    sample = dataset[idx]
    image_size = config.getint('image_size')
    num_classes = student_model[0].num_classes

    vcd = dataset.valid_classes_dict
    class_valid = jnp.asarray(class_validity_table(
        num_classes, valid_prediction_ids(vcd)))
    pred_to_label = jnp.asarray(prediction_to_label_lut(vcd, num_classes))

    predict = make_predict_fn(student_model[0], image_size, config)
    audio = jnp.asarray(sample['audio'][None])
    rows, _ = predict(student_model[1], audio, class_valid, pred_to_label)
    rows = [r.tolist() for r in np.asarray(rows)[0] if r[5] != -1]

    spec_img = sample['audio'][..., 0]
    out = draw_predictions(spec_img, rows, list(dataset.classes))
    safe_id = frame_id.replace('/', '_')
    cv2.imwrite(os.path.join(out_dir, f'{safe_id}.student.png'), out)

    rgb = sample.get('rgb')
    if rgb is not None:
        out = draw_predictions(rgb, rows, list(dataset.classes))
        cv2.imwrite(os.path.join(out_dir, f'{safe_id}.rgb.png'), out)
    return rows
