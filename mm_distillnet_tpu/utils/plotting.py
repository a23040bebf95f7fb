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
    """Render the full debug-plot set for one frame (--just_plot path of
    evaluate.py), matching the reference's plot_audio_predictions
    (utils.py:2214-2414):

    - per-level attention-map dumps of the student's BiFPN features
      (`<id>.activation_<H>.png`; reference :2276-2282 matshow per level);
    - student prediction overlays on the spectrogram, rgb, thermal
      (COLORMAP_HOT, :2313-2320) and depth renders;
    - fused-teacher pseudo-GT overlays on the rgb render (the training
      signal the student chases);
    - per-microphone spectrogram dumps (:2402-2412 specshow per channel).

    Returns the student's prediction rows.
    """
    import jax.numpy as jnp

    from ..data.base import prediction_to_label_lut, valid_prediction_ids
    from ..evaluation import make_fused_teacher_fn, make_predict_fn
    from ..ops.postprocess import class_validity_table

    out_dir = out_dir or config.get('exp_name', 'run')
    os.makedirs(out_dir, exist_ok=True)
    idx = dataset.ids.index(frame_id) if frame_id in dataset.ids else 0
    sample = dataset[idx]
    image_size = config.getint('image_size')
    num_classes = student_model[0].num_classes
    names = list(dataset.classes)
    safe_id = frame_id.replace('/', '_')

    vcd = dataset.valid_classes_dict
    class_valid = jnp.asarray(class_validity_table(
        num_classes, valid_prediction_ids(vcd)))
    pred_to_label = jnp.asarray(prediction_to_label_lut(vcd, num_classes))

    predict = make_predict_fn(student_model[0], image_size, config)
    audio = jnp.asarray(sample['audio'][None])
    rows, features = predict(student_model[1], audio, class_valid,
                             pred_to_label)
    rows = [r.tolist() for r in np.asarray(rows)[0] if r[5] != -1]

    # per-level attention maps of the student's feature pyramid
    for feature in features:
        f = np.asarray(feature[0], np.float32)
        save_attention_map(
            f, os.path.join(out_dir, f'{safe_id}.activation_{f.shape[0]}.png'))

    # fused teacher pseudo-GT (the training signal)
    fused_rows = []
    if teacher_models:
        fused_fn = make_fused_teacher_fn(
            {m: mv[0] for m, mv in teacher_models.items()}, image_size,
            config)
        t_vars = {m: mv[1] for m, mv in teacher_models.items()}
        inputs = {m: jnp.asarray(sample[m][None])
                  for m in ('rgb', 'thermal', 'depth', 'audio')
                  if sample.get(m) is not None}
        fused = np.asarray(fused_fn(t_vars, inputs, class_valid,
                                    pred_to_label))
        fused_rows = [r.tolist() for r in fused[0] if r[-1] != -1]

    spec_img = sample['audio'][..., 0]
    cv2.imwrite(os.path.join(out_dir, f'{safe_id}.student.png'),
                draw_predictions(spec_img, rows, names))

    rgb = sample.get('rgb')
    if rgb is not None:
        cv2.imwrite(os.path.join(out_dir, f'{safe_id}.rgb.png'),
                    draw_predictions(rgb, rows, names))
        if fused_rows:
            cv2.imwrite(
                os.path.join(out_dir, f'{safe_id}.rgb.fused_teachers.png'),
                draw_predictions(rgb, fused_rows, names))
    thermal = sample.get('thermal')
    if thermal is not None:
        t8 = thermal.reshape(thermal.shape[0], thermal.shape[1])
        t8 = cv2.normalize(t8, np.zeros_like(t8), 0, 255, cv2.NORM_MINMAX)
        hot = cv2.applyColorMap(t8.astype(np.uint8), cv2.COLORMAP_HOT)
        cv2.imwrite(os.path.join(out_dir, f'{safe_id}.thermal.png'),
                    draw_predictions(hot, rows, names))
    depth = sample.get('depth')
    if depth is not None:
        cv2.imwrite(os.path.join(out_dir, f'{safe_id}.depth.png'),
                    draw_predictions(depth, rows, names))

    # one spectrogram image per microphone channel
    for mic in range(sample['audio'].shape[-1]):
        ch = sample['audio'][..., mic]
        lo, hi = float(ch.min()), float(ch.max())
        ch8 = ((ch - lo) / (hi - lo + 1e-9) * 255).astype(np.uint8)
        cv2.imwrite(
            os.path.join(out_dir, f'{safe_id}.specshow_{mic}.png'),
            cv2.applyColorMap(ch8, cv2.COLORMAP_VIRIDIS))
    return rows
