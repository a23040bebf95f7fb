"""Evaluation driver: mAP sweep + central distances + CSV artifacts.

Mirrors the reference evaluate() (reference src/utils/utils.py:2018-2181)
and its prediction loops (get_predictions_multiteacher utils.py:1720-1890):

- when all of rgb/thermal/depth are enabled the testing point is 'ALL'
  (teachers fused by NMS into pseudo-ground-truth); otherwise one testing
  point per enabled teacher modality;
- student predictions come from the audio branch, decoded + NMS'd
  ON DEVICE in fixed shapes (no per-batch host NMS round-trip — the
  reference's main eval bottleneck, SURVEY.md section 3.3);
- metrics: AP@0.5:0.05:0.95 sweep (ap_per_class), CDx/CDy at IoU=0.5;
- artifacts: `{exp_name}/results.{rank}.csv` with columns
  [exp_name, modality, AP@Ave, AP@0.5, AP@0.75, CDx, CDy] and
  `{exp_name}/resources.{rank}.csv` with [model, Time2Predict, TotalParams,
  TrainParams];
- optional persistence of fused labels to
  `{data_path}/{drive}/annotations/{ts}.all.txt` (utils.py:1878-1888).
"""
from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .config import student_input_key
from .data.base import prediction_to_label_lut, valid_prediction_ids
from .data.loader import DataLoader
from .distill.pseudo_labels import fuse_teacher_labels, teacher_detections
from .ops.anchors import anchor_table
from .ops.postprocess import (class_validity_table, detections_to_labels,
                              postprocess_detections)
from .train.trainer import distill_config_from
from .utils.metrics import (ap_per_class, get_batch_central_distances,
                            get_batch_statistics, labels_to_lists)

logger = logging.getLogger(__name__)


def count_params(variables) -> int:
    return int(sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(variables.get('params',
                                                           variables))))


def make_predict_fn(model, image_size: int, config, variables=None,
                    mesh=None, quant_pack=None):
    """Jitted: input image -> padded label rows [x1,y1,x2,y2,score,label].

    With config `fused_inference=True` (and `variables` provided), the
    backbone runs through the fused Pallas MBConv path
    (models.fused_forward); weights are baked into the compiled function.

    With `mesh` (a 1-D `data` Mesh), the batch dim of `x` and of the
    returned label rows is sharded over the mesh while variables/tables
    stay replicated — the SPMD replacement for the reference's
    `nn.DataParallel` eval wrap (reference evaluate.py:148-162). Feed a
    batch that divides the mesh size (evaluate() pads via
    parallel.mesh.pad_batch_to_devices).

    With `quant_pack` (quant.build_quant_pack), the forward runs the int8
    PTQ path (config `quant_inference=True` builds one in evaluate()).
    """
    anchors = jnp.asarray(anchor_table(image_size))
    conf = config.getfloat('conf_threshold', fallback=0.3)
    nms_thr = config.getfloat('nms_threshold', fallback=0.5)
    cands = config.getint('nms_candidates', fallback=512)
    max_det = config.getint('max_detections', fallback=100)
    # approx_topk=True routes candidate selection through the TPU-native
    # approx_max_k (recall_target 0.99) instead of exact top_k.
    approx = config.getboolean('approx_topk', fallback=False) or False
    fused = None
    if variables is not None and \
            config.getboolean('fused_inference', fallback=False):
        from .models.fused_forward import make_fused_predictor
        fused = make_fused_predictor(model, variables, image_size)

    def predict(variables, x, class_valid, pred_to_label):
        if x.shape[-3] != image_size:
            # compact audio ingest (config device_audio_resize): stretch
            # the 80-mel axis on-device; maybe_* raises loudly on heights
            # that are neither image_size nor the 80 mel bins.
            from .ops.resize import maybe_stretch_mel_axis
            x = maybe_stretch_mel_axis(x, image_size)
        if quant_pack is not None:
            from .quant import quantized_apply
            out = quantized_apply(model, variables, quant_pack, x,
                                  train=False)
        elif fused is not None:
            out = fused(x)
        else:
            out = model.apply(variables, x, train=False)
        dets = postprocess_detections(
            out.classification, out.regression, anchors, class_valid,
            image_size=image_size, conf_threshold=conf,
            nms_threshold=nms_thr, num_candidates=cands,
            max_detections=max_det, approx=approx)
        labels = detections_to_labels(dets, pred_to_label, image_size,
                                      include_scores=True)
        return labels, out.features

    if mesh is not None:
        from .parallel.mesh import batch_sharding, replicated_sharding
        data = batch_sharding(mesh)
        rep = replicated_sharding(mesh)
        return jax.jit(predict,
                       in_shardings=(rep, data, rep, rep),
                       out_shardings=(data, data))
    return jax.jit(predict)


def make_fused_teacher_fn(teacher_models: Dict[str, Any], image_size: int,
                          config, mesh=None):
    """Jitted: all teacher inputs -> fused pseudo-GT label rows.

    `mesh` shards the batch dim over the `data` axis (teacher variables
    replicated), same contract as make_predict_fn.
    """
    cfg = distill_config_from(config, image_size)
    anchors = jnp.asarray(anchor_table(image_size))

    def fused(teacher_variables, batch, class_valid, pred_to_label):
        if 'audio' in batch and batch['audio'].shape[-3] != image_size:
            # compact audio ingest: only generator teachers consume audio
            from .ops.resize import maybe_stretch_mel_axis
            batch = {**batch, 'audio': maybe_stretch_mel_axis(
                batch['audio'], image_size)}
        per_teacher = []
        for modality, model in teacher_models.items():
            if hasattr(model, 'modalities'):
                x = {m: batch[m] for m in model.modalities}
            else:
                x = batch[modality]
            out = model.apply(teacher_variables[modality], x, train=False)
            dets = teacher_detections(out.classification, out.regression,
                                      anchors, class_valid, cfg.pl)
            per_teacher.append(detections_to_labels(
                dets, pred_to_label, image_size, include_scores=True))
        return fuse_teacher_labels(per_teacher, cfg.pl)

    if mesh is not None:
        from .parallel.mesh import batch_sharding, replicated_sharding
        data = batch_sharding(mesh)
        rep = replicated_sharding(mesh)
        return jax.jit(fused,
                       in_shardings=(rep, data, rep, rep),
                       out_shardings=data)
    return jax.jit(fused)


def _rows_with_scores_to_lists(rows: np.ndarray) -> List[List[List[float]]]:
    out = []
    for i in range(rows.shape[0]):
        out.append([r.tolist() for r in rows[i] if r[5] != -1])
    return out


def _save_fused_annotations(config, ids, fused_rows):
    data_path = config.get('data_path', 'data')
    for frame_id, rows in zip(ids, labels_to_lists(fused_rows)):
        try:
            drive, ts = frame_id.split('/')
        except ValueError:
            continue
        ann_dir = os.path.join(data_path, drive, 'annotations')
        os.makedirs(ann_dir, exist_ok=True)
        with open(os.path.join(ann_dir, f'{ts}.all.txt'), 'w') as f:
            for r in rows:
                f.write(' '.join(str(int(v)) for v in r[:4]) +
                        f' {int(r[4])}\n')


def evaluate(teacher_models: Dict[str, Tuple[Any, Any]],
             student_model: Tuple[Any, Any],
             test_set, config) -> pd.DataFrame:
    """teacher_models: {modality: (module, variables)};
    student_model: (module, variables). Returns the ap_table DataFrame and
    writes results/resources CSVs."""
    logger.warning('Beginning evaluation of student model performance')
    rank = config.getint('rank', fallback=0) or 0
    image_size = config.getint('image_size')
    s_module, s_vars = student_model
    num_classes = s_module.num_classes

    vcd = test_set.valid_classes_dict
    class_valid = jnp.asarray(class_validity_table(
        num_classes, valid_prediction_ids(vcd)))
    pred_to_label = jnp.asarray(prediction_to_label_lut(vcd, num_classes))

    # SPMD eval: shard the prediction batch over all local devices (the
    # reference wraps eval in nn.DataParallel, evaluate.py:148-162; here the
    # same surface runs one jit sharded over a 1-D `data` mesh). Config
    # `eval_devices` caps the mesh (fallback: all local devices); a 1-device
    # mesh degenerates to the plain jit.
    from .parallel.mesh import create_mesh, pad_batch_to_devices
    n_eval_dev = config.getint('eval_devices', fallback=-1) or -1
    n_avail = len(jax.local_devices())
    n_eval_dev = n_avail if n_eval_dev <= 0 else min(n_eval_dev, n_avail)
    mesh = create_mesh(n_eval_dev) if n_eval_dev > 1 else None

    # int8 PTQ inference opt-in (`quant_inference=True`): calibrate
    # activation scales on the first frames of the test set, then run the
    # student forward through quant.quantized_apply. See quant.py for why
    # (the roofline says the eval forward is HBM-bound; int8 halves the
    # bytes).
    quant_pack = None
    student_key = student_input_key(config)
    if config.getboolean('quant_inference', fallback=False):
        from .quant import build_quant_pack
        n_cal = min(len(test_set), 8)
        calib = np.stack([np.asarray(test_set[i][student_key])
                          for i in range(n_cal)])
        if calib.shape[-3] != image_size:
            # compact audio ingest: calibrate on what the model will see
            from .ops.resize import maybe_stretch_mel_axis
            calib = np.asarray(maybe_stretch_mel_axis(jnp.asarray(calib),
                                                      image_size))
        quant_pack = build_quant_pack(s_module, s_vars, jnp.asarray(calib),
                                      [calib], train=False)

    predict = make_predict_fn(s_module, image_size, config, variables=s_vars,
                              mesh=mesh, quant_pack=quant_pack)
    testing_points = list(teacher_models.keys())
    if (config.getboolean('use_thermal', fallback=False)
            and config.getboolean('use_depth', fallback=False)
            and config.getboolean('use_rgb', fallback=True)
            and len(teacher_models) > 1):
        testing_points = ['ALL']

    # Evaluation throughput scales with batch on TPU (BENCH_NOTES.md:
    # 310/390/565/646 fps at 16/32/64/128); eval_batch_size decouples the
    # inference batch from the training batch_size (reference evaluates at
    # the training batch, utils.py:2018-2030 — kept as the default).
    eval_batch = config.getint('eval_batch_size',
                               fallback=config.getint('batch_size'))
    loader = DataLoader(test_set, eval_batch,
                        shuffle=False, drop_last=False,
                        num_workers=config.getint('num_workers', fallback=4))
    fast_run = config.getboolean('fast_run', fallback=False)
    save_ann = config.getboolean('save_fused_annotations', fallback=False)

    ap_table = []
    for modality in testing_points:
        if modality == 'ALL':
            fused_fn = make_fused_teacher_fn(
                {m: mv[0] for m, mv in teacher_models.items()},
                image_size, config, mesh=mesh)
            t_vars = {m: mv[1] for m, mv in teacher_models.items()}
        else:
            fused_fn = make_fused_teacher_fn(
                {modality: teacher_models[modality][0]}, image_size, config,
                mesh=mesh)
            t_vars = {modality: teacher_models[modality][1]}

        all_predictions, all_labels = [], []
        target_classes: List[float] = []
        n_frames = 0
        start_time = time.time()

        def _drain(entry):
            batch, n, pred_rows, fused = entry
            # host reads happen here, AFTER the next batch's device work
            # has been dispatched (one-batch software pipeline: each host
            # round-trip through the axon relay costs ~27 ms and would
            # otherwise serialize with the device). [:n] drops the rows
            # pad_batch_to_devices added for even mesh sharding.
            preds = _rows_with_scores_to_lists(np.asarray(pred_rows)[:n])
            fused = np.asarray(fused)[:n]
            labels = labels_to_lists(fused)
            all_predictions.append(preds)
            all_labels.append(labels)
            for img_labels in labels:
                target_classes.extend([r[4] for r in img_labels])
            nonlocal n_frames
            n_frames += n
            if save_ann:
                _save_fused_annotations(config, batch['id'], fused)

        # Software pipeline depth: how many batches' device work stays in
        # flight before the host reads results back. Depth 2 keeps the
        # device busy across TWO ~27 ms axon host-read round-trips
        # (VERDICT r2 perf backlog; depth 1 was the round-2 pipeline).
        from collections import deque
        depth = max(1, config.getint('eval_pipeline_depth', fallback=2))
        pending = deque()
        # Input transfer dtype: bf16 inputs halve the host->device infeed
        # bytes when the model computes in bf16 anyway (config
        # transfer_dtype; see train/trainer.py and BENCH_NOTES round 4).
        from .config import transfer_dtype_from
        tdtype = transfer_dtype_from(config)
        for bi, batch in enumerate(loader):
            arrays = {m: batch[m]
                      for m in ('rgb', 'thermal', 'depth', 'audio')
                      if m in batch}
            if tdtype is not None:
                arrays = {m: a.astype(tdtype) for m, a in arrays.items()}
            n_real = arrays[student_key].shape[0]
            if mesh is not None:
                # tail batches must still divide the mesh: repeat the last
                # frame (results sliced back to n_real in _drain)
                arrays, _ = pad_batch_to_devices(arrays, n_eval_dev)
            audio = jnp.asarray(arrays[student_key])
            pred_rows, _ = predict(s_vars, audio, class_valid, pred_to_label)
            if config.getboolean('use_labels', fallback=False) and \
                    'label' in batch and (batch['label'][..., 4] != -1).any():
                fused = batch['label']
            else:
                # a generator teacher consumes modalities beyond its own
                # key, so ship every image modality in the batch
                dev_inputs = {m: jnp.asarray(a) for m, a in arrays.items()}
                fused = fused_fn(t_vars, dev_inputs, class_valid,
                                 pred_to_label)
            pending.append((batch, n_real, pred_rows, fused))
            while len(pending) > depth:
                _drain(pending.popleft())
            if fast_run and bi >= 1:
                break
        while pending:
            _drain(pending.popleft())
        elapsed = time.time() - start_time

        total_params = count_params(s_vars)
        resources = pd.DataFrame([{
            'model': config.get('student', 'student'),
            'Time2Predict': elapsed,
            'TotalParams': total_params,
            'TrainParams': total_params,
            'Frames': n_frames,
            'FramesPerSec': n_frames / elapsed if elapsed > 0 else 0.0,
        }])
        exp_name = config.get('exp_name', 'run')
        os.makedirs(exp_name, exist_ok=True)
        # Written inside the per-modality loop on purpose: the reference does
        # the same (utils.py:2086-2095 sit inside `for modality in
        # testing_points:`), so with multiple testing points the last
        # modality's timing wins there too. In the shipped recipe
        # rgb+thermal+depth collapse to testing_points=['ALL'] → one write.
        resources.to_csv(os.path.join(exp_name, f'resources.{rank}.csv'),
                         index=False)

        ap_modality = {'exp_name': exp_name, 'modality': modality,
                       'AP@Ave': 0., 'AP@0.5': 0., 'AP@0.75': 0.,
                       'CDx': 0., 'CDy': 0.}
        ap_record = []
        target_cls_arr = np.asarray(target_classes)
        for iou in np.around(np.arange(0.5, 0.95, 0.05), 2):
            sample_metrics = []
            cd_x, cd_y = [], []
            for preds, labels in zip(all_predictions, all_labels):
                sample_metrics += get_batch_statistics(preds, labels, iou)
                cdx, cdy = get_batch_central_distances(
                    preds, labels, image_size, image_size)
                cd_x.extend(cdx)
                cd_y.extend(cdy)
            if not any(np.asarray(m[0]).size for m in sample_metrics):
                mean = 0.0
                if iou == 0.5:
                    ap_modality['CDx'] = 100.
                    ap_modality['CDy'] = 100.
            else:
                tps, scores, pls = [np.concatenate(x, 0)
                                    for x in zip(*sample_metrics)]
                _, _, AP, _, _, _ = ap_per_class(tps, scores, pls,
                                                 target_cls_arr)
                mean = float(AP.mean()) if AP.size else 0.0
                if iou == 0.5:
                    ap_modality['AP@0.5'] = mean * 100
                    ap_modality['CDx'] = float(np.mean(cd_x)) * 100 \
                        if cd_x else 100.
                    ap_modality['CDy'] = float(np.mean(cd_y)) * 100 \
                        if cd_y else 100.
                if iou == 0.75:
                    ap_modality['AP@0.75'] = mean * 100
            ap_record.append(mean)
        ap_modality['AP@Ave'] = float(np.mean(ap_record)) * 100
        ap_table.append(ap_modality)
        logger.warning('modality %s: %s', modality, ap_modality)

    ap_table = pd.DataFrame(ap_table)
    ap_table.to_csv(os.path.join(config.get('exp_name', 'run'),
                                 f'results.{rank}.csv'), index=False)
    return ap_table
