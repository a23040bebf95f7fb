#!/usr/bin/env python
"""Per-phase breakdown of the fused distillation train step.

Decomposes the single-jit step (3 frozen D2 teachers -> on-device
pseudo-label fusion -> D2 student fwd/bwd -> Adam) into device-timed
phases, the measurement VERDICT round 1 asked for ("teacher-fwd /
pseudo-label / student-fwd-bwd breakdown"):

  teachers_fwd      3x EfficientDet-D2 eval-mode forwards
  pseudo_labels     decode + per-teacher NMS + cross-teacher fusion
                    (measured as [teachers_fwd + labels] - teachers_fwd)
  student_fwd_bwd   student forward + focal/MTA + grad + Adam given
                    precomputed fused labels & teacher features
  full_step         the real fused step (sanity: ~= sum of phases)

Run on the TPU chip:   python scripts/profile_train_step.py
Options: PROF_BATCHES="8,16" PROF_SIZE=768 PROF_ITERS=10
Prints one JSON line per batch size plus a markdown table for BENCH_NOTES.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('MMDT_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['MMDT_PLATFORM'])
import jax  # noqa: E402
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('MMDT_COMPILE_CACHE',
                                 os.path.expanduser('~/.cache/mmdt_xla')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from mm_distillnet_tpu.distill.pseudo_labels import (  # noqa: E402
    PseudoLabelConfig, fuse_teacher_labels)
from mm_distillnet_tpu.distill.train_step import (  # noqa: E402
    DistillConfig, TrainState, _labels_per_teacher, _teacher_forward,
    make_train_step)
from mm_distillnet_tpu.losses.focal import focal_loss  # noqa: E402
from mm_distillnet_tpu.losses.mta import mta_loss  # noqa: E402
from mm_distillnet_tpu.models.efficientdet import EfficientDet  # noqa: E402
from mm_distillnet_tpu.ops.anchors import anchor_table  # noqa: E402
from mm_distillnet_tpu.ops.postprocess import class_validity_table  # noqa: E402
from mm_distillnet_tpu.utils.profiling import device_time  # noqa: E402

SIZE = int(os.environ.get('PROF_SIZE', '768'))
ITERS = int(os.environ.get('PROF_ITERS', '10'))
BATCHES = [int(b) for b in os.environ.get('PROF_BATCHES', '8,16').split(',')]
MODALITY_CH = {'rgb': 3, 'thermal': 1, 'depth': 3}


def build(batch_size):
    student = EfficientDet(num_classes=20, compound_coef=2,
                           dtype=jnp.bfloat16)
    teachers = {m: EfficientDet(num_classes=20, compound_coef=2,
                                dtype=jnp.bfloat16)
                for m in MODALITY_CH}
    rng = jax.random.PRNGKey(0)
    batch = {m: jax.random.normal(jax.random.fold_in(rng, i),
                                  (batch_size, SIZE, SIZE, c), jnp.float32)
             for i, (m, c) in enumerate(MODALITY_CH.items())}
    batch['audio'] = jax.random.normal(jax.random.fold_in(rng, 9),
                                       (batch_size, SIZE, SIZE, 8))
    t_vars = {m: jax.jit(t.init)(jax.random.PRNGKey(i + 1), batch[m])
              for i, (m, t) in enumerate(teachers.items())}
    s_vars = jax.jit(student.init)(jax.random.PRNGKey(7), batch['audio'])
    tx = optax.adam(1e-4)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=s_vars['params'],
                       batch_stats=s_vars['batch_stats'],
                       opt_state=tx.init(s_vars['params']))
    anchors = jnp.asarray(anchor_table(SIZE))
    class_valid = jnp.asarray(class_validity_table(20, [6]))
    pred_to_label = jnp.arange(20)
    cfg = DistillConfig(train_method='traditional_nms',
                        pl=PseudoLabelConfig(image_size=SIZE))
    return (student, teachers, batch, t_vars, state, tx, anchors,
            class_valid, pred_to_label, cfg)


def profile(batch_size):
    (student, teachers, batch, t_vars, state, tx, anchors, class_valid,
     pred_to_label, cfg) = build(batch_size)

    def teachers_fwd(t_vars, batch):
        outs = _teacher_forward(teachers, t_vars, batch)
        return [outs[m][0] for m in outs]

    def teachers_and_labels(t_vars, batch):
        outs = _teacher_forward(teachers, t_vars, batch)
        per_teacher = _labels_per_teacher(outs, anchors, class_valid,
                                          pred_to_label, cfg)
        return fuse_teacher_labels(per_teacher, cfg.pl)

    # student fwd/bwd + optimizer against FIXED fused labels + teacher feats
    t_outs = _teacher_forward(teachers, t_vars, batch)
    fused = teachers_and_labels(t_vars, batch)
    teacher_feats = [f for (_, _, f, _) in t_outs.values()]

    def student_fwd_bwd(state, audio, fused):
        def loss_fn(params):
            out, mutated = student.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                audio, train=True, mutable=['batch_stats'],
                rngs={'dropout': jax.random.PRNGKey(0)})
            r, c = focal_loss(out.classification, out.regression, fused,
                              anchors)
            kd = sum(mta_loss(list(out.features), ft, cfg.T, cfg.p,
                              cfg.mta_parity)[0] for ft in teacher_feats)
            return r + c + cfg.w_kd * kd, mutated['batch_stats']
        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, bs, opt_state).params

    step = make_train_step(student, teachers, tx, cfg, anchors, class_valid,
                           pred_to_label)

    def full(state, t_vars, batch):
        new_state, metrics = step(state, t_vars, batch, jax.random.PRNGKey(3))
        # depend on EVERY updated parameter — returning only the loss (or
        # a single leaf) lets XLA dead-code-eliminate most of the backward
        # pass + optimizer and report a fantasy step time
        dep = sum(l.sum().astype(jnp.float32)
                  for l in jax.tree_util.tree_leaves(new_state.params))
        return metrics['Total_loss'] + dep

    times = {}
    times['teachers_fwd'] = device_time(teachers_fwd, (t_vars, batch),
                                        iters=ITERS)
    times['teachers_plus_labels'] = device_time(
        teachers_and_labels, (t_vars, batch), iters=ITERS)
    times['student_fwd_bwd'] = device_time(
        student_fwd_bwd, (state, batch['audio'], fused), iters=ITERS)
    times['full_step'] = device_time(full, (state, t_vars, batch),
                                     iters=ITERS)
    times['pseudo_labels'] = (times['teachers_plus_labels']
                              - times['teachers_fwd'])
    ms = {k: round(v * 1000, 1) for k, v in times.items()}
    fps = batch_size / times['full_step']
    print(json.dumps({'batch': batch_size, 'size': SIZE, 'ms': ms,
                      'fps_per_chip': round(fps, 1)}))
    return ms, fps


def main():
    rows = []
    for b in BATCHES:
        ms, fps = profile(b)
        rows.append((b, ms, fps))
    print('\n| batch | teachers fwd | pseudo-labels | student fwd+bwd '
          '| full step | fps/chip |')
    print('|---|---|---|---|---|---|')
    for b, ms, fps in rows:
        print(f"| {b} | {ms['teachers_fwd']} ms | {ms['pseudo_labels']} ms "
              f"| {ms['student_fwd_bwd']} ms | {ms['full_step']} ms "
              f"| {fps:.1f} |")


if __name__ == '__main__':
    main()
