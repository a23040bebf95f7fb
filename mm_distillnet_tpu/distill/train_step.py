"""The fused multi-teacher distillation step: one compiled function.

This is the TPU-native reincarnation of the reference's L3 "model with loss"
design (ModelWithNMSLossAugmented and siblings, reference
src/optimization/train_methods.py:50-762) plus the inner loop's backward +
optimizer step (src/optimization/traditional.py:92-207): the entire
"3 teacher forwards -> on-device decode + NMS pseudo-label fusion ->
student forward -> focal + MTA losses -> grad -> optimizer update" pipeline
compiles into a single jit'd function. Sharding the batch over the `data`
mesh axis makes XLA insert the gradient all-reduce — the SPMD replacement
for DataParallel/DDP (SURVEY.md section 2.3).

Supported train methods (reference train_methods.py:899-942):
  traditional                     per-teacher labels, losses averaged
  traditional_nms                 NMS-fused labels, per-teacher MTA
  traditional_nms_augmented       + audio-mix augmentation (shipped default)
  traditional_nms_kdlist          fused labels, multi-teacher MTA product
  traditional_nms_kdlist_augmented

Loss weighting matches traditional.py:171-181:
  loss = w_main * (mean(reg_losses) + mean(cls_losses))
         + w_div * div + w_kd * sum(stack(kd_losses)).

div_loss note: the reference BUILDS a DistillKL criterion from the config
(utils.py:1587-1590) and ModelWithLoss even evaluates it
(train_methods.py:572-573), but the value never reaches the gradient —
the wrapper returns zeros in its place (train_methods.py:584) and the
inner loop hard-codes loss_div = 0 (traditional.py:177). Here the key is
LIVE: div_loss=DistillKL adds w_div * sum_teachers KL(student || teacher)
over the pre-sigmoid class logits, reported as the KLDiv scalar. The
shipped config's div_loss=None keeps reference-default behavior exactly.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..losses.focal import focal_loss
from ..losses.mta import mta_loss
from .pseudo_labels import (PseudoLabelConfig, fuse_teacher_labels,
                            teacher_detections)
from ..ops.postprocess import detections_to_labels

# A/B hook (scripts/ab_focal_step.py): when True, the student focal loss
# consumes the heads' pre-sigmoid logits (focal_loss(..., logits=...),
# the -softplus identities). Module-level and read at TRACE time, so the
# harness can flip it before jitting. Default False on purpose: the
# logit-space variant measured 5-13 ms/step SLOWER in the composed train
# step (round 3, BENCH_NOTES.md) despite fewer transcendentals.
FOCAL_FROM_LOGITS = False


def _student_focal(out, annotations, anchors):
    if FOCAL_FROM_LOGITS and out.logits is not None:
        return focal_loss(out.classification, out.regression, annotations,
                          anchors, logits=out.logits)
    return focal_loss(out.classification, out.regression, annotations,
                      anchors)


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class DistillConfig(NamedTuple):
    train_method: str = 'traditional_nms_augmented'
    w_main: float = 1.0
    w_div: float = 1.0
    w_kd: float = 0.005
    T: float = 9.0
    p: float = 2.0
    mta_parity: bool = True
    audio_augmentation_merge: bool = False
    pl: PseudoLabelConfig = PseudoLabelConfig(image_size=768)
    # criterion selection (reference extract_criterions_from_config,
    # src/utils/utils.py:1556-1668): main_loss is YetAnotherFocalLoss;
    # kd_loss in {MTALoss, AttentionLoss, None};
    # div_loss in {DistillKL, None} — see the module docstring for why the
    # DistillKL path is live here while the reference drops its value.
    kd_loss: str = 'MTALoss'
    div_loss: str = 'None'
    # use_labels=True trains against the dataset's ground-truth annotations
    # instead of teacher pseudo-labels — only honored by the 'traditional'
    # method, matching the reference (ModelWithLoss.forward, reference
    # train_methods.py:557-565). With use_labels and no teachers this is
    # plain supervised detector training (used by the pretrain phase and the
    # convergence tests).
    use_labels: bool = False
    # which batch key feeds the trained network (default: the audio
    # student). Set to 'rgb'/'thermal'/'depth' to supervised-train a
    # teacher-architecture model on an image modality.
    student_input: str = 'audio'


def merge_audio_batch01(audio: jnp.ndarray) -> jnp.ndarray:
    """Audio-mix augmentation: batch element 1 becomes the log-domain "sum"
    of elements 0 and 1. Replicates merge_batch_0_1 exactly (reference
    src/optimization/train_methods.py:289-308) INCLUDING its quirk: the code
    computes a^10 + b^10 (torch.pow(audio, 10)), not 10^a + 10^b as the
    comment claims; we reproduce the executed behavior."""
    merged = jnp.power(audio[0], 10) + jnp.power(audio[1], 10)
    merged = jnp.clip(merged, min=1e-7)
    merged = jnp.log10(merged)
    return audio.at[1].set(merged)


def average_teacher_features_batch01(features: List[jnp.ndarray]
                                     ) -> List[jnp.ndarray]:
    """Teacher-feature companion of the audio merge: feature batch element 1
    averaged with element 0 per pyramid level (reference
    train_methods.py:276-287)."""
    out = []
    for f in features:
        out.append(f.at[1].set((f[0] + f[1]) / 2))
    return out


def _teacher_forward(teacher_models: Dict[str, Any],
                     teacher_variables: Dict[str, Any],
                     batch: Dict[str, jnp.ndarray]):
    """Frozen-teacher forwards (eval-mode BN; teachers are never trained,
    reference train_methods.py:891-893). Returns
    {modality: (classification, regression, features, logits)} where
    logits are the pre-sigmoid class outputs (consumed only by
    div_loss=DistillKL; XLA dead-code-eliminates them otherwise)."""
    outs = {}
    for modality, model in teacher_models.items():
        if hasattr(model, 'modalities'):
            # multi-modal generator teacher (the use_audio static teacher,
            # reference utils.py:506-558): takes a dict of its modalities
            x = {m: batch[m] for m in model.modalities}
        else:
            x = batch[modality]
        o = model.apply(teacher_variables[modality], x, train=False)
        feats = [jax.lax.stop_gradient(f) for f in
                 (o.features if model.features_from == 'efficientnet'
                  else [o.align_features])]
        logits_t = (jax.lax.stop_gradient(o.logits)
                    if o.logits is not None else None)
        outs[modality] = (jax.lax.stop_gradient(o.classification),
                          jax.lax.stop_gradient(o.regression), feats,
                          logits_t)
    return outs


def _labels_per_teacher(t_outs, anchors, class_valid, pred_to_label, cfg):
    """Per-teacher padded label tensors (B, max_det, 6) with scores."""
    labels = []
    for modality, (cls_t, reg_t, _, _) in t_outs.items():
        dets = teacher_detections(cls_t, reg_t, anchors, class_valid, cfg.pl)
        labels.append(detections_to_labels(dets, pred_to_label,
                                           cfg.pl.image_size,
                                           include_scores=True))
    return labels


def _augment_label_union(per_teacher_labels: List[jnp.ndarray]
                         ) -> List[jnp.ndarray]:
    """Under audio-mix augmentation the reference concatenates image 0's
    labels into image 1's candidate set before the fusion NMS
    (train_methods.py:384-390). With fixed shapes we emulate the union by
    appending each teacher's image-0 rows as extra 'teachers' for image 1
    only (padding them out for every other image)."""
    extras = []
    for lab in per_teacher_labels:
        ghost = jnp.zeros_like(lab)
        ghost = ghost.at[..., 5].set(-1.0)      # all-invalid rows
        ghost = ghost.at[1].set(lab[0])         # image 1 sees image 0's rows
        extras.append(ghost)
    return per_teacher_labels + extras


def compute_distill_losses(student_model, params, batch_stats,
                           teacher_models, teacher_variables,
                           batch, cfg: DistillConfig,
                           anchors, class_valid, pred_to_label,
                           train: bool, dropout_rng=None):
    """Shared loss computation for train and validation.

    Returns (loss, aux) where aux carries new batch_stats and the scalar
    breakdown matching the reference's logged quantities."""
    # Compact audio ingest (config device_audio_resize): the loader ships
    # the spectrogram stack time-stretched only, (B, 80, S, M); the 80-mel
    # axis is stretched to S here, on-device, where the bicubic matmul is
    # ~free (ops/resize.py::stretch_mel_axis). Shape-static, so the
    # standard full-size path compiles identically.
    if batch[cfg.student_input].shape[-3] != cfg.pl.image_size:
        from ..ops.resize import maybe_stretch_mel_axis
        batch = {**batch, cfg.student_input: maybe_stretch_mel_axis(
            batch[cfg.student_input], cfg.pl.image_size)}
    audio = batch[cfg.student_input]
    augment = cfg.audio_augmentation_merge and \
        'augmented' in cfg.train_method
    if augment:
        audio = merge_audio_batch01(audio)

    t_outs = _teacher_forward(teacher_models, teacher_variables,
                              {**batch, cfg.student_input: audio})
    if augment:
        t_outs = {m: (c, r, average_teacher_features_batch01(f), lg)
                  for m, (c, r, f, lg) in t_outs.items()}

    # ---- student forward ----
    variables = {'params': params, 'batch_stats': batch_stats}
    rngs = {'dropout': dropout_rng} if (train and dropout_rng is not None) \
        else None
    if train:
        out, mutated = student_model.apply(
            variables, audio, train=True, mutable=['batch_stats'], rngs=rngs)
        new_batch_stats = mutated['batch_stats']
    else:
        out = student_model.apply(variables, audio, train=False)
        new_batch_stats = batch_stats
    feats_s = (list(out.features)
               if student_model.features_from == 'efficientnet'
               else [out.align_features])

    # ---- pseudo-labels ----
    method = cfg.train_method
    use_gt = cfg.use_labels and method == 'traditional'
    per_teacher = [] if use_gt else _labels_per_teacher(
        t_outs, anchors, class_valid, pred_to_label, cfg)
    if use_gt:
        # supervised: ground-truth annotations as targets (reference
        # ModelWithLoss.forward with use_labels=True,
        # train_methods.py:557-558); the reference computes the identical
        # focal loss once per teacher then averages — same value, so one
        # evaluation suffices (and it covers the zero-teacher case).
        r, c = _student_focal(out, batch['label'], anchors)
        reg_losses, cls_losses = [r], [c]
    elif method == 'traditional':
        # per-teacher labels, no cross-teacher fusion (ModelWithLoss,
        # reference train_methods.py:520-584)
        reg_losses, cls_losses = [], []
        for lab in per_teacher:
            ann = jnp.concatenate([lab[..., :4], lab[..., 5:6]], axis=-1)
            r, c = _student_focal(out, ann, anchors)
            reg_losses.append(r)
            cls_losses.append(c)
    else:
        fuse_inputs = per_teacher
        if augment:
            fuse_inputs = _augment_label_union(per_teacher)
        fused = fuse_teacher_labels(fuse_inputs, cfg.pl)
        # Probability path on purpose: the logit-space variant measured
        # slower in the composed step (scripts/ab_focal_step.py round 3;
        # flip FOCAL_FROM_LOGITS above to re-measure).
        r, c = _student_focal(out, fused, anchors)
        reg_losses, cls_losses = [r], [c]

    # ---- KD losses ----
    kd_losses = []
    teacher_feats = [f for (_, _, f, _) in t_outs.values()]
    if not teacher_feats:
        kd_losses.append(jnp.zeros((1,)))
    elif cfg.kd_loss in (None, 'None'):
        kd_losses.append(jnp.zeros((1,)))
    elif cfg.kd_loss == 'AttentionLoss':
        from ..losses.aux_losses import attention_transfer_loss
        for ft in teacher_feats:
            kd_losses.append(attention_transfer_loss(feats_s, ft, cfg.p))
    elif 'kdlist' in method:
        kd_losses.append(mta_loss(feats_s, teacher_feats, cfg.T, cfg.p,
                                  cfg.mta_parity))
    else:
        for ft in teacher_feats:
            kd_losses.append(mta_loss(feats_s, ft, cfg.T, cfg.p,
                                      cfg.mta_parity))

    # ---- divergence loss (div_loss=DistillKL; see module docstring) ----
    if cfg.div_loss not in (None, 'None', 'DistillKL'):
        # mirror the factory's loud rejection (reference utils.py:1592)
        raise ValueError(f'Unsupported DIV Loss {cfg.div_loss}')
    loss_div = jnp.zeros(())
    if cfg.div_loss == 'DistillKL' and t_outs and out.logits is not None:
        from ..losses.aux_losses import distill_kl
        for (_, _, _, logits_t) in t_outs.values():
            if logits_t is not None:
                # class-axis softmax: the detector analogue of Hinton KD
                # over (B, N_anchors, C) pre-sigmoid logits (the RepDistiller
                # original, reference src/loss/DistillKL.py:24-31, softmaxes
                # dim=1 of (B, C) classifier logits — same axis role).
                loss_div = loss_div + distill_kl(out.logits, logits_t,
                                                 T=4.0, axis=-1)

    loss_regression = jnp.mean(jnp.stack(reg_losses))
    loss_cls = jnp.mean(jnp.stack(cls_losses))
    loss_kd = jnp.sum(jnp.stack(kd_losses))
    loss = (cfg.w_main * (loss_regression + loss_cls)
            + cfg.w_div * loss_div + cfg.w_kd * loss_kd)

    aux = {
        'batch_stats': new_batch_stats,
        'metrics': {
            'Total_loss': loss,
            'Regression_loss': loss_regression,
            'Class_loss': loss_cls,
            'KLDiv': loss_div,
            'KD': loss_kd,
        },
    }
    return loss, aux


def make_train_step(student_model, teacher_models, tx,
                    cfg: DistillConfig, anchors, class_valid, pred_to_label):
    """Builds the jit-able train step. Call under jit with the batch sharded
    over the data mesh; XLA handles the gradient reduction."""

    def train_step(state: TrainState, teacher_variables, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return compute_distill_losses(
                student_model, params, state.batch_stats, teacher_models,
                teacher_variables, batch, cfg, anchors, class_valid,
                pred_to_label, train=True, dropout_rng=dropout_rng)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=aux['batch_stats'],
                               opt_state=new_opt_state)
        return new_state, aux['metrics']

    return train_step


def make_train_step_per_replica_bn(student_model, teacher_models, tx,
                                   cfg: DistillConfig, anchors, class_valid,
                                   pred_to_label, mesh):
    """Train step with the reference's exact BatchNorm semantics.

    Under plain SPMD jit, batch statistics are computed over the GLOBAL
    batch (XLA inserts the collective) — sync-BN. The reference's
    DataParallel/DDP instead keeps PER-REPLICA statistics, and the running
    stats that persist are those of replica 0 (torch DataParallel aliases
    the device-0 replica's buffers to the original module). This variant
    reproduces that: shard_map over the `data` axis computes losses and BN
    stats on each shard independently, all-reduces gradients and metrics
    with explicit psum/pmean collectives over ICI, and keeps shard 0's
    running stats.
    """
    from jax.sharding import PartitionSpec as P

    def per_shard(state: TrainState, teacher_variables, batch, rng):
        dropout_rng = jax.random.fold_in(
            jax.random.fold_in(rng, state.step),
            jax.lax.axis_index('data'))

        def loss_fn(params):
            return compute_distill_losses(
                student_model, params, state.batch_stats, teacher_models,
                teacher_variables, batch, cfg, anchors, class_valid,
                pred_to_label, train=True, dropout_rng=dropout_rng)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = jax.lax.pmean(grads, 'data')
        metrics = {k: jax.lax.pmean(v, 'data')
                   for k, v in aux['metrics'].items()}
        # replica-0 running stats persist (torch DataParallel semantics)
        new_stats = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, 'data')[0],
            aux['batch_stats'])
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats,
                               opt_state=new_opt_state)
        return new_state, metrics

    try:
        from jax import shard_map  # jax >= 0.5
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def train_step(state, teacher_variables, batch, rng):
        specs = {k: P('data') for k in batch}
        kwargs = {}
        try:
            import inspect
            if 'check_vma' in inspect.signature(shard_map).parameters:
                kwargs['check_vma'] = False
            else:
                kwargs['check_rep'] = False
        except (TypeError, ValueError):
            pass
        return shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(), specs, P()),
            out_specs=(P(), P()), **kwargs)(state, teacher_variables,
                                            batch, rng)

    return train_step


def make_eval_loss_step(student_model, teacher_models, cfg: DistillConfig,
                        anchors, class_valid, pred_to_label):
    """Validation loss (reference validate(), train_methods.py:1083-1185):
    same computation without grads, eval-mode student BN."""

    def eval_step(state: TrainState, teacher_variables, batch):
        loss, aux = compute_distill_losses(
            student_model, state.params, state.batch_stats, teacher_models,
            teacher_variables, batch, cfg, anchors, class_valid,
            pred_to_label, train=False)
        return aux['metrics']

    return eval_step


def init_train_state(student_model, rng, sample_input, tx,
                     variables=None) -> TrainState:
    """`variables` short-circuits the jitted init when the caller already
    has them (checkpoint restore, tests' fast_init)."""
    if variables is None:
        variables = jax.jit(student_model.init)(rng, sample_input)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)
