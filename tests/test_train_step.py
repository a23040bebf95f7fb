"""End-to-end distillation train-step tests (tiny models, virtual devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_distillnet_tpu.distill.pseudo_labels import PseudoLabelConfig
from mm_distillnet_tpu.distill.train_step import (DistillConfig, TrainState,
                                                  init_train_state,
                                                  make_eval_loss_step,
                                                  make_train_step)
from mm_distillnet_tpu.models.efficientdet import EfficientDet
from mm_distillnet_tpu.ops.anchors import anchor_table
from mm_distillnet_tpu.ops.postprocess import class_validity_table
from mm_distillnet_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from mm_distillnet_tpu.train.optim import build_optimizer
from mm_distillnet_tpu.config import default_config

from .helpers import fast_init, fast_train_state  # noqa: E402

SIZE = 128
# Plumbing tests run the TEST-TINY profile (compound_coef=-1): same
# topology and the same fused-step program structure as D0, ~50x smaller
# graph. Real coefficients are covered by test_model_shapes and the
# torch-oracle parity suites.
CC = -1


def _setup(method='traditional_nms_augmented', batch=2):
    config = default_config(lr='1e-3', train_method=method)
    student = EfficientDet(num_classes=20, compound_coef=CC,
                           dtype=jnp.float32)
    teachers = {
        'rgb': EfficientDet(num_classes=20, compound_coef=CC,
                            dtype=jnp.float32),
        'thermal': EfficientDet(num_classes=20, compound_coef=CC,
                                dtype=jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    batch_data = {
        'rgb': jax.random.normal(rng, (batch, SIZE, SIZE, 3)),
        'thermal': jax.random.normal(rng, (batch, SIZE, SIZE, 1)),
        'audio': jax.random.normal(rng, (batch, SIZE, SIZE, 8)),
    }
    teacher_vars = {
        m: fast_init(t, i + 1, batch_data[m])
        for i, (m, t) in enumerate(teachers.items())
    }
    tx = build_optimizer(config)
    state = fast_train_state(student, 9, batch_data['audio'], tx)
    anchors = jnp.asarray(anchor_table(SIZE))
    class_valid = jnp.asarray(class_validity_table(20, list(range(20))))
    pred_to_label = jnp.arange(20)
    cfg = DistillConfig(
        train_method=method,
        pl=PseudoLabelConfig(image_size=SIZE, conf_threshold=0.3,
                             num_candidates=64, max_det_per_teacher=8,
                             max_gt=16))
    return (student, teachers, teacher_vars, tx, state, batch_data, anchors,
            class_valid, pred_to_label, cfg)


@pytest.mark.parametrize('method', ['traditional_nms_augmented',
                                    'traditional_nms_kdlist',
                                    'traditional'])
def test_train_step_runs_and_updates(method):
    (student, teachers, teacher_vars, tx, state, batch, anchors,
     class_valid, pred_to_label, cfg) = _setup(method)
    step = jax.jit(make_train_step(student, teachers, tx, cfg, anchors,
                                   class_valid, pred_to_label))
    new_state, metrics = step(state, teacher_vars, batch,
                              jax.random.PRNGKey(3))
    for k in ('Total_loss', 'Regression_loss', 'Class_loss', 'KD'):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    # params must change
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    assert int(new_state.step) == 1


def test_eval_loss_step_no_mutation():
    (student, teachers, teacher_vars, tx, state, batch, anchors,
     class_valid, pred_to_label, cfg) = _setup()
    estep = jax.jit(make_eval_loss_step(student, teachers, cfg, anchors,
                                        class_valid, pred_to_label))
    metrics = estep(state, teacher_vars, batch)
    assert np.isfinite(float(metrics['Total_loss']))


def test_train_step_sharded_over_mesh():
    """The same step compiled over an 8-device data mesh (SPMD DP)."""
    (student, teachers, teacher_vars, tx, state, batch, anchors,
     class_valid, pred_to_label, cfg) = _setup(batch=8)
    mesh = create_mesh()
    assert mesh.devices.size == 8
    sharded_batch = shard_batch(mesh, batch)
    state = replicate(mesh, state)
    teacher_vars = replicate(mesh, teacher_vars)
    step = jax.jit(make_train_step(student, teachers, tx, cfg, anchors,
                                   class_valid, pred_to_label))
    new_state, metrics = step(state, teacher_vars, sharded_batch,
                              jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics['Total_loss']))
    # the updated params stay replicated (no per-device divergence)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)


def test_sharded_step_equals_single_device_step():
    """The DP contract itself (reference DDP all-reduce semantics,
    train_methods.py:953-961): the SAME batch through the sync-BN step
    produces the SAME loss and updated params whether it runs on one
    device or sharded over the 8-device mesh. 'Finite and replicated' is
    not enough — a silent sharding bug (wrong axis, missed reduction)
    passes that but fails this.

    SGD, not Adam: params-after-SGD = params - lr * mean(grads) exposes
    exactly the gradient-averaging contract with fp-rounding-bounded
    tolerance. (Adam's step-1 update is ~lr * sign(g); a near-zero
    gradient element whose reduction order differs between shardings can
    flip sign and legitimately differ by 2*lr.)"""
    (student, teachers, teacher_vars, _, _, batch, anchors,
     class_valid, pred_to_label, cfg) = _setup(batch=8)
    config = default_config(lr='1e-2', optimizer='SGD', momentum='0')
    tx = build_optimizer(config)
    state = fast_train_state(student, 9, batch['audio'], tx)
    step = jax.jit(make_train_step(student, teachers, tx, cfg, anchors,
                                   class_valid, pred_to_label))

    # single device: everything on device 0
    dev0 = jax.devices()[0]
    put0 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jax.device_put(x, dev0), t)
    state_1, metrics_1 = step(put0(state), put0(teacher_vars), put0(batch),
                              jax.random.PRNGKey(3))

    # sharded over the 8-device data mesh
    mesh = create_mesh()
    state_8, metrics_8 = step(replicate(mesh, state),
                              replicate(mesh, teacher_vars),
                              shard_batch(mesh, batch),
                              jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(metrics_1['Total_loss']),
                               float(metrics_8['Total_loss']),
                               rtol=1e-5, atol=1e-6)
    flat_1 = jax.tree_util.tree_leaves(state_1.params)
    flat_8 = jax.tree_util.tree_leaves(state_8.params)
    for a, b in zip(flat_1, flat_8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # batch stats too (sync-BN: global-batch statistics either way)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.batch_stats),
                    jax.tree_util.tree_leaves(state_8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('kd', ['None', 'AttentionLoss'])
def test_kd_loss_dispatch(kd):
    (student, teachers, teacher_vars, tx, state, batch, anchors,
     class_valid, pred_to_label, cfg) = _setup()
    cfg = cfg._replace(kd_loss=kd)
    step = jax.jit(make_train_step(student, teachers, tx, cfg, anchors,
                                   class_valid, pred_to_label))
    _, metrics = step(state, teacher_vars, batch, jax.random.PRNGKey(3))
    kd_val = float(metrics['KD'])
    assert np.isfinite(kd_val)
    if kd == 'None':
        assert kd_val == 0.0
    else:
        assert kd_val >= 0.0  # AT loss is an MSE


@pytest.mark.parametrize('div', ['None', 'DistillKL'])
def test_div_loss_dispatch(div):
    """div_loss=DistillKL must produce a LIVE KLDiv term (the reference
    builds the criterion at utils.py:1587-1590 but drops its value at
    traditional.py:177 — here the config key is honored end-to-end)."""
    (student, teachers, teacher_vars, tx, state, batch, anchors,
     class_valid, pred_to_label, cfg) = _setup()
    cfg = cfg._replace(div_loss=div, w_div=0.5)
    step = jax.jit(make_train_step(student, teachers, tx, cfg, anchors,
                                   class_valid, pred_to_label))
    _, metrics = step(state, teacher_vars, batch, jax.random.PRNGKey(3))
    kldiv = float(metrics['KLDiv'])
    assert np.isfinite(kldiv)
    if div == 'None':
        assert kldiv == 0.0
    else:
        assert kldiv > 0.0  # KL between distinct random-init nets
        # and it must reach the total (w_div-weighted)
        total = float(metrics['Total_loss'])
        assert np.isfinite(total)


def test_div_loss_unknown_rejected():
    (student, teachers, teacher_vars, tx, state, batch, anchors,
     class_valid, pred_to_label, cfg) = _setup()
    cfg = cfg._replace(div_loss='Bogus')
    with pytest.raises(ValueError, match='Unsupported DIV Loss'):
        step = jax.jit(make_train_step(student, teachers, tx, cfg, anchors,
                                       class_valid, pred_to_label))
        step(state, teacher_vars, batch, jax.random.PRNGKey(3))


def test_synthetic_yield_batch_mixing():
    from mm_distillnet_tpu.config import default_config
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    config = default_config(image_size=128, synthetic_size=4)
    ds = SyntheticMultimodal(config, 'train')
    labels, audio = ds.yield_batch(2, [ds.ids[0], ds.ids[1]])
    # compact audio ingest default (round 5): mixed stacks ship (80, S, M)
    assert audio.shape == (2, 80, 128, 8)
    assert labels[0].shape[1] == 5 and len(labels[0]) >= 2
    full = SyntheticMultimodal(
        default_config(image_size=128, synthetic_size=4,
                       device_audio_resize='False'), 'train')
    _, full_audio = full.yield_batch(2, [full.ids[0], full.ids[1]])
    assert full_audio.shape == (2, 128, 128, 8)


def test_per_replica_bn_train_step():
    """shard_map variant: reference DataParallel BN semantics (per-replica
    stats, replica-0 persistence) with explicit gradient pmean."""
    from mm_distillnet_tpu.distill.train_step import \
        make_train_step_per_replica_bn
    from mm_distillnet_tpu.parallel.mesh import create_mesh
    (student, teachers, teacher_vars, tx, state, batch, anchors,
     class_valid, pred_to_label, cfg) = _setup(batch=8)
    mesh = create_mesh()
    # make shard data distinct so per-replica stats differ from global
    batch = dict(batch)
    batch['audio'] = batch['audio'] + jnp.arange(8).reshape(8, 1, 1, 1) * 0.5

    step_pr = jax.jit(make_train_step_per_replica_bn(
        student, teachers, tx, cfg, anchors, class_valid, pred_to_label,
        mesh))
    new_state, metrics = step_pr(state, teacher_vars, batch,
                                 jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics['Total_loss']))
    assert int(new_state.step) == 1

    # sync-BN (global) variant on the same batch produces different
    # running stats than replica-0-only stats
    step_sync = jax.jit(make_train_step(student, teachers, tx, cfg, anchors,
                                        class_valid, pred_to_label))
    sync_state, _ = step_sync(state, teacher_vars, batch,
                              jax.random.PRNGKey(3))
    pr_means = jax.tree_util.tree_leaves(new_state.batch_stats)
    sync_means = jax.tree_util.tree_leaves(sync_state.batch_stats)
    assert any(not np.allclose(a, b, atol=1e-6)
               for a, b in zip(pr_means, sync_means))

    # Semantics, not just divergence: the stats that persist must be
    # EXACTLY replica 0's — torch DataParallel aliases the device-0
    # replica's BN buffers to the original module. Hand-compute them by
    # forwarding shard 0's sub-batch (batch 8 over 8 devices -> element 0)
    # with the same params and the same per-shard dropout fold
    # (train_step.py per_shard: fold_in(fold_in(rng, step), axis_index=0)).
    rng = jax.random.PRNGKey(3)
    dropout_rng = jax.random.fold_in(jax.random.fold_in(rng, 0), 0)
    _, mutated = student.apply(
        {'params': state.params, 'batch_stats': state.batch_stats},
        batch['audio'][:1], train=True, mutable=['batch_stats'],
        rngs={'dropout': dropout_rng})
    expected = jax.tree_util.tree_leaves(mutated['batch_stats'])
    for got, want in zip(pr_means, expected):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_focal_from_logits_hook_routes_to_logits_path(monkeypatch):
    """scripts/ab_focal_step.py flips TS.FOCAL_FROM_LOGITS to A/B the
    logit-space focal variant; the hook must actually switch the call
    (the old TS.focal_loss monkeypatch silently became a no-op when the
    probability path became the default call — commit 81eaa6b)."""
    import mm_distillnet_tpu.distill.train_step as TS

    calls = []

    def spy(classification, regression, annotations, anchors, logits=None):
        calls.append(logits is not None)
        return jnp.zeros(()), jnp.zeros(())

    monkeypatch.setattr(TS, 'focal_loss', spy)

    class Out:
        classification = jnp.zeros((1, 4, 2))
        regression = jnp.zeros((1, 4, 4))
        logits = jnp.zeros((1, 4, 2))

    ann = jnp.zeros((1, 3, 5))
    anchors = jnp.zeros((4, 4))
    monkeypatch.setattr(TS, 'FOCAL_FROM_LOGITS', False)
    TS._student_focal(Out(), ann, anchors)
    monkeypatch.setattr(TS, 'FOCAL_FROM_LOGITS', True)
    TS._student_focal(Out(), ann, anchors)
    assert calls == [False, True]

    # and an output without logits falls back to the probability path
    class OutNoLogits(Out):
        logits = None

    TS._student_focal(OutNoLogits(), ann, anchors)
    assert calls == [False, True, False]
