"""Loss parity tests: MTA vs a torch-functional oracle, focal-loss semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mm_distillnet_tpu.losses.focal import focal_loss
from mm_distillnet_tpu.losses.mta import attention_map, mta_loss
from mm_distillnet_tpu.ops.anchors import anchor_table


def _torch_at(f_nchw, p=2.0):
    return F.normalize(f_nchw.pow(p).mean(1).view(f_nchw.size(0), -1))


def _torch_mta_single(fs, ft_list, T=9.0):
    """Oracle built from torch library primitives, following the published
    MTA formula (softmax passed as the first kl_div arg, per the paper code's
    trained behavior)."""
    at_s = _torch_at(fs)
    if len(ft_list) == 1:
        at_t = _torch_at(ft_list[0])
    else:
        prod = _torch_at(ft_list[0])
        for t in ft_list[1:]:
            prod = prod * _torch_at(t)
        at_t = F.normalize(prod, dim=1, p=1)
    return F.kl_div(F.softmax(at_s / T, dim=1), F.softmax(at_t / T, dim=1),
                    reduction='batchmean')


def test_attention_map_matches_torch():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    ours = np.asarray(attention_map(jnp.asarray(f)))
    theirs = _torch_at(torch.from_numpy(f).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_mta_single_teacher_matches_torch():
    rng = np.random.default_rng(1)
    g_s = [rng.normal(size=(2, s, s, 8)).astype(np.float32) for s in (8, 4)]
    g_t = [rng.normal(size=(2, s, s, 8)).astype(np.float32) for s in (8, 4)]
    ours = np.asarray(mta_loss([jnp.asarray(f) for f in g_s],
                               [jnp.asarray(f) for f in g_t]))
    for lvl in range(2):
        oracle = _torch_mta_single(
            torch.from_numpy(g_s[lvl]).permute(0, 3, 1, 2),
            [torch.from_numpy(g_t[lvl]).permute(0, 3, 1, 2)]).item()
        np.testing.assert_allclose(ours[lvl], oracle, rtol=1e-4, atol=1e-6)


def test_mta_multi_teacher_product_matches_torch():
    rng = np.random.default_rng(2)
    g_s = [rng.normal(size=(2, 8, 8, 8)).astype(np.float32)]
    t1 = [rng.normal(size=(2, 8, 8, 8)).astype(np.float32)]
    t2 = [rng.normal(size=(2, 8, 8, 8)).astype(np.float32)]
    ours = np.asarray(mta_loss([jnp.asarray(g_s[0])],
                               [[jnp.asarray(t1[0])], [jnp.asarray(t2[0])]]))
    oracle = _torch_mta_single(
        torch.from_numpy(g_s[0]).permute(0, 3, 1, 2),
        [torch.from_numpy(t1[0]).permute(0, 3, 1, 2),
         torch.from_numpy(t2[0]).permute(0, 3, 1, 2)]).item()
    np.testing.assert_allclose(ours[0], oracle, rtol=1e-4, atol=1e-6)


def test_mta_parity_mode_gradient_is_live():
    """The parity-mode quirk kl_div(softmax, softmax) logs a near-constant
    value (it is dominated by the teacher-attention entropy, which has no
    student dependence — observed bit-identical to 4 decimals across 1000
    epochs in the shipped-recipe proof logs), but its STUDENT gradient is
    alive and aligned with the teacher: d(loss)/d(input) = -target/B, so
    grad wrt the student features pushes student attention toward teacher
    attention. Reference behavior: F.kl_div(input=softmax, ...) is linear
    in `input` (src/loss/MTALoss.py:36-77)."""
    rng = np.random.default_rng(7)
    f_s = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    f_t = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))

    def loss_of_student(f):
        return jnp.sum(mta_loss([f], [f_t]))

    g = jax.grad(loss_of_student)(f_s)
    assert float(jnp.max(jnp.abs(g))) > 0, 'MTA gradient vanished'
    # the directional derivative along -grad is negative (descent): the
    # student-dependent term is ~1e-6 of the loss magnitude, far below
    # what a float32 finite-difference of the full loss can resolve, so
    # probe it exactly with a jvp instead of an eval-subtract.
    _, df = jax.jvp(loss_of_student, (f_s,), (-g,))
    assert float(df) < 0


def _manual_neg_only_cls(cls):
    cls = np.clip(cls, 1e-4, 1 - 1e-4)
    return float(np.sum(0.75 * cls ** 2 * -np.log(1 - cls)))


def test_focal_loss_all_empty_batch_returns_zero():
    anchors = jnp.asarray(anchor_table(128))
    n = anchors.shape[0]
    rng = np.random.default_rng(3)
    cls = jnp.asarray(rng.uniform(0.0, 1.0, size=(2, n, 3)).astype(np.float32))
    reg = jnp.zeros((2, n, 4), jnp.float32)
    ann = -jnp.ones((2, 8, 5), jnp.float32)
    reg_l, cls_l = focal_loss(cls, reg, ann, anchors)
    assert float(reg_l) == 0.0 and float(cls_l) == 0.0


def test_focal_loss_mixed_empty_uses_negatives_only():
    anchors = jnp.asarray(anchor_table(128))
    n = anchors.shape[0]
    rng = np.random.default_rng(4)
    cls_np = rng.uniform(0.05, 0.95, size=(2, n, 3)).astype(np.float32)
    reg = jnp.zeros((2, n, 4), jnp.float32)
    ann = -np.ones((2, 8, 5), np.float32)
    # image 0 has one annotation (a box matching an anchor well), image 1 none
    ann[0, 0] = [10, 10, 42, 42, 1]
    reg_l, cls_l = focal_loss(jnp.asarray(cls_np), reg, jnp.asarray(ann),
                              anchors)
    # manually compute image 1's negatives-only loss and bound check
    neg1 = _manual_neg_only_cls(cls_np[1])
    assert float(cls_l) > 0.0
    # cls_l = (cls_0 + neg1)/2 -> removing neg1/2 must leave a positive value
    assert float(cls_l) * 2 > neg1 * 0.999


def _np_focal_oracle(cls_b, reg_b, ann_b, anchors):
    """Numpy oracle following the reference algorithm structure (per-image
    loop + boolean masks, src/loss/YetAnotherFocalLoss.py:55-190) —
    independent of the vectorized jax path."""
    B = cls_b.shape[0]
    aw = anchors[:, 3] - anchors[:, 1]
    ah = anchors[:, 2] - anchors[:, 0]
    acx = anchors[:, 1] + 0.5 * aw
    acy = anchors[:, 0] + 0.5 * ah
    cls_losses, reg_losses = [], []
    any_gt = False
    for j in range(B):
        cls = np.clip(cls_b[j], 1e-4, 1 - 1e-4)
        ann = ann_b[j]
        ann = ann[ann[:, 4] != -1]
        if ann.shape[0] == 0:
            cls_losses.append(np.sum(0.75 * cls ** 2 * -np.log(1 - cls)))
            reg_losses.append(0.0)
            continue
        any_gt = True
        # IoU anchors(y1x1y2x2) vs gt(x1y1x2y2)
        iw = np.clip(np.minimum(anchors[:, 3, None], ann[None, :, 2]) -
                     np.maximum(anchors[:, 1, None], ann[None, :, 0]), 0, None)
        ih = np.clip(np.minimum(anchors[:, 2, None], ann[None, :, 3]) -
                     np.maximum(anchors[:, 0, None], ann[None, :, 1]), 0, None)
        area_a = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
        area_b = (ann[:, 2] - ann[:, 0]) * (ann[:, 3] - ann[:, 1])
        union = np.clip(area_a[:, None] + area_b[None] - iw * ih, 1e-8, None)
        iou = iw * ih / union
        iou_max, iou_arg = iou.max(1), iou.argmax(1)
        assigned = ann[iou_arg]
        targets = -np.ones_like(cls)
        targets[iou_max < 0.4] = 0
        pos = iou_max >= 0.5
        npos = pos.sum()
        targets[pos] = 0
        targets[pos, assigned[pos, 4].astype(int)] = 1
        af = np.where(targets == 1, 0.25, 0.75)
        fw = np.where(targets == 1, 1 - cls, cls)
        bce = -(targets * np.log(cls) + (1 - targets) * np.log(1 - cls))
        cl = np.where(targets != -1, af * fw ** 2 * bce, 0).sum()
        cls_losses.append(cl / max(npos, 1.0))
        if npos > 0:
            asg = assigned[pos]
            gw = np.clip(asg[:, 2] - asg[:, 0], 1, None)
            gh = np.clip(asg[:, 3] - asg[:, 1], 1, None)
            gcx = asg[:, 0] + 0.5 * (asg[:, 2] - asg[:, 0])
            gcy = asg[:, 1] + 0.5 * (asg[:, 3] - asg[:, 1])
            t = np.stack([(gcy - acy[pos]) / ah[pos],
                          (gcx - acx[pos]) / aw[pos],
                          np.log(gh / ah[pos]), np.log(gw / aw[pos])], 1)
            d = np.abs(t - reg_b[j][pos])
            rl = np.where(d <= 1 / 9, 0.5 * 9 * d ** 2, d - 0.5 / 9)
            reg_losses.append(rl.mean())
        else:
            reg_losses.append(0.0)
    if not any_gt:
        return 0.0, 0.0
    return float(np.mean(reg_losses)), float(np.mean(cls_losses))


def test_focal_loss_matches_numpy_oracle():
    anchors_np = anchor_table(128)
    n = anchors_np.shape[0]
    rng = np.random.default_rng(7)
    cls = rng.uniform(0.01, 0.99, size=(3, n, 5)).astype(np.float32)
    reg = rng.normal(scale=0.2, size=(3, n, 4)).astype(np.float32)
    ann = -np.ones((3, 6, 5), np.float32)
    ann[0, 0] = [10, 10, 60, 70, 2]
    ann[0, 1] = [40, 50, 100, 120, 4]
    ann[2, 0] = [5, 5, 20, 20, 0]       # small box, w/h clamp region
    want_reg, want_cls = _np_focal_oracle(cls, reg, ann, anchors_np)
    got_reg, got_cls = focal_loss(jnp.asarray(cls), jnp.asarray(reg),
                                  jnp.asarray(ann), jnp.asarray(anchors_np))
    np.testing.assert_allclose(float(got_reg), want_reg, rtol=2e-4)
    np.testing.assert_allclose(float(got_cls), want_cls, rtol=2e-4)


def test_focal_loss_logit_path_matches_probability_path():
    """The logit-space focal loss (softplus identities, losses/focal.py
    _cls_terms) must match the probability-space path — including beyond
    the clamp band, where both saturate to the same clamped values."""
    anchors_np = anchor_table(128)
    n = anchors_np.shape[0]
    rng = np.random.default_rng(11)
    # logits spanning well past the clamp band (|x| > 9.21)
    logits = rng.normal(scale=6.0, size=(3, n, 5)).astype(np.float32)
    probs = 1.0 / (1.0 + np.exp(-logits))
    reg = rng.normal(scale=0.2, size=(3, n, 4)).astype(np.float32)
    ann = -np.ones((3, 6, 5), np.float32)
    ann[0, 0] = [10, 10, 60, 70, 2]
    ann[1, 0] = [40, 50, 100, 120, 4]   # image 2 empty: negatives-only path
    anchors = jnp.asarray(anchors_np)
    want_reg, want_cls = focal_loss(jnp.asarray(probs), jnp.asarray(reg),
                                    jnp.asarray(ann), anchors)
    got_reg, got_cls = focal_loss(jnp.zeros_like(jnp.asarray(probs)),
                                  jnp.asarray(reg), jnp.asarray(ann),
                                  anchors, logits=jnp.asarray(logits))
    np.testing.assert_allclose(float(got_reg), float(want_reg), rtol=1e-5)
    np.testing.assert_allclose(float(got_cls), float(want_cls), rtol=1e-4)


def test_focal_loss_logit_path_matches_numpy_oracle():
    anchors_np = anchor_table(128)
    n = anchors_np.shape[0]
    rng = np.random.default_rng(13)
    logits = rng.normal(scale=3.0, size=(2, n, 4)).astype(np.float32)
    probs = 1.0 / (1.0 + np.exp(-logits))
    reg = rng.normal(scale=0.2, size=(2, n, 4)).astype(np.float32)
    ann = -np.ones((2, 6, 5), np.float32)
    ann[0, 0] = [10, 10, 60, 70, 2]
    want_reg, want_cls = _np_focal_oracle(probs, reg, ann, anchors_np)
    got_reg, got_cls = focal_loss(jnp.asarray(probs), jnp.asarray(reg),
                                  jnp.asarray(ann), jnp.asarray(anchors_np),
                                  logits=jnp.asarray(logits))
    np.testing.assert_allclose(float(got_reg), want_reg, rtol=2e-4)
    np.testing.assert_allclose(float(got_cls), want_cls, rtol=2e-4)


def test_focal_loss_legacy_variant():
    from mm_distillnet_tpu.losses.focal_legacy import focal_loss_legacy
    anchors = anchor_table(128)
    anchors_xyxy = anchors[:, [1, 0, 3, 2]]
    n = anchors.shape[0]
    rng = np.random.default_rng(5)
    cls = jnp.asarray(rng.uniform(0.05, 0.95, (1, n, 3)).astype(np.float32))
    reg = jnp.zeros((1, n, 4), jnp.float32)
    ann = -np.ones((1, 4, 5), np.float32)
    ann[0, 0] = [10, 10, 60, 70, 1]
    loss, reg_l, cls_l = focal_loss_legacy(cls, reg, jnp.asarray(ann),
                                           jnp.asarray(anchors_xyxy))
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(reg_l) + float(cls_l),
                               rtol=1e-6)
