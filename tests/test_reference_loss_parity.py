"""Loss parity against the reference's actual loss classes.

Imports YetAnotherFocalLoss and MTALoss from /root/reference and compares
them with our vectorized implementations on identical inputs.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = '/root/reference'

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference checkout unavailable')


@pytest.fixture(scope='module')
def reference_losses():
    from tests.test_reference_parity import _install_torchvision_shim
    _install_torchvision_shim()
    sys.path.insert(0, REFERENCE)
    from src.loss.MTALoss import MTALoss
    from src.loss.YetAnotherFocalLoss import YetAnotherFocalLoss
    return YetAnotherFocalLoss(), MTALoss(T=9, p=2)


def test_focal_loss_matches_reference(reference_losses):
    import jax.numpy as jnp
    import torch

    from mm_distillnet_tpu.losses.focal import focal_loss
    from mm_distillnet_tpu.ops.anchors import anchor_table

    ref_focal, _ = reference_losses
    anchors = anchor_table(128)
    n, c = anchors.shape[0], 5
    rng = np.random.default_rng(11)
    cls = rng.uniform(0.01, 0.99, (3, n, c)).astype(np.float32)
    reg = rng.normal(scale=0.2, size=(3, n, 4)).astype(np.float32)
    # ragged annotations incl. one empty image (negatives-only branch)
    ann_list = [np.array([[10, 10, 60, 70, 2], [40, 50, 100, 120, 4]],
                         np.float32),
                np.zeros((0, 5), np.float32),
                np.array([[5, 5, 20, 20, 0]], np.float32)]

    with torch.no_grad():
        ref_reg, ref_cls = ref_focal(
            [torch.from_numpy(cls), torch.from_numpy(reg),
             torch.from_numpy(anchors[None])], ann_list)

    padded = -np.ones((3, 4, 5), np.float32)
    for i, a in enumerate(ann_list):
        padded[i, :len(a)] = a
    got_reg, got_cls = focal_loss(jnp.asarray(cls), jnp.asarray(reg),
                                  jnp.asarray(padded), jnp.asarray(anchors))
    np.testing.assert_allclose(float(got_reg), float(ref_reg), rtol=5e-4)
    np.testing.assert_allclose(float(got_cls), float(ref_cls), rtol=5e-4)


def test_mta_loss_matches_reference(reference_losses):
    import jax.numpy as jnp
    import torch

    from mm_distillnet_tpu.losses.mta import mta_loss

    _, ref_mta = reference_losses
    rng = np.random.default_rng(12)
    g_s = [rng.normal(size=(2, s, s, 16)).astype(np.float32)
           for s in (16, 8, 4)]
    g_t = [rng.normal(size=(2, s, s, 16)).astype(np.float32)
           for s in (16, 8, 4)]

    with torch.no_grad():
        ref = ref_mta([torch.from_numpy(f).permute(0, 3, 1, 2) for f in g_s],
                      [torch.from_numpy(f).permute(0, 3, 1, 2) for f in g_t])
    ours = mta_loss([jnp.asarray(f) for f in g_s],
                    [jnp.asarray(f) for f in g_t], T=9.0, p=2.0,
                    parity_mode=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-7)


def test_mta_kdlist_matches_reference(reference_losses):
    """Multi-teacher attention-product mode (list-of-teachers input)."""
    import jax.numpy as jnp
    import torch

    from mm_distillnet_tpu.losses.mta import mta_loss

    _, ref_mta = reference_losses
    rng = np.random.default_rng(13)
    g_s = [rng.normal(size=(2, 8, 8, 16)).astype(np.float32)]
    t1 = [rng.normal(size=(2, 8, 8, 16)).astype(np.float32)]
    t2 = [rng.normal(size=(2, 8, 8, 16)).astype(np.float32)]

    def tt(fs):
        return [torch.from_numpy(f).permute(0, 3, 1, 2) for f in fs]

    with torch.no_grad():
        ref = ref_mta(tt(g_s), [tt(t1), tt(t2)])
    ours = mta_loss([jnp.asarray(g_s[0])],
                    [[jnp.asarray(t1[0])], [jnp.asarray(t2[0])]])
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-7)
