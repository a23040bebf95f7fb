"""FusedBackbone wiring: plan selection/overrides + numerical parity.

The per-block kernel choice (XLA / whole-block pallas) is a pure dispatch
layer over identical math; these tests run the pallas kernel in interpret
mode and compare against the plain flax backbone. (The row-tiled early-block
kernel and the candidate-pack kernel were retired in round 3 after losing
their A/Bs to XLA — BENCH_NOTES.md; the whole-block MBConv kernel remains
as the numerically-tested kernel-engineering example.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_distillnet_tpu.models.efficientnet import EfficientNetFeatures
from mm_distillnet_tpu.models.fused_forward import FusedBackbone, _parse_plan
from mm_distillnet_tpu.ops import pallas_mbconv


def test_parse_plan():
    assert _parse_plan('', 23) == {}
    spec = _parse_plan('pallas:5,flax:6-7', 23)
    assert spec == {5: 'pallas', 6: 'flax', 7: 'flax'}
    assert _parse_plan('pallas:20-40', 23) == {i: 'pallas'
                                               for i in (20, 21, 22)}
    with pytest.raises(ValueError):
        _parse_plan('mystery:0-1', 23)
    with pytest.raises(ValueError):
        _parse_plan('tiled:0-1', 23)  # retired kind must fail loudly


@pytest.fixture
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def forced(*args, **kwargs):
        kwargs['interpret'] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_mbconv.pl, 'pallas_call', forced)


def test_fused_backbone_default_plan_is_all_xla():
    """With no plan_spec the plan must be all-flax (XLA) — the measured
    winner on every block (BENCH_NOTES.md round-2 per-block A/B); the
    pallas kernel is opt-in only."""
    size = 64
    bb = EfficientNetFeatures(compound_coef=0, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, size, size, 3))
    variables = bb.init(jax.random.PRNGKey(1), x)
    wrapped = {'params': {'backbone_net': variables['params']},
               'batch_stats': {'backbone_net': variables['batch_stats']}}
    fused = FusedBackbone(wrapped, compound_coef=0, image_size=size,
                          dtype=jnp.float32)
    assert all(k == 'flax' for k, _ in fused.plan)


def test_fused_backbone_mixed_plan_matches_flax(_interpret):
    size = 64
    bb = EfficientNetFeatures(compound_coef=0, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, size, size, 3))
    variables = bb.init(jax.random.PRNGKey(1), x)
    want = bb.apply(variables, x, train=False)

    wrapped = {'params': {'backbone_net': variables['params']},
               'batch_stats': {'backbone_net': variables['batch_stats']}}
    fused = FusedBackbone(wrapped, compound_coef=0, image_size=size,
                          dtype=jnp.float32,
                          plan_spec='pallas:1-2,flax:0,flax:3-15')
    kinds = [k for k, _ in fused.plan]
    assert kinds[1] == 'pallas' and kinds[2] == 'pallas'
    got = fused(x)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.shape == w.shape
        a = np.asarray(g, np.float32).ravel()
        b = np.asarray(w, np.float32).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.995, corr
