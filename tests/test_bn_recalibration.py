"""BN running-stat recalibration recovers the true activation statistics."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mm_distillnet_tpu.models.layers import BN_EPS, BN_MOMENTUM
from mm_distillnet_tpu.train.bn_recalibration import recalibrate_batch_stats


class _BNModel(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train,
                            momentum=BN_MOMENTUM, epsilon=BN_EPS)(x)


def test_recalibration_recovers_population_stats():
    model = _BNModel()
    x0 = jnp.zeros((8, 4))
    variables = model.init(jax.random.PRNGKey(0), x0)
    # running stats start at init (mean 0, var 1), far from the data stats
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.normal(3.0, 2.0, size=(64, 4))
                           .astype(np.float32)) for _ in range(8)]

    def apply_fn(variables, x, rng):
        _, mutated = model.apply(variables, x, train=True,
                                 mutable=['batch_stats'])
        return mutated['batch_stats']

    out = recalibrate_batch_stats(model, variables, batches,
                                  apply_fn=apply_fn)
    mean = np.asarray(out['batch_stats']['BatchNorm_0']['mean'])
    var = np.asarray(out['batch_stats']['BatchNorm_0']['var'])
    # tolerance set by sampling noise (8 batches x 64 samples per channel),
    # not by the recovery math; init values were mean 0 / var 1
    np.testing.assert_allclose(mean, 3.0, atol=0.4)
    np.testing.assert_allclose(var, 4.0, atol=1.0)

    # eval-mode forward now normalizes to ~zero-mean unit-variance, like
    # train mode does (before recalibration it would keep mean ~3, std ~2)
    y_eval = model.apply(out, batches[0], train=False)
    assert abs(float(y_eval.mean())) < 0.2
    assert abs(float(y_eval.std()) - 1.0) < 0.2


def test_recalibration_noop_without_stats():
    variables = {'params': {}}
    out = recalibrate_batch_stats(None, variables, [])
    assert out is variables
