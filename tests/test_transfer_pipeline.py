"""Host->device input transfer pipeline: dtype casting + lookahead.

Round-4 finding (BENCH_NOTES): the public train.py CLI is infeed-bound on
hosts with a slow host->device link — at 768px/batch 8 each step ships
283 MB of float32 inputs that the bf16 model immediately casts down. The
trainer therefore (a) casts image/audio modalities to the compute dtype on
the host before the copy (transfer_dtype config key; reference parity path
= float32) and (b) dispatches the next batch's async copy before consuming
the current one (_device_lookahead).
"""
import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from mm_distillnet_tpu.config import default_config
from mm_distillnet_tpu.parallel.mesh import create_mesh
from mm_distillnet_tpu.train.trainer import (_device_batch,
                                             _device_lookahead,
                                             transfer_dtype_from)


def test_transfer_dtype_follows_compute_dtype():
    assert transfer_dtype_from(default_config(compute_dtype='bfloat16')) \
        == np.dtype(ml_dtypes.bfloat16)
    assert transfer_dtype_from(default_config(compute_dtype='float32')) \
        is None


def test_transfer_dtype_override_wins():
    cfg = default_config(compute_dtype='bfloat16',
                         transfer_dtype='float32')
    assert transfer_dtype_from(cfg) is None
    cfg = default_config(compute_dtype='float32',
                         transfer_dtype='bfloat16')
    assert transfer_dtype_from(cfg) == np.dtype(ml_dtypes.bfloat16)


def test_device_batch_casts_modalities_not_labels():
    mesh = create_mesh()
    n_dev = mesh.devices.size
    batch = {
        'rgb': np.random.rand(n_dev, 8, 8, 3).astype(np.float32),
        'audio': np.random.rand(n_dev, 8, 8, 8).astype(np.float32),
        'label': np.zeros((n_dev, 4, 5), np.float32),
        'id': ['x'] * n_dev,
    }
    dev, orig = _device_batch(batch, mesh, n_dev,
                              np.dtype(ml_dtypes.bfloat16))
    assert orig == n_dev
    assert dev['rgb'].dtype == jnp.bfloat16
    assert dev['audio'].dtype == jnp.bfloat16
    assert dev['label'].dtype == jnp.float32  # losses keep full precision
    # values survive the cast to bf16 resolution
    np.testing.assert_allclose(np.asarray(dev['rgb'], np.float32),
                               batch['rgb'], atol=0.01, rtol=0.01)


def test_device_batch_no_cast_when_none():
    mesh = create_mesh()
    n_dev = mesh.devices.size
    batch = {'audio': np.ones((n_dev, 4, 4, 8), np.float32)}
    dev, _ = _device_batch(batch, mesh, n_dev, None)
    assert dev['audio'].dtype == jnp.float32


def test_device_lookahead_preserves_order_and_count():
    mesh = create_mesh()
    n_dev = mesh.devices.size

    def gen():
        for it in range(5):
            yield it, {'audio': np.full((n_dev, 2, 2, 1), it, np.float32)}

    seen = list(_device_lookahead(gen(), mesh, n_dev, None))
    assert [it for it, _, _ in seen] == list(range(5))
    for it, host, (dev, orig) in seen:
        assert float(np.asarray(dev['audio']).ravel()[0]) == float(it)
        assert orig == n_dev


def test_device_lookahead_empty():
    mesh = create_mesh()
    assert list(_device_lookahead(iter(()), mesh, mesh.devices.size,
                                  None)) == []


def test_set_learning_rate_preserves_sharding_no_recompile():
    """The scheduler's between-epoch lr write must not change the compiled
    step's input-sharding signature: replacing the mesh-replicated
    hyperparam leaf with an uncommitted array recompiled the whole fused
    train step on the first scheduler step of every run (a 184 s second
    compile at D2@768, BENCH_NOTES round 4)."""
    from mm_distillnet_tpu.parallel.mesh import replicate
    from mm_distillnet_tpu.train.optim import (build_optimizer,
                                               set_learning_rate)
    cfg = default_config()
    tx = build_optimizer(cfg)
    params = {'w': jnp.ones((4,), jnp.float32)}
    opt_state = replicate(create_mesh(), tx.init(params))
    old_sharding = opt_state.hyperparams['learning_rate'].sharding

    traces = []

    @jax.jit
    def step(o):
        traces.append(1)  # runs only when (re)traced
        return o.hyperparams['learning_rate'] * 2

    step(opt_state)
    opt_state = set_learning_rate(opt_state, 5e-5)
    assert opt_state.hyperparams['learning_rate'].sharding == old_sharding
    out = step(opt_state)
    assert len(traces) == 1, 'lr update retriggered compilation'
    np.testing.assert_allclose(float(out), 1e-4, rtol=1e-6)
