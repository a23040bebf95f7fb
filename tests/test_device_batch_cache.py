"""Epoch-invariant device-batch reuse (trainer._device_batch cache).

Full-batch runs re-ship bit-identical modality tensors every epoch; on the
axon relay each re-transfer pays bandwidth AND leaks client-side buffer
mirrors (measured ~170 MB RSS/epoch at D2 @768, BENCH_NOTES round 5). The
cache must reuse the SAME device array when host bytes are unchanged, and
re-transfer exactly the keys that changed.
"""
import jax.numpy as jnp
import numpy as np

from mm_distillnet_tpu.parallel.mesh import create_mesh
from mm_distillnet_tpu.train.trainer import _device_batch, _device_lookahead


def _batch(seed, audio_seed=0):
    r = np.random.RandomState(seed)
    ra = np.random.RandomState(1000 + audio_seed)
    return {
        'rgb': r.rand(4, 16, 16, 3).astype(np.float32),
        'audio': ra.rand(4, 8, 8, 8).astype(np.float32),
        'label': np.full((4, 5, 5), -1, np.float32),
        'id': ['a', 'b', 'c', 'd'],
    }


def test_unchanged_keys_reuse_device_arrays():
    mesh = create_mesh()
    n = mesh.devices.size
    cache = {}
    d1, o1 = _device_batch(_batch(0), mesh, n, jnp.bfloat16, cache)
    d2, o2 = _device_batch(_batch(0, audio_seed=1), mesh, n, jnp.bfloat16,
                           cache)
    assert o1 == o2 == 4
    # rgb/label unchanged -> identical device objects (no new transfer)
    assert d2['rgb'] is d1['rgb']
    assert d2['label'] is d1['label']
    # audio changed -> new device array with the new bytes
    assert d2['audio'] is not d1['audio']
    np.testing.assert_array_equal(
        np.asarray(d2['audio'], dtype=np.float32)[:4],
        _batch(0, audio_seed=1)['audio'].astype(jnp.bfloat16).astype(
            np.float32))


def test_values_match_uncached_path():
    mesh = create_mesh()
    n = mesh.devices.size
    cache = {}
    b = _batch(3)
    _device_batch(b, mesh, n, jnp.bfloat16, cache)      # warm the cache
    cached, _ = _device_batch(b, mesh, n, jnp.bfloat16, cache)
    plain, _ = _device_batch(b, mesh, n, jnp.bfloat16, None)
    for k in plain:
        np.testing.assert_array_equal(np.asarray(cached[k]),
                                      np.asarray(plain[k]))


def test_lookahead_cache_spans_epochs():
    mesh = create_mesh()
    n = mesh.devices.size
    cache = {}
    seen = []
    for epoch in range(2):
        gen = ((it, _batch(0)) for it in range(1))
        for _it, _host, (dev, _o) in _device_lookahead(
                gen, mesh, n, jnp.bfloat16, cache):
            seen.append(dev['rgb'])
    assert seen[1] is seen[0]


def test_permuted_batch_reuses_device_rows():
    mesh = create_mesh()
    n = mesh.devices.size
    cache = {}
    b = _batch(7)
    d1, _ = _device_batch(b, mesh, n, jnp.bfloat16, cache)
    # same rows, shuffled order (ids permute with the rows)
    p = [2, 0, 3, 1]
    shuffled = {k: (v[p] if isinstance(v, np.ndarray) else [v[i] for i in p])
                for k, v in b.items()}
    d2, _ = _device_batch(shuffled, mesh, n, jnp.bfloat16, cache)
    for k in ('rgb', 'audio', 'label'):
        np.testing.assert_array_equal(
            np.asarray(d2[k])[:4], np.asarray(d1[k])[p])


def test_changed_rows_defeat_permutation_reuse():
    mesh = create_mesh()
    n = mesh.devices.size
    cache = {}
    b = _batch(9)
    _device_batch(b, mesh, n, jnp.bfloat16, cache)
    p = [1, 0, 3, 2]
    shuffled = {k: (v[p].copy() if isinstance(v, np.ndarray)
                    else [v[i] for i in p]) for k, v in b.items()}
    shuffled['rgb'][0, 0, 0, 0] += 1.0   # not a pure permutation any more
    d2, _ = _device_batch(shuffled, mesh, n, jnp.bfloat16, cache)
    np.testing.assert_array_equal(
        np.asarray(d2['rgb'], dtype=np.float32)[:4],
        shuffled['rgb'].astype(jnp.bfloat16).astype(np.float32))
