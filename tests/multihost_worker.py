"""Worker process for the 2-process multi-host test (test_multihost.py).

Launched twice (JAX_PROCESS_ID=0/1) against a local coordinator with 4
virtual CPU devices each — the CPU stand-in for the reference's
multi-node DDP contract (reference train.py:296-313: MASTER_ADDR +
rank/world_size; per-rank DistributedSampler at
src/optimization/traditional.py:57-71; NCCL gradient all-reduce).

Asserted here, per process:
  1. `distributed_init_if_needed()` brings up the 2-process world from
     the standard env vars and is idempotent on re-entry.
  2. The DataLoader's index sharding is DistributedSampler-exact:
     rank r draws shuffled[r::world] — disjoint across ranks by
     construction, pinned against the epoch-seeded shuffle.
  3. One sharded SGD step over the GLOBAL 8-device mesh (4 local + 4
     remote via Gloo collectives) equals the single-host closed form —
     i.e. the gradient all-reduce really crosses the process boundary.
"""
import os
import sys

import jax

# CPU must be forced via jax.config BEFORE first backend use (the axon
# sitecustomize overrides the JAX_PLATFORMS env var).
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 4)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from mm_distillnet_tpu.data.loader import DataLoader  # noqa: E402
from mm_distillnet_tpu.parallel.mesh import (  # noqa: E402
    create_mesh, distributed_init_if_needed)


class TinySet:
    """16 samples; rgb plane encodes the sample index, ids are strings."""

    def __len__(self):
        return 16

    def __getitem__(self, i):
        return {'rgb': np.full((4, 4, 3), float(i), np.float32),
                'label': np.array([[0., 0., 1., 1., 2.]], np.float32),
                'id': str(i)}


def main():
    distributed_init_if_needed()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8
    distributed_init_if_needed()  # idempotent re-entry must be a no-op
    pid = jax.process_index()

    # ---- per-process loader sharding (DistributedSampler semantics) ----
    loader = DataLoader(TinySet(), batch_size=4, shuffle=True,
                        num_workers=1, seed=7, process_index=pid,
                        process_count=jax.process_count())
    loader.set_epoch(3)
    got = [int(i) for b in loader for i in b['id']]
    rng = np.random.default_rng(7 + 3)
    idx = np.arange(16)
    rng.shuffle(idx)
    want = [int(x) for x in idx[pid::2]]
    assert got == want, (pid, got, want)

    # ---- cross-process gradient all-reduce == single-host closed form ----
    mesh = create_mesh()  # global mesh: 8 devices across the 2 processes
    assert mesh.devices.size == 8
    rs = np.random.RandomState(0)
    X = rs.randn(8, 3).astype(np.float32)   # global batch, same in both
    y = rs.randn(8).astype(np.float32)
    local = X[pid * 4:(pid + 1) * 4]
    y_local = y[pid * 4:(pid + 1) * 4]
    xsh = NamedSharding(mesh, P('data'))
    rep = NamedSharding(mesh, P())
    Xg = jax.make_array_from_process_local_data(xsh, local, X.shape)
    yg = jax.make_array_from_process_local_data(xsh, y_local, y.shape)
    w0 = np.zeros(3, np.float32)

    @jax.jit
    def sgd_step(w, x, t):
        g = jax.grad(lambda w_: jnp.mean((x @ w_ - t) ** 2))(w)
        return w - 0.1 * g

    w1 = sgd_step(jax.device_put(jnp.asarray(w0), rep), Xg, yg)
    # mean over the GLOBAL batch: XLA inserts the cross-process all-reduce
    grad_np = 2.0 / 8.0 * X.T @ (X @ w0 - y)
    np.testing.assert_allclose(np.asarray(jax.device_get(w1)),
                               w0 - 0.1 * grad_np, rtol=1e-5, atol=1e-6)

    print(f'MULTIHOST_OK pid={pid}', flush=True)


if __name__ == '__main__':
    main()
