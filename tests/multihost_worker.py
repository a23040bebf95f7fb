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
  4. Per-rank checkpoint save/restore (reference per-rank
     `checkpoint.{rank}` torch.save/load, train_methods.py:1239-1254):
     each rank round-trips a TrainState + scheduler through
     train.checkpoint into its OWN rank-suffixed dir, and after a global
     barrier rank 0 sees both rank dirs on the shared filesystem.
  5. One eval batch through evaluation.make_predict_fn sharded over the
     GLOBAL 2-process mesh: each rank's addressable output shards equal
     the corresponding rows of a single-device run of the same predictor
     on the full batch (the cross-process half of the dryrun's
     sharded-eval == single-device-eval certificate).
"""
import os
import sys

import jax

# CPU must be forced via jax.config BEFORE first backend use (the axon
# sitecustomize overrides the JAX_PLATFORMS env var).
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 4)

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TESTS_DIR))
sys.path.insert(0, _TESTS_DIR)  # for helpers.fast_init

# Same persistent CPU compile cache as tests/conftest.py (keyed by host CPU
# features — see the conftest comment): the eval leg compiles the test-tiny
# EfficientDet, which dominates cold-run wall time otherwise.
import hashlib  # noqa: E402

try:
    with open('/proc/cpuinfo') as _f:
        _tag = hashlib.md5(next(
            ln for ln in _f if ln.startswith('flags')).encode()
        ).hexdigest()[:8]
except Exception:
    _tag = 'unknown'
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser(f'~/.cache/mmdt_xla_cpu_tests-{_tag}'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

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

    _checkpoint_leg(mesh, pid, np.asarray(jax.device_get(w1)))
    _sharded_eval_leg(mesh, pid)

    print(f'MULTIHOST_OK pid={pid}', flush=True)


def _checkpoint_leg(mesh, pid: int, w1: np.ndarray):
    """Per-rank checkpoint save/restore across the 2-process world
    (reference save_checkpoint/resume_from_checkpoint per-rank dirs,
    train_methods.py:1188-1254). Uses the REAL train.checkpoint module and
    the REAL StepLR scheduler; the shared dir comes from the orchestrating
    test via MMDT_MH_DIR."""
    import optax
    from jax.experimental import multihost_utils

    from mm_distillnet_tpu.config import default_config
    from mm_distillnet_tpu.distill.train_step import TrainState
    from mm_distillnet_tpu.train.checkpoint import (restore_checkpoint,
                                                    save_checkpoint)
    from mm_distillnet_tpu.train.optim import StepLR

    shared = os.environ['MMDT_MH_DIR']
    cfg = default_config(exp_name=os.path.join(shared, 'mh-ckpt'))
    params = {'w': w1, 'rank_stamp': np.full((2,), float(pid), np.float32)}
    tx = optax.sgd(0.1)
    state = TrainState(step=jnp.asarray(3, jnp.int32), params=params,
                       batch_stats={'bn': {'mean': np.ones(2, np.float32)}},
                       opt_state=tx.init(params))
    sched = StepLR(1e-3, step_size=2, gamma=0.5)
    sched.step(); sched.step(); sched.step()  # lr now 5e-4, last_epoch 3
    save_checkpoint(cfg, state, epoch=7, best_loss=0.25, best_epoch=5,
                    scheduler_state=sched.state_dict(), rank=pid,
                    is_best=True)

    fresh = TrainState(step=jnp.asarray(0, jnp.int32),
                       params=jax.tree_util.tree_map(np.zeros_like, params),
                       batch_stats={'bn': {'mean': np.zeros(2, np.float32)}},
                       opt_state=tx.init(params))
    sched2 = StepLR(1e-3, step_size=2, gamma=0.5)
    restored, start_epoch, best_loss, best_epoch = restore_checkpoint(
        cfg, fresh, sched2, rank=pid)
    assert (start_epoch, best_loss, best_epoch) == (8, 0.25, 5)
    np.testing.assert_array_equal(np.asarray(restored.params['w']), w1)
    # the rank stamp proves rank r restored ITS file, not the other rank's
    np.testing.assert_array_equal(
        np.asarray(restored.params['rank_stamp']), np.full((2,), float(pid)))
    assert sched2.state_dict() == sched.state_dict(), (
        sched2.state_dict(), sched.state_dict())

    # barrier, then rank 0 checks both per-rank dirs exist (the contract
    # that lets every rank resume after a restart)
    multihost_utils.sync_global_devices('mh_ckpt_saved')
    if pid == 0:
        for r in range(2):
            for name in ('checkpoint', 'best',
                         'only_parameters_student_best'):
                d = os.path.join(shared, 'mh-ckpt', f'{name}.{r}')
                assert os.path.exists(d), f'missing {d}'
    print(f'MULTIHOST_CKPT_OK pid={pid}', flush=True)


def _sharded_eval_leg(mesh, pid: int):
    """One eval batch through the public make_predict_fn sharded over the
    global 8-device / 2-process mesh; each rank compares its addressable
    output shards against a single-device run on the full batch."""
    from helpers import fast_init
    from mm_distillnet_tpu.config import default_config
    from mm_distillnet_tpu.evaluation import make_predict_fn
    from mm_distillnet_tpu.models.efficientdet import EfficientDet
    from mm_distillnet_tpu.ops.postprocess import class_validity_table

    size = 128
    model = EfficientDet(num_classes=20, compound_coef=-1,
                         dtype=jnp.float32)
    x_np = np.random.RandomState(5).randn(8, size, size, 8).astype(
        np.float32)
    variables = fast_init(model, 11, jnp.asarray(x_np[:1]))
    cfg = default_config(nms_candidates='64', max_detections='8',
                         image_size=str(size))
    class_valid = np.asarray(class_validity_table(20, list(range(20))))
    pred_to_label = np.arange(20)

    # single-device reference on THIS rank's device 0, full batch
    pred_1dev = make_predict_fn(model, size, cfg)
    rows_ref, _ = pred_1dev(variables, jnp.asarray(x_np),
                            jnp.asarray(class_valid),
                            jnp.asarray(pred_to_label))
    rows_ref = np.asarray(jax.device_get(rows_ref))

    # mesh-sharded run: batch sharded over the global mesh, the local
    # 4-row shard fed via make_array_from_process_local_data
    xsh = NamedSharding(mesh, P('data'))
    rep = NamedSharding(mesh, P())
    Xg = jax.make_array_from_process_local_data(
        xsh, x_np[pid * 4:(pid + 1) * 4], x_np.shape)
    pred_mesh = make_predict_fn(model, size, cfg, mesh=mesh)
    rows_shd, _ = pred_mesh(
        jax.device_put(variables, rep), Xg,
        jax.device_put(jnp.asarray(class_valid), rep),
        jax.device_put(jnp.asarray(pred_to_label), rep))
    for shard in rows_shd.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), rows_ref[shard.index], rtol=1e-5,
            atol=1e-5, err_msg=f'rank {pid} shard {shard.index}')
    print(f'MULTIHOST_EVAL_OK pid={pid}', flush=True)


if __name__ == '__main__':
    main()
