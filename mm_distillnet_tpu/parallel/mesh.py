"""Device mesh + sharding utilities (SPMD data parallelism over ICI).

Replaces the reference's DataParallel / DistributedDataParallel + NCCL
machinery (reference train.py:294-313, src/optimization/train_methods.py:
943-961, SURVEY.md section 2.3) with JAX-native SPMD: one jit-compiled step
over a 1-D `data` mesh; XLA inserts the gradient all-reduce. Multi-host
setup goes through `jax.distributed.initialize` instead of the
MASTER_ADDR/process-group dance.

The models here are small CNNs (<10M params); batch-only sharding is the
whole story (no tensor/pipeline parallelism needed — SURVEY.md section 2.3),
but the mesh helpers accept an arbitrary axis layout so larger variants can
add a `model` axis later.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def distributed_init_if_needed(config=None) -> None:
    """Multi-host initialization (replaces dist.init_process_group,
    reference train.py:296-313). No-op when no coordinator is configured;
    driven by the standard JAX_COORDINATOR_ADDRESS env var or explicit
    config keys (coordinator_address / nodes / rank, mirroring the
    reference's MASTER_ADDR + rank/world_size contract).

    A configured-but-failed init RAISES: silently degrading a multi-host
    run to single-host would train on 1/Nth of the data while reporting
    success (the reference fails loudly too — dist.init_process_group
    raises on an unreachable master)."""
    addr = os.environ.get('JAX_COORDINATOR_ADDRESS')
    num_processes = os.environ.get('JAX_NUM_PROCESSES')
    process_id = os.environ.get('JAX_PROCESS_ID')
    if config is not None:
        addr = config.get('coordinator_address', fallback=None) or addr
        num_processes = (config.get('num_processes', fallback=None)
                         or num_processes)
        process_id = config.get('process_id', fallback=None) or process_id
    if not addr:
        return
    # Check "already initialized" WITHOUT jax.process_count(): that would
    # initialize the backend, after which distributed.initialize() is
    # rejected. The distributed client handle is the init-state source of
    # truth.
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, 'client', None) is not None:
        return  # idempotent re-entry
    kwargs = {'coordinator_address': addr}
    if num_processes is not None:
        kwargs['num_processes'] = int(num_processes)
    if process_id is not None:
        kwargs['process_id'] = int(process_id)
    timeout_s = os.environ.get('JAX_COORDINATOR_INIT_TIMEOUT')
    if timeout_s is not None:
        kwargs['initialization_timeout'] = int(timeout_s)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # The one legitimate re-entry case: this process already ran
        # initialize() (e.g. trainer called after the CLI did).
        if 'already initialized' in str(e).lower():
            return
        raise


def create_mesh(num_devices: int = -1,
                devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D `data` mesh over local (or given) devices; -1 uses all."""
    if devices is None:
        devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a host batch with the leading dim sharded over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to_devices(arrays, n_devices: int):
    """Pad the leading dim of every array to a multiple of n_devices
    (repeating the last element) so the batch shards evenly; returns the
    padded tree and the original batch size."""
    import numpy as _np

    def _pad(x):
        b = x.shape[0]
        rem = (-b) % n_devices
        if rem == 0:
            return x
        reps = _np.repeat(x[-1:], rem, axis=0)
        return _np.concatenate([x, reps], axis=0)

    first = jax.tree_util.tree_leaves(arrays)[0]
    return jax.tree_util.tree_map(_pad, arrays), first.shape[0]
