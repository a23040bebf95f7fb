"""Checkpoint / resume with the reference's state contract.

Mirrors save_checkpoint / resume_from_checkpoint (reference
src/optimization/train_methods.py:1188-1254): the saved state carries
{epoch, model state, best_loss, best_epoch, optimizer state, scheduler
state}; per-rank directories `checkpoint.{rank}` with a copy to
`best.{rank}` when validation improves, plus the lightweight
`only_parameters_student_best.{rank}` params-only artifact
(train_methods.py:1028-1034). Storage is orbax (async-capable, atomic).
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..distill.train_step import TrainState


def _ckpt_dir(config, name: str, rank: int) -> str:
    exp_name = config.get('exp_name', 'run')
    os.makedirs(exp_name, exist_ok=True)
    return os.path.abspath(os.path.join(exp_name, f'{name}.{rank}'))


def _remove_any(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


def _npz_save(path: str, payload) -> None:
    """Per-rank LOCAL save as one flat .npz file — the direct analogue of
    the reference's per-rank `torch.save(checkpoint, 'checkpoint.{rank}')`
    (train_methods.py:1239-1254). Keys are jax keystr paths; atomic via
    tmp-file + rename."""
    if os.path.isdir(path):  # a prior single-process (orbax dir) save
        shutil.rmtree(path)
    flat, _ = jax.tree_util.tree_flatten_with_path(payload)
    arrays = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat}
    tmp = path + '.tmp-npz'
    with open(tmp, 'wb') as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _npz_restore(path: str, template):
    """Restore a _npz_save file into the template's tree structure; a
    missing or extra key is a loud structure-mismatch error."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    with np.load(path, allow_pickle=False) as z:
        want = [jax.tree_util.keystr(p) for p, _ in flat]
        have = set(z.files)
        if set(want) != have:
            raise ValueError(
                f'checkpoint structure mismatch at {path}: '
                f'missing={sorted(set(want) - have)} '
                f'unexpected={sorted(have - set(want))}')
        restored = [z[k] for k in want]
    return jax.tree_util.tree_unflatten(treedef, restored)


def _npz_restore_dicts(path: str, roots=('params', 'batch_stats')):
    """Template-free restore of pure nested-dict subtrees (params /
    batch_stats) from a _npz_save file, rebuilding the nesting from the
    keystr paths (e.g. "['params']['backbone']['conv']['kernel']")."""
    import re
    out = {}
    with np.load(path, allow_pickle=False) as z:
        for key in z.files:
            parts = re.findall(r"\['([^']+)'\]", key)
            if not parts or parts[0] not in roots:
                continue
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out


def _multiprocess() -> bool:
    return jax.process_count() > 1


def _orbax_save(path: str, payload) -> None:
    ckptr = ocp.StandardCheckpointer()
    _remove_any(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()


def _restore_any(path: str, template=None):
    """Restore either on-disk format: an orbax directory (single-process
    saves, incl. checkpoints from older builds) or a per-rank .npz file
    (multi-process saves).

    Why two formats: per-rank saves in a multi-process world CANNOT go
    through orbax in this environment — its StandardCheckpointer treats a
    save as one logical multi-host checkpoint (async commit futures wait
    on global `awaitable_signals_contract_*` keys, and NumpyHandler
    hard-codes `if multihost.process_index() == 0` around the actual
    write), so a rank>0 local save either deadlocks or commits an empty
    checkpoint — both measured in the 2-process contract test. The .npz
    file mirrors the reference's per-rank torch.save exactly."""
    if os.path.isfile(path):
        assert template is not None, \
            'npz checkpoints require a template for structure checking'
        return _npz_restore(path, template)
    ckptr = ocp.StandardCheckpointer()
    return (ckptr.restore(path, template) if template is not None
            else ckptr.restore(path))


def save_checkpoint(config, state: TrainState, epoch: int, best_loss: float,
                    best_epoch: int, scheduler_state: Dict[str, Any],
                    rank: int = 0, is_best: bool = False) -> str:
    payload = {
        'epoch': np.asarray(epoch),
        'best_loss': np.asarray(best_loss),
        'best_epoch': np.asarray(best_epoch),
        'params': jax.tree_util.tree_map(np.asarray, state.params),
        'batch_stats': jax.tree_util.tree_map(np.asarray, state.batch_stats),
        'opt_state': jax.tree_util.tree_map(np.asarray, state.opt_state),
        'step': np.asarray(state.step),
        'scheduler': {k: np.asarray(v)
                      for k, v in scheduler_state.items()},
    }
    path = _ckpt_dir(config, 'checkpoint', rank)
    ponly_payload = {'params': payload['params'],
                     'batch_stats': payload['batch_stats']}
    if _multiprocess():
        _npz_save(path, payload)
        if is_best:
            best = _ckpt_dir(config, 'best', rank)
            _remove_any(best)
            shutil.copyfile(path, best)
            _npz_save(_ckpt_dir(config, 'only_parameters_student_best',
                                rank), ponly_payload)
        return path
    _orbax_save(path, payload)
    if is_best:
        best = _ckpt_dir(config, 'best', rank)
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
        # lightweight params-only artifact
        ponly = _ckpt_dir(config, 'only_parameters_student_best', rank)
        if os.path.exists(ponly):
            shutil.rmtree(ponly)
        _orbax_save(ponly, ponly_payload)
    return path


def restore_checkpoint(config, state: TrainState, scheduler,
                       rank: int = 0, name: str = 'checkpoint'
                       ) -> Tuple[TrainState, int, float, int]:
    """Returns (state, start_epoch, best_loss, best_epoch); identity when no
    checkpoint exists (resume_from_checkpoint semantics,
    reference train_methods.py:1188-1236)."""
    path = _ckpt_dir(config, name, rank)
    if not os.path.exists(path):
        return state, 0, float(np.inf), 0
    template = {
        'epoch': np.asarray(0),
        'best_loss': np.asarray(0.0),
        'best_epoch': np.asarray(0),
        'params': jax.tree_util.tree_map(np.asarray, state.params),
        'batch_stats': jax.tree_util.tree_map(np.asarray, state.batch_stats),
        'opt_state': jax.tree_util.tree_map(np.asarray, state.opt_state),
        'step': np.asarray(state.step),
        'scheduler': {k: np.asarray(v)
                      for k, v in scheduler.state_dict().items()},
    }
    restored = _restore_any(path, template)
    new_state = TrainState(
        step=jax.numpy.asarray(restored['step']),
        params=restored['params'],
        batch_stats=restored['batch_stats'],
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(restored['opt_state'])),
    )
    scheduler.load_state_dict(
        {k: v.item() if hasattr(v, 'item') else v
         for k, v in restored['scheduler'].items()})
    return (new_state, int(restored['epoch']) + 1,
            float(restored['best_loss']), int(restored['best_epoch']))


def load_student_params(config, rank: int = 0, name: str = 'best'):
    """Restore just {params, batch_stats} from a best/params-only dir; None
    if absent."""
    path = _ckpt_dir(config, name, rank)
    if not os.path.exists(path):
        return None
    if os.path.isfile(path):
        # npz (multi-process per-rank) format: params/batch_stats are
        # pure nested dicts, rebuildable from the keystr paths
        restored = _npz_restore_dicts(path)
    else:
        restored = ocp.StandardCheckpointer().restore(path)
    return {'params': restored['params'],
            'batch_stats': restored['batch_stats']}
