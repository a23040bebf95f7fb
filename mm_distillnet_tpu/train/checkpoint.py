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
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    if is_best:
        best = _ckpt_dir(config, 'best', rank)
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
        # lightweight params-only artifact
        ponly = _ckpt_dir(config, 'only_parameters_student_best', rank)
        if os.path.exists(ponly):
            shutil.rmtree(ponly)
        p_ckptr = ocp.StandardCheckpointer()
        p_ckptr.save(ponly, {
            'params': payload['params'],
            'batch_stats': payload['batch_stats']})
        p_ckptr.wait_until_finished()
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
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, template)
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
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    return {'params': restored['params'],
            'batch_stats': restored['batch_stats']}
