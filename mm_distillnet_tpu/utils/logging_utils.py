"""Logging + scalar observability.

Reproduces the reference's three channels (SURVEY.md section 5):
(1) python logging with a per-run, per-rank DEBUG FileHandler
    `{exp_name}/{exp_name}.{rank}.log` (reference train.py:283-292);
(2) tensorboardX scalars with the reference's tag names (Train/Total_loss,
    Train/Class_loss, ..., reference src/optimization/traditional.py:210-236)
    plus an `all_logs.{rank}.json` export (train_methods.py:1067);
(3) CSV artifacts (results/resources) written by the evaluate driver.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Dict


def setup_run_logging(config, rank: int = 0) -> logging.Logger:
    exp_name = config.get('exp_name', 'run')
    os.makedirs(exp_name, exist_ok=True)
    logger = logging.getLogger('mm_distillnet_tpu')
    logger.setLevel(logging.DEBUG)
    path = os.path.join(exp_name, f'{exp_name}.{rank}.log')
    # exp_name may itself contain a path separator (the pretrain stage runs
    # under '{exp_name}/pretrain'); create the full parent chain.
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # One per-rank file at a time: harnesses that drive several runs in a
    # single process (convergence_shipped trains 3 teachers sequentially)
    # would otherwise accumulate handlers and spray every later run's
    # records into every earlier run's log file. The reference never hits
    # this (one run per process, train.py:283-292); drop+close handlers
    # that point at a DIFFERENT run file, keep an existing one for the
    # same path (trainer + eval sharing an exp_name stay appending).
    abspath = os.path.abspath(path)
    for h in list(logger.handlers):
        if isinstance(h, logging.FileHandler) and \
                getattr(h, 'baseFilename', '') != abspath:
            logger.removeHandler(h)
            h.close()
    if not any(isinstance(h, logging.FileHandler) and
               getattr(h, 'baseFilename', '') == abspath
               for h in logger.handlers):
        fh = logging.FileHandler(path)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter(
            '%(asctime)s %(levelname)s %(name)s: %(message)s'))
        logger.addHandler(fh)
    return logger


class ScalarWriter:
    """tensorboardX writer + JSON scalar accumulator (per rank)."""

    def __init__(self, config, rank: int = 0):
        self.rank = rank
        self.scalars: Dict[str, Dict[int, float]] = {}
        self.exp_name = config.get('exp_name', 'run')
        os.makedirs(self.exp_name, exist_ok=True)
        log_path = config.get('log_path', 'tensorboard')
        self._tb = None
        try:
            from tensorboardX import SummaryWriter
            os.makedirs(log_path, exist_ok=True)
            self._tb = SummaryWriter(
                logdir=os.path.join(log_path, f'rank{rank}'))
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int):
        value = float(value)
        self.scalars.setdefault(tag, {})[int(step)] = value
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def export_json(self):
        path = os.path.join(self.exp_name, f'all_logs.{self.rank}.json')
        with open(path, 'w') as f:
            json.dump(self.scalars, f)

    def close(self):
        self.export_json()
        if self._tb is not None:
            self._tb.close()
