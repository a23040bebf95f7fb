"""Optimizers (optax) and host-side LR schedulers.

Mirrors the reference's optimizer/scheduler factories
(reference src/optimization/train_methods.py:818-878):
- SGD(lr, momentum, weight_decay) / Adam(lr, b1, b2) / AdamW(lr, b1, b2)
- StepLR(step_size, gamma) / ReduceLROnPlateau(patience=3, factor=0.1) /
  CosineAnnealingWarmRestarts(T_0=10)

The learning rate is injected via optax.inject_hyperparams so the host-side
scheduler can mutate it between steps without recompilation (it lives in
the opt_state pytree).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import optax


def build_optimizer(config) -> optax.GradientTransformation:
    name = config.get('optimizer', 'Adam')
    lr = config.getfloat('lr')
    grad_clip = config.getfloat('grad_clip')

    def make(learning_rate):
        if name == 'SGD':
            tx = optax.sgd(learning_rate,
                           momentum=config.getfloat('momentum'))
            wd = config.getfloat('weight_decay')
            if wd and wd > 0:
                tx = optax.chain(optax.add_decayed_weights(wd), tx)
        elif name == 'Adam':
            tx = optax.adam(learning_rate, b1=config.getfloat('b1'),
                            b2=config.getfloat('b2'), eps=1e-8)
        elif name == 'AdamW':
            tx = optax.adamw(learning_rate, b1=config.getfloat('b1'),
                             b2=config.getfloat('b2'),
                             weight_decay=1e-2)  # torch AdamW default
        else:
            raise Exception(f"Unsupported optimizer {name}")
        if grad_clip and grad_clip > 0:
            # reference clips grads by global norm before step
            # (src/optimization/traditional.py:184-189)
            tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        return tx

    return optax.inject_hyperparams(make)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning rate inside an opt_state pytree.

    Stored as a float32 array so the compiled train step's input signature
    stays stable (a bare python float would be traced as a weak type and
    retrigger compilation) — and placed with the SAME sharding as the leaf
    it replaces: swapping a mesh-replicated leaf for an uncommitted
    single-device array changes the jit input-sharding signature and
    recompiles the whole fused step (measured: a 184 s second compile on
    the first scheduler step of every train.py run, BENCH_NOTES round 4)."""
    import jax
    import jax.numpy as jnp
    old = opt_state.hyperparams['learning_rate']
    new = jnp.asarray(lr, jnp.float32)
    sharding = getattr(old, 'sharding', None)
    if sharding is not None:
        new = jax.device_put(new, sharding)
    opt_state.hyperparams['learning_rate'] = new
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams['learning_rate'])


class StepLR:
    """lr = lr0 * gamma^(epoch // step_size)."""

    def __init__(self, lr0: float, step_size: int, gamma: float):
        self.lr0, self.step_size, self.gamma = lr0, step_size, gamma
        self.epoch = 0
        self.lr = lr0

    def step(self, metric: float = None) -> float:
        self.epoch += 1
        self.lr = self.lr0 * (self.gamma ** (self.epoch // self.step_size))
        return self.lr

    def state_dict(self) -> Dict[str, Any]:
        return {'epoch': self.epoch, 'lr': self.lr}

    def load_state_dict(self, d):
        self.epoch, self.lr = d['epoch'], d['lr']


class ReduceLROnPlateau:
    """Torch-semantics plateau scheduler (mode='min', factor=0.1,
    patience as configured; the reference uses patience=3,
    src/optimization/train_methods.py:866-871)."""

    def __init__(self, lr0: float, patience: int = 3, factor: float = 0.1,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = lr0
        self.patience, self.factor = patience, factor
        self.threshold, self.min_lr = threshold, min_lr
        self.best = math.inf
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

    def state_dict(self):
        return {'lr': self.lr, 'best': self.best, 'num_bad': self.num_bad}

    def load_state_dict(self, d):
        self.lr, self.best, self.num_bad = d['lr'], d['best'], d['num_bad']


class CosineAnnealingWarmRestarts:
    """lr = eta_min + (lr0 - eta_min) * (1 + cos(pi * T_cur / T_i)) / 2,
    restarting every T_0 epochs (T_mult=1; reference uses T_0=10)."""

    def __init__(self, lr0: float, T_0: int = 10, eta_min: float = 0.0):
        self.lr0, self.T_0, self.eta_min = lr0, T_0, eta_min
        self.epoch = 0
        self.lr = lr0

    def step(self, metric: float = None) -> float:
        self.epoch += 1
        t_cur = self.epoch % self.T_0
        self.lr = self.eta_min + (self.lr0 - self.eta_min) * \
            (1 + math.cos(math.pi * t_cur / self.T_0)) / 2
        return self.lr

    def state_dict(self):
        return {'epoch': self.epoch, 'lr': self.lr}

    def load_state_dict(self, d):
        self.epoch, self.lr = d['epoch'], d['lr']


def build_scheduler(config):
    name = config.get('scheduler', 'ReduceLROnPlateau')
    lr0 = config.getfloat('lr')
    if name == 'StepLR':
        return StepLR(lr0, config.getint('step_size'),
                      config.getfloat('gamma'))
    if name == 'ReduceLROnPlateau':
        return ReduceLROnPlateau(lr0, patience=3)
    if name == 'CosineAnnealingWarmRestarts':
        return CosineAnnealingWarmRestarts(lr0, T_0=10)
    raise Exception(f"Unsupported scheduler {name}")
