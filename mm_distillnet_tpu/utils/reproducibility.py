"""Run reproducibility (reference src/utils/utils.py:593-613).

JAX is deterministic given fixed PRNG keys; this seeds the host-side
randomness (python/numpy) used by data shuffling and augmentation choices.
"""
from __future__ import annotations

import os
import random

import numpy as np


def make_reproducible_run(seed: int) -> None:
    if seed is None or seed < 0:
        return
    random.seed(seed)
    np.random.seed(seed)
    os.environ['PYTHONHASHSEED'] = str(seed)
