"""Misc host utilities — reference utils/general_utils.py + system_utils.py.

``safe_state`` reproduces the reference's stdout timestamping + global
seeding (general_utils.py:120-141); ``mkdir_p`` / ``searchForMaxIteration``
mirror system_utils.py:16-28.
"""
from __future__ import annotations

import os
import random
import sys
from datetime import datetime

import numpy as np


class _TimestampedStdout:
    def __init__(self, old, silent: bool):
        self.old = old
        self.silent = silent

    def write(self, x):
        if self.silent:
            return
        if x.endswith("\n"):
            ts = datetime.now().strftime("%d/%m %H:%M:%S")
            self.old.write(x.replace("\n", f" [{ts}]\n"))
        else:
            self.old.write(x)

    def flush(self):
        self.old.flush()


def safe_state(silent: bool = False, seed: int = 0):
    """Timestamp stdout lines and fix all RNG seeds
    (general_utils.py:120-141; torch seeding becomes jax PRNG discipline —
    jax keys are explicit, so we seed python/numpy and return a root key)."""
    sys.stdout = _TimestampedStdout(sys.stdout, silent)
    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)


def mkdir_p(folder_path: str):
    os.makedirs(folder_path, exist_ok=True)


def searchForMaxIteration(folder: str) -> int:
    saved_iters = [int(fname.split("_")[-1]) for fname in os.listdir(folder)]
    return max(saved_iters)
