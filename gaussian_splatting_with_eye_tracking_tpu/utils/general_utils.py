"""General utilities (reference utils/general_utils.py:112-133 safe_state:
RNG seeding + timestamped stdout)."""

from __future__ import annotations

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
    """Seed host RNGs and timestamp stdout lines (reference
    utils/general_utils.py:112-133). JAX randomness stays explicit via keys."""
    sys.stdout = _TimestampedStdout(sys.stdout, silent)
    random.seed(seed)
    np.random.seed(seed)
