"""Training checkpoints (reference train.py:127-129, capture/restore
scene/gaussian_model.py:61-93).

Two interchangeable on-disk formats:

- **pickle** (``save_checkpoint`` / ``load_checkpoint``): a single-file
  pickle of the numpy-ified GaussianModelState pytree + iteration, written
  atomically — the portable analog of the reference's
  ``torch.save((capture(), iter))``. Single-host only.
- **orbax** (``save_checkpoint_orbax`` / ``load_checkpoint_orbax``): a
  checkpoint DIRECTORY written through ``orbax.checkpoint``. In a
  ``jax.distributed`` multi-process run every process must call save/load
  (orbax coordinates the write and barriers internally); pass
  ``async_save=True`` to overlap serialization with training and call
  ``.wait_until_finished()`` (or ``close_async``) before exit.

``train.py`` picks orbax automatically when running multi-process (see
``parallel/multihost.py``) and pickle otherwise.
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Optional, Tuple

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


# ---------------------------------------------------------------------------
# Orbax: async, multi-host-ready checkpoint directories
# ---------------------------------------------------------------------------

_async_ckptr = None  # process-wide AsyncCheckpointer (owns a barrier pool)


def _get_async_checkpointer():
    global _async_ckptr
    import orbax.checkpoint as ocp

    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def save_checkpoint_orbax(
    path: str,
    state: GaussianModelState,
    iteration: int,
    *,
    async_save: bool = False,
) -> None:
    """Write ``state`` + ``iteration`` as an orbax checkpoint directory.

    Multi-host: call from EVERY process of a ``jax.distributed`` run; orbax
    writes each process's addressable shards and barriers on completion.
    ``async_save`` returns as soon as the on-device arrays are snapshotted;
    call :func:`wait_for_async_saves` before relying on the files (train.py
    does at exit).

    Layout: orbax stores the FLAT leaves of the state pytree (arbitrary
    nesting incl. the optax state serializes without custom-node handlers);
    the treedef rides alongside as a tiny pickle written by process 0, so
    restore rebuilds the exact NamedTuple structure.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    leaves, treedef = jax.tree.flatten(state)
    payload = {"leaves": leaves, "iteration": np.int64(iteration)}
    if async_save:
        ckptr = _get_async_checkpointer()
    else:
        ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    ckptr.save(path, payload, force=True)
    if jax.process_index() == 0:
        # sibling file, NOT inside the dir: orbax commits async saves by
        # atomically renaming its tmp dir onto ``path``, which must not
        # pre-exist
        d = os.path.dirname(path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(treedef, f, protocol=4)
        os.replace(tmp, path + ".treedef.pkl")


def wait_for_async_saves() -> None:
    """Block until every in-flight async orbax save has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str) -> Tuple[GaussianModelState, int]:
    """Restore a checkpoint written by :func:`save_checkpoint_orbax`.

    Restores every leaf as plain numpy (topology-agnostic): a checkpoint
    written by an N-process run must load on a single host with different
    devices — orbax's default restore insists on the saved shardings."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    meta = ckptr.metadata(path).item_metadata
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    payload = ckptr.restore(path, restore_args=restore_args)
    with open(path + ".treedef.pkl", "rb") as f:
        treedef = pickle.load(f)
    leaves = payload["leaves"]
    if isinstance(leaves, dict):  # orbax may restore lists as index-keyed dicts
        leaves = [leaves[k] for k in sorted(leaves, key=int)]
    state = jax.tree.unflatten(treedef, leaves)
    import jax.numpy as jnp

    state = jax.tree.map(jnp.asarray, state)
    return state, int(payload["iteration"])


def latest_checkpoint(model_dir: str, prefix: str = "chkpnt") -> Optional[str]:
    """Find the newest ``<prefix><iter>`` checkpoint (pickle file or orbax
    dir) under ``model_dir`` (reference searchForMaxIteration,
    utils/system_utils.py:26-28)."""
    if not os.path.isdir(model_dir):
        return None
    best, best_key = None, (-1, -1)
    for name in os.listdir(model_dir):
        if not name.startswith(prefix):
            continue
        tail = name[len(prefix):]
        # accept exactly <prefix><digits>{,.ckpt,.orbax}; in particular skip
        # the '<prefix><N>.orbax.treedef.pkl' sidecar, which would otherwise
        # win os.listdir-order ties and route a pickle to load_checkpoint_orbax
        it_str, dot, ext = tail.partition(".")
        if not it_str.isdigit() or ext not in ("", "ckpt", "orbax"):
            continue
        # on iteration ties prefer the pickle file, then the orbax dir
        rank = {"ckpt": 2, "": 1, "orbax": 0}[ext]
        key = (int(it_str), rank)
        if key > best_key:
            best_key = key
            best = os.path.join(model_dir, name)
    return best
