"""Multi-HOST execution: jax.distributed wiring + host-spanning meshes.

The reference is single-GPU (SURVEY.md section 0); this implements the
BASELINE config-5 requirement (v4-16 = 2 hosts x 8 chips) the TPU-native
way:

- ``maybe_initialize_distributed()``: one call at program start. Reads the
  standard coordination env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
  / JAX_PROCESS_ID, or the explicit arguments) and calls
  ``jax.distributed.initialize``. The env vars (or args) are REQUIRED for a
  multi-process run: with none set this is a no-op and each host runs as an
  independent single-process job (pod launchers must export them).
- ``make_global_mesh()``: a Mesh over ALL processes' devices on one named
  axis — the tile-band/gaussian-shard axis of parallel/sharded.py spans
  hosts transparently (shard_map collectives ride ICI within a slice and
  DCN across; the band layout keeps adjacent bands on adjacent devices so
  the SSIM-halo ppermute is nearest-neighbor).
- Host-local data loading: every process feeds the SAME camera + ground
  truth each step (the training loop is data-replicated over the image;
  gaussians are sharded). ``process_index()`` gates logging/IO exactly like
  the reference gates tqdm on a single process.

Tested without TPU hardware by tests/test_parallel.py::TestMultiHost, which
launches 2 local CPU processes x 4 virtual devices each over a localhost
coordinator and asserts the 8-device sharded step matches the single-process
8-virtual-device result.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
) -> bool:
    """Initialize jax.distributed when a multi-process run is configured.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > single-process no-op.
    Returns True when distributed mode was initialized. Must run before the
    first JAX computation touches devices.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or (num_processes or 1) <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def make_global_mesh(axis: str = "tiles") -> Mesh:
    """Mesh over every device of every process, ordered so each host's
    devices are contiguous along the axis (bands of adjacent tile rows land
    on one host; the band halo ppermute crosses DCN only at host
    boundaries)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def replicate_to_mesh(tree, mesh: Mesh):
    """Host-local pytree -> fully-replicated global arrays on the mesh.

    In a multi-process run each process holds the SAME host value (e.g. a
    freshly-initialized model or a loaded checkpoint) and owns only its
    addressable shard of the global buffer; single-process, this is a plain
    device_put."""
    spec = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, spec, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def shard_to_mesh(tree, mesh: Mesh, cap: int):
    """Host-local pytree -> global arrays with every leading-``cap`` axis
    sharded over the mesh axis (the multi-process analog of
    parallel.sharded.shard_model_state: every process holds the full host
    value, contributes only the rows its devices own)."""
    axis = mesh.axis_names[0]

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == cap:
            spec = NamedSharding(mesh, P(axis))
        else:
            spec = NamedSharding(mesh, P())
        return jax.make_array_from_callback(x.shape, spec, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def process_local_value(x) -> np.ndarray:
    """Fetch a fully-replicated global array's value on this process
    (works for scalars logged by the train loop)."""
    if _is_replicated(x):
        return np.asarray(x.addressable_data(0))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def _is_replicated(x) -> bool:
    try:
        return x.is_fully_replicated
    except AttributeError:
        return True
