"""Worker process for the multi-HOST CPU test (tests/test_parallel.py::
TestMultiHost): one of N local processes coordinating over localhost via
``jax.distributed``, each exposing 4 virtual CPU devices, together forming
the same 8-device mesh the single-process tests use.

Run (by the test driver, never directly by pytest):
    python tests/multihost_worker.py <port> <process_id> <num_processes> <out.json>

The parent sets JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=4 in the child env BEFORE
python starts, so the axon sitecustomize's early jax import sees them.
"""

from __future__ import annotations

import json
import os
import sys


def main():
    port, pid, nproc, out_path = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.config.update("jax_enable_x64", False)
    # multi-process CPU needs a cross-process collectives implementation —
    # without it the CPU client stays process-local (process_count() == 1)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from gaussian_splatting_with_eye_tracking_tpu.parallel import multihost

    ok = multihost.maybe_initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert ok, "distributed init skipped"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from gaussian_splatting_with_eye_tracking_tpu import train_lib
    from gaussian_splatting_with_eye_tracking_tpu.parallel import (
        make_gauss_sharded_train_step,
        make_sharded_train_step,
    )
    from tests.helpers import make_camera
    from tests.test_parallel import small_state

    n_dev = 4 * nproc
    h = 32 * n_dev
    cam = make_camera(64, h)
    bg = jnp.zeros(3)
    gt_host = np.full((3, h, 64), 0.4, np.float32)

    results = {}

    # --- replicated-params band-sharded step (make_sharded_train_step) ---
    state, tx, opt = small_state(seed=2)
    mesh = multihost.make_global_mesh(axis="tiles")
    gstate = multihost.replicate_to_mesh(state, mesh)
    cam_args = [multihost.replicate_to_mesh(a, mesh)
                for a in train_lib.camera_arrays(cam)]
    gt = multihost.replicate_to_mesh(gt_host, mesh)
    bg_g = multihost.replicate_to_mesh(bg, mesh)
    step = make_sharded_train_step(
        mesh, tx, opt, max_sh_degree=0, width=64, height=h,
        max_instances_per_band=1 << 11, max_per_tile=64, impl="jnp",
    )
    losses = []
    for _ in range(2):
        gstate, aux = step(gstate, *cam_args, gt, bg_g, True)
        losses.append(float(aux["loss"]))
    results["band"] = {
        "losses": losses,
        "xyz_abs_sum": float(jnp.sum(jnp.abs(gstate.params.xyz))),
        "accum_abs_sum": float(jnp.sum(jnp.abs(gstate.xyz_grad_accum))),
    }

    # --- primitive-sharded step (make_gauss_sharded_train_step) ---
    state2, tx2, opt2 = small_state(seed=4)
    mesh2 = multihost.make_global_mesh(axis="gauss")
    cap = state2.params.xyz.shape[0]
    sstate = multihost.shard_to_mesh(state2, mesh2, cap)
    step2 = make_gauss_sharded_train_step(
        mesh2, tx2, opt2, max_sh_degree=0, width=64, height=h,
        max_instances_per_band=1 << 11, max_per_tile=64, impl="jnp",
    )
    cam_args2 = [multihost.replicate_to_mesh(a, mesh2)
                 for a in train_lib.camera_arrays(cam)]
    gt2 = multihost.replicate_to_mesh(gt_host, mesh2)
    bg2 = multihost.replicate_to_mesh(bg, mesh2)
    losses2 = []
    for _ in range(2):
        sstate, aux2 = step2(sstate, *cam_args2, gt2, bg2, True)
        losses2.append(float(aux2["loss"]))
    # xyz is sharded: sum of |rows| is a replicated scalar after jnp.sum
    results["gauss"] = {
        "losses": losses2,
        "xyz_abs_sum": float(jnp.sum(jnp.abs(sstate.params.xyz))),
        "local_shard_rows": int(
            sstate.params.xyz.addressable_shards[0].data.shape[0]),
    }

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(results, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
