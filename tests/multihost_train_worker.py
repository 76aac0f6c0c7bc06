"""Worker for the multi-process train.py smoke test (ADVICE r4 #1):
one of 2 local processes running the REAL training() entry over a shared
scene directory, coordinating via jax.distributed over localhost.

Run (by tests/test_parallel.py::TestMultiHostTrainCLI, never by pytest):
    python tests/multihost_train_worker.py <port> <pid> <nproc> <scene> <model>
"""

from __future__ import annotations

import json
import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    scene_dir, model_dir = sys.argv[4], sys.argv[5]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.chdir(repo)

    import jax

    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from gaussian_splatting_with_eye_tracking_tpu.parallel import multihost

    ok = multihost.maybe_initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert ok and jax.process_count() == nproc

    import numpy as np

    import train as train_cli
    from gaussian_splatting_with_eye_tracking_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig)
    from gaussian_splatting_with_eye_tracking_tpu.models import checkpoint as ckpt
    from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm

    iters = 40
    cfg = ModelConfig(source_path=scene_dir, model_path=model_dir, eval=True)
    opt = OptimizationConfig(iterations=iters)
    scene, state = train_cli.training(
        cfg, opt, PipelineConfig(),
        testing_iterations={iters}, saving_iterations={iters},
        checkpoint_iterations={iters}, start_checkpoint=None,
        quiet=(pid != 0),
    )
    ckpt.wait_for_async_saves()

    xyz = np.asarray(state.params.xyz)
    assert np.isfinite(xyz[np.asarray(state.active)]).all()
    if pid == 0:
        with open(os.path.join(model_dir, "worker_result.json"), "w") as f:
            json.dump({
                "num_active": int(gm.num_active(state)),
                "xyz_abs_sum": float(np.abs(xyz).sum()),
            }, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
