#!/usr/bin/env python
"""Multi-device scaling benchmark (BASELINE config 5 harness): rays/s of the
full sharded train step at 1 device vs N devices.

On a real TPU slice this measures ICI-scaled throughput; on a dev box run
with host-device emulation to validate the harness:

    python scaling_bench.py --emulate_devices 8 --devices 1 2 4 8
"""

from __future__ import annotations

import json
import time
from argparse import ArgumentParser

import numpy as np


def measure_step(step, state, cam_args, gt, bg, iters=3):
    import jax

    s1, _ = step(state, *cam_args, gt, bg, True)
    jax.block_until_ready(s1)
    # chained timing: feed the state back through the step
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s, aux = step(s, *cam_args, gt, bg, True)
    _ = float(aux["loss"])
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from gaussian_splatting_with_eye_tracking_tpu import train_lib
    from gaussian_splatting_with_eye_tracking_tpu.config import OptimizationConfig
    from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
    from gaussian_splatting_with_eye_tracking_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
    )
    from tests.helpers import make_camera, make_random_gaussians

    parser = ArgumentParser()
    parser.add_argument("--devices", nargs="+", type=int, default=None)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--height", type=int, default=1024)
    parser.add_argument("--num_gaussians", type=int, default=200_000)
    parser.add_argument("--out", type=str, default="scaling_data.json")
    parser.add_argument("--emulate_devices", type=int, default=0,
                        help="force N virtual CPU devices (harness validation)")
    args = parser.parse_args(argv)

    if args.emulate_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.emulate_devices)

    n_avail = len(jax.devices())
    dev_counts = args.devices or sorted({1, 2, n_avail} & set(range(1, n_avail + 1)))
    dev_counts = [d for d in dev_counts if d <= n_avail and args.height % (32 * d) == 0]
    print(f"{n_avail} devices available; measuring {dev_counts}")

    rng = np.random.default_rng(0)
    opt = OptimizationConfig()
    state, tx = gm.create_from_points(
        rng.uniform(-2.5, 2.5, (args.num_gaussians, 3)).astype(np.float32),
        rng.uniform(size=(args.num_gaussians, 3)).astype(np.float32),
        1, opt, 1.0,
    )
    cam = make_camera(args.width, args.height, cam_z=-5.0)
    gt = jnp.zeros((3, args.height, args.width))
    bg = jnp.zeros(3)
    cam_args = train_lib.camera_arrays(cam)

    results = []
    for nd in dev_counts:
        mesh = make_mesh(nd)
        step = make_sharded_train_step(
            mesh, tx, opt, max_sh_degree=1, width=args.width, height=args.height,
            max_instances_per_band=max((1 << 20) // nd, 1 << 14),
            max_per_tile=1024,
        )
        dt = measure_step(step, state, cam_args, gt, bg)
        rays = args.width * args.height / dt
        eff = None
        if results:
            base = results[0]
            eff = (rays / base["rays_per_s"]) / (nd / base["devices"])
        results.append({"devices": nd, "ms_per_step": dt * 1000,
                        "rays_per_s": rays, "scaling_efficiency": eff})
        print(f"{nd} device(s): {dt*1000:.1f} ms/step -> {rays/1e6:.2f} Mray/s"
              + (f" (eff {eff*100:.0f}%)" if eff else ""))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
