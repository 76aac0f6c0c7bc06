#!/usr/bin/env python
"""Foveated AMR per-step timing (reference fps_test_amr_foveated.py:84-237):
times the 5 fovea steps (preprocess/bin/levels + AMR rounds 1-4) separately
and reports per-step FPS + cumulative-ms breakdown."""

from __future__ import annotations

import json
import time
from argparse import ArgumentParser

import numpy as np

import fps_test


def run_foveated_breakdown(state, max_sh_degree, active, width, height,
                           impl="auto", out_json="fps_data_foveated.json"):
    import jax
    import jax.numpy as jnp

    from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
    from gaussian_splatting_with_eye_tracking_tpu.ops import amr as amr_ops
    from gaussian_splatting_with_eye_tracking_tpu import renderer as rnd
    from tests.helpers import make_camera

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    cam = make_camera(width, height, cam_z=-5.0)
    gx, gy = -(-width // 32), -(-height // 32)
    p = state.params
    sh = gm.get_sh(p) * rnd.sh_band_mask(state.sh_degree, max_sh_degree)[None, None, :]
    scales = gm.get_scaling(p)
    ops = gm.get_opacity(p)
    gaze = jnp.asarray([width / 2.0, height / 2.0])
    radii = jnp.asarray([width / 2.0, width / 4.0, width / 8.0])

    def step0_chain(xyz):
        st = amr_ops.fovea_step0(
            xyz, scales, p.rotation, ops, sh, max_sh_degree, cam,
            max_instances=1 << 20, active_mask=active,
            gaze_xy=gaze, gaze_radii=radii,
        )
        return xyz + 1e-30 * jnp.sum(st.tile_levels).astype(jnp.float32)

    t0 = fps_test.chain_timer(step0_chain, p.xyz)
    state0 = jax.jit(lambda xyz: amr_ops.fovea_step0(
        xyz, scales, p.rotation, ops, sh, max_sh_degree, cam,
        max_instances=1 << 20, active_mask=active, gaze_xy=gaze, gaze_radii=radii,
    ))(p.xyz)

    steps = [{"step": 0, "ms": t0 * 1000, "fps": 1.0 / t0}]
    print(f"fovea step 0 (preprocess+bin+levels): {t0*1000:.2f} ms")

    for rnd_i in range(1, 5):
        def round_chain(st_color, rnd_i=rnd_i):
            st = state0._replace(color=st_color)
            s2 = amr_ops.fovea_step_render(
                st, rnd_i, gx, gy, 32, impl=impl, max_per_tile=2048
            )
            return s2.color

        dt = fps_test.chain_timer(round_chain, state0.color)
        steps.append({"step": rnd_i, "ms": dt * 1000, "fps": 1.0 / dt})
        print(f"fovea step {rnd_i} (round {rnd_i}): {dt*1000:.2f} ms")

    total_ms = sum(s["ms"] for s in steps)
    print(f"total foveated frame: {total_ms:.2f} ms -> {1000/total_ms:.1f} fps")
    with open(out_json, "w") as f:
        json.dump({"impl": impl, "width": width, "height": height,
                   "steps": steps, "total_ms": total_ms}, f, indent=2)
    return steps


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--model_path", "-m", default="", type=str)
    parser.add_argument("--source_path", "-s", default="", type=str)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--num_gaussians", default=100_000, type=int)
    parser.add_argument("--width", default=1920, type=int)
    parser.add_argument("--height", default=1088, type=int)
    args = parser.parse_args(argv)
    state, deg, active = fps_test.load_or_synthetic(args)
    run_foveated_breakdown(state, deg, active, args.width, args.height)


if __name__ == "__main__":
    main()
