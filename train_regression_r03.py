#!/usr/bin/env python
"""On-chip training regression (VERDICT r2 #6 / BASELINE config 2 evidence):
train a 256^2 synthetic multi-view scene from random init with the DEFAULT
config (reference arguments/__init__.py defaults: densify 500.. every 100,
grad threshold 2e-4 in NDC half-viewport units, opacity reset 3000) for
--iters steps on the real TPU, then:
  - write TRAIN_r03.json: PSNR trajectory, point-count trajectory, wall time
  - save the trained model as a reference-interoperable PLY
  - re-load that PLY and measure 1080p fwd+bwd rasterization throughput on
    the TRAINED distribution (the reference benches a trained model,
    fps_test.py:22-38) -> recorded in the same JSON under trained_bench.
"""
from __future__ import annotations

import json
import math
import time
from argparse import ArgumentParser

import numpy as np


def main():
    ap = ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--out", default="TRAIN_r03.json")
    ap.add_argument("--ply", default="logs/train_r03/point_cloud.ply")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussian_splatting_with_eye_tracking_tpu import train_lib
    from gaussian_splatting_with_eye_tracking_tpu.config import OptimizationConfig
    from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
    from gaussian_splatting_with_eye_tracking_tpu.models import ply_io
    from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
    from gaussian_splatting_with_eye_tracking_tpu.ops.ssim import psnr as psnr_fn
    from tests.helpers import make_camera, make_orbit_camera, make_random_gaussians

    W = H = 256
    RKW = dict(max_instances=1 << 17, max_live=1 << 17, max_per_tile=1024)
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"

    # ground truth: a detailed scene of 1500 vivid gaussians, 20 orbit views
    means, scales, quats, op, sh = make_random_gaussians(
        1500, seed=3, spread=1.2, depth_range=(4.0, 6.0),
        scale_range=(-3.4, -2.4), sh_degree=1,
    )
    bg = jnp.zeros(3)
    n_views = 20
    cams, gts = [], []
    for i in range(n_views):
        cam = make_orbit_camera(
            azimuth=2 * math.pi * i / n_views, elevation=0.25, radius=5.0,
            width=W, height=H,
        )
        gt = rast.rasterize(means, scales, quats, op, sh, cam, bg,
                            sh_degree=1, impl=impl, **RKW).color
        cams.append(cam)
        gts.append(np.asarray(gt))
    train_set = list(zip(cams, gts))[:-2]
    test_set = list(zip(cams, gts))[-2:]

    opt = OptimizationConfig()
    assert opt.densify_grad_threshold == 0.0002
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1.2, 1.2, (500, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, size=(500, 3)).astype(np.float32)
    extent = 5.0
    state, tx = gm.create_from_points(pts, cols, 1, opt, extent,
                                      capacity=1 << 14)
    step = train_lib.make_train_step(
        tx, opt, max_sh_degree=1, width=W, height=H, impl=impl, **RKW,
    )
    render = train_lib.make_eval_render(
        1, W, H, impl=impl, max_instances=RKW["max_instances"])

    key = jax.random.PRNGKey(0)
    t_start = time.time()
    points_traj, psnr_traj = [], []
    perm = rng.permutation(len(train_set))
    pi = 0
    for it in range(1, args.iters + 1):
        if it % 1000 == 0:
            state = gm.oneup_sh_degree(state, 1)
        if pi >= len(perm):
            perm = rng.permutation(len(train_set))
            pi = 0
        cam, gt = train_set[perm[pi]]
        pi += 1
        accumulate = it < opt.densify_until_iter
        state, aux = step(state, *train_lib.camera_arrays(cam),
                          jnp.asarray(gt), bg, accumulate)
        if it >= opt.densify_from_iter and it % opt.densification_interval == 0:
            key, sub = jax.random.split(key)
            max_screen = 20.0 if it > opt.opacity_reset_interval else 0.0
            state, _ = train_lib.densify_step(state, sub, opt, extent,
                                              max_screen)
        if it % opt.opacity_reset_interval == 0:
            state = gm.reset_opacity(state)
        if it % 250 == 0 or it == args.iters:
            n_act = int(gm.num_active(state))
            ps = []
            for tcam, tgt in test_set:
                img = render(state, *train_lib.camera_arrays(tcam), bg)
                ps.append(float(psnr_fn(img, jnp.asarray(tgt))))
            points_traj.append({"iter": it, "points": n_act})
            psnr_traj.append({"iter": it, "test_psnr": round(float(np.mean(ps)), 3)})
            print(f"[{it}] points={n_act} test_psnr={np.mean(ps):.2f} "
                  f"({time.time()-t_start:.0f}s)", flush=True)
    wall = time.time() - t_start

    # save trained model as reference-interoperable PLY and reload it
    import os

    os.makedirs(os.path.dirname(args.ply), exist_ok=True)
    ply_io.save_gaussians_ply(args.ply, state.params, np.asarray(state.active))
    p_np, deg2 = ply_io.load_gaussians_ply(args.ply)
    p = jax.tree.map(jnp.asarray, p_np)
    n_tr = p.xyz.shape[0]
    print(f"saved + reloaded PLY: {n_tr} points, sh_degree={deg2}", flush=True)

    # trained-distribution 1080p throughput (bench.py protocol, but the
    # gaussians come from the TRAINED model instead of a synthetic range)
    cam1080 = make_camera(1920, 1088, cam_z=-5.0)
    sh_tr = gm.get_sh(p)
    kw = dict(sh_degree=deg2, max_instances=1 << 21, max_live=1 << 21,
              max_per_tile=2048, impl=impl)

    probe = rast.rasterize(p.xyz, gm.get_scaling(p), p.rotation,
                           gm.get_opacity(p), sh_tr, cam1080, bg, **kw)
    n_inst = int(probe.num_instances)
    print(f"trained scene at 1080p: {n_inst} live instances", flush=True)

    def loss(m):
        out = rast.rasterize(m, gm.get_scaling(p), p.rotation,
                             gm.get_opacity(p), sh_tr, cam1080, bg, **kw)
        return jnp.mean(out.color ** 2)

    grad1 = jax.grad(loss)

    @jax.jit
    def chained(k, m):
        def body(i, carry):
            m_, acc = carry
            g = grad1(m_ * (1.0 + 1e-12 * i))
            return m_, acc + jnp.mean(g)

        _, acc = jax.lax.fori_loop(0, k, body, (m, 0.0))
        return acc

    iters_b = 4
    _ = float(chained(1, p.xyz))
    t1 = time.perf_counter(); _ = float(chained(1, p.xyz)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters_b, p.xyz)); t2 = time.perf_counter() - t2
    dt = max((t2 - t1) / iters_b, 1e-9)
    mpix = 1920 * 1088 / dt / 1e6

    doc = {
        "config": "default OptimizationConfig (reference defaults)",
        "resolution": [W, H], "iters": args.iters,
        "wall_time_s": round(wall, 1),
        "impl": impl,
        "points_trajectory": points_traj,
        "psnr_trajectory": psnr_traj,
        "final_points": points_traj[-1]["points"],
        "final_test_psnr": psnr_traj[-1]["test_psnr"],
        "ply": args.ply,
        "trained_bench": {
            "width": 1920, "height": 1088, "live_instances": n_inst,
            "fwd_bwd_ms": round(dt * 1e3, 2),
            "mpix_per_s": round(mpix, 1),
        },
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc["trained_bench"]), flush=True)


if __name__ == "__main__":
    main()
