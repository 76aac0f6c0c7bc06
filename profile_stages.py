#!/usr/bin/env python
"""Stage-by-stage timing of the 1080p rasterization pipeline on TPU.

Times cumulative pipeline prefixes with the bench.py chained-fori_loop
protocol so remote-dispatch latency amortizes: preprocess | +binning |
+feature align | +forward | +forward+backward.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend, tile_blend
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
from tests.helpers import make_camera, make_random_gaussians

W, H, N = 1920, 1088, 300_000
TILE = 32
MAXI = 1 << 21
cam = make_camera(W, H, cam_z=-5.0)
means, scales, quats, op, sh = make_random_gaussians(
    N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0)
)
bg = jnp.zeros(3)
grid_x = -(-W // TILE)
grid_y = -(-H // TILE)


def stage_prep(m):
    p = preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE)
    return jnp.sum(p.means2d) + jnp.sum(p.rgb)


def stage_bin(m):
    p = preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE)
    b = binning_ops.bin_gaussians(p, grid_x, grid_y, MAXI)
    return jnp.sum(b.gauss_id) + jnp.sum(b.offsets)


def stage_align(m):
    p = preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE)
    b = binning_ops.bin_gaussians(p, grid_x, grid_y, MAXI)
    feat_soa = pallas_blend._sorted_features(
        p.means2d, p.conics, p.rgb, p.opacities, b.gauss_id, 128
    )
    return jnp.sum(feat_soa[0])


def stage_fwd(m):
    p = preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE)
    b = binning_ops.bin_gaussians(p, grid_x, grid_y, MAXI)
    color, final_t = pallas_blend.render_tiles_pallas(
        p.means2d, p.conics, p.rgb, p.opacities, b,
        grid_x, grid_y, TILE, bg,
    )
    return jnp.mean(color)


def stage_fwdbwd(m):
    def loss(mm):
        out = rast.rasterize(
            mm, scales, quats, op, sh, cam, bg, sh_degree=3,
            max_instances=MAXI, max_per_tile=2048, impl="pallas",
        )
        return jnp.mean(out.color ** 2)

    return jnp.mean(jax.grad(loss)(m))


def timeit(fn, iters=4):
    @jax.jit
    def chained(k, m):
        def body(i, acc):
            return acc + fn(m * (1.0 + 1e-12 * (i + acc * 0)))

        return jax.lax.fori_loop(0, k, body, 0.0)

    _ = float(chained(1, means))
    t1 = time.perf_counter(); _ = float(chained(1, means)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, means)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


for name, fn in [
    ("preprocess", stage_prep),
    ("+binning", stage_bin),
    ("+align", stage_align),
    ("+forward", stage_fwd),
    ("+fwd+bwd", stage_fwdbwd),
]:
    dt = timeit(fn)
    print(f"{name:12s} {dt*1e3:9.2f} ms  ({W*H/dt/1e6:8.2f} Mpix/s)", flush=True)
