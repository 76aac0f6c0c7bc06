#!/usr/bin/env python
"""Isolate the cost of the (T,P,3)->(3,H,W) image assembly transposes around
the blend kernels (fwd and bwd), plus the OUTC-padded output traffic."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend as pb
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
from tests.helpers import make_camera, make_random_gaussians

W, H, N = 1920, 1088, 300_000
TILE, CHUNK = 32, 128
MAXI = 1 << 21
cam = make_camera(W, H, cam_z=-5.0)
means, scales, quats, op, sh = make_random_gaussians(
    N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0)
)
grid_x, grid_y = -(-W // TILE), -(-H // TILE)
bg = jnp.zeros(3)
prep = jax.jit(lambda m: preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE))(means)
b = jax.jit(lambda: binning_ops.bin_gaussians(prep, grid_x, grid_y, MAXI))()
prep, b = jax.block_until_ready((prep, b))


def timeit(name, fn, x, iters=4):
    @jax.jit
    def chained(k, x):
        def body(i, acc):
            return acc + fn(x * (1.0 + 1e-12 * i), i)
        return jax.lax.fori_loop(0, k, body, 0.0)

    _ = float(chained(1, x))
    t1 = time.perf_counter(); _ = float(chained(1, x)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, x)); t2 = time.perf_counter() - t2
    dt = max((t2 - t1) / iters, 1e-9)
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def tiles_loss(xy, i):
    t = pb.blend_pallas(
        xy, prep.conics, prep.rgb, prep.opacities, b.gauss_id, b.offsets,
        b.gauss_start, b.gauss_count, grid_x, grid_y, TILE, CHUNK, False,
    )
    return jnp.mean(t[:, :, 0:3] ** 2) + jnp.mean(t[:, :, 3])


def image_loss(xy, i):
    c, ft = pb.render_tiles_pallas(
        xy, prep.conics, prep.rgb, prep.opacities, b, grid_x, grid_y, TILE, bg
    )
    return jnp.mean(c ** 2) + jnp.mean(ft)


timeit("fwd tiles-layout loss (no assembly)", tiles_loss, prep.means2d)
timeit("fwd image loss (with assembly)", image_loss, prep.means2d)
timeit("fwd+bwd tiles-layout", lambda xy, i: jnp.mean(jax.grad(tiles_loss)(xy, i)), prep.means2d)
timeit("fwd+bwd image", lambda xy, i: jnp.mean(jax.grad(image_loss)(xy, i)), prep.means2d)

# assembly transpose alone, fwd and as vjp
tiles0 = jax.block_until_ready(
    jax.jit(lambda: jnp.zeros((grid_x * grid_y, TILE * TILE, 3), jnp.float32) )()
)

def assemble(t, i):
    color = t.reshape(grid_y, grid_x, TILE, TILE, 3)
    color = jnp.transpose(color, (4, 0, 2, 1, 3)).reshape(3, grid_y * TILE, grid_x * TILE)
    return jnp.mean(color ** 2)

timeit("assembly transpose fwd", assemble, tiles0)
timeit("assembly transpose fwd+bwd", lambda t, i: jnp.mean(jax.grad(assemble)(t, i)), tiles0)
