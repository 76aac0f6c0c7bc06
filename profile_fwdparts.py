#!/usr/bin/env python
"""Break the 33ms blend-forward into parts: feature gather+transpose, fwd
kernel alone, assembly, and the full fwd path."""
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
counts = (b.offsets[1:] - b.offsets[:-1]).astype(jnp.int32)
feat0 = jax.block_until_ready(
    jax.jit(lambda xy: pb._sorted_features(
        xy, prep.conics, prep.rgb, prep.opacities, b.gauss_id, CHUNK))(prep.means2d)
)


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


timeit("gather+transpose _sorted_features", lambda xy, i: jnp.sum(
    pb._sorted_features(xy, prep.conics, prep.rgb, prep.opacities,
                        b.gauss_id, CHUNK)[:, ::509]), prep.means2d)

timeit("fwd kernel alone (feat precomputed)", lambda f, i: jnp.sum(
    pb._fwd_call(f, b.offsets, counts, grid_x, grid_y, TILE, CHUNK, False)[:, ::7, :4]
), feat0)


def full_fwd(xy, i):
    c, ft = pb.render_tiles_pallas(
        xy, prep.conics, prep.rgb, prep.opacities, b, grid_x, grid_y, TILE, bg
    )
    return jnp.mean(c ** 2)


timeit("full fwd (gather+kernel+assembly+mean)", full_fwd, prep.means2d)


def kern_plus_assembly(f, i):
    tiles = pb._fwd_call(f, b.offsets, counts, grid_x, grid_y, TILE, CHUNK, False)
    color = tiles[:, :, 0:3]
    final_t = tiles[:, :, 3]
    color = color + final_t[:, :, None] * bg[None, None, :]
    color = color.reshape(grid_y, grid_x, TILE, TILE, 3)
    color = jnp.transpose(color, (4, 0, 2, 1, 3)).reshape(3, grid_y * TILE, grid_x * TILE)
    return jnp.mean(color ** 2)


timeit("kernel + assembly (feat precomputed)", kern_plus_assembly, feat0)
