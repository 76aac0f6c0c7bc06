#!/usr/bin/env python
"""A/B the kernel matmul precision (HIGHEST=6-pass vs HIGH=3-pass bf16) on
the real TPU: bwd kernel time + grad parity vs the HIGHEST baseline."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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


def timeit(fn, x, iters=4):
    @jax.jit
    def chained(k, x):
        def body(i, acc):
            return acc + fn(x * (1.0 + 1e-12 * i), i)

        return jax.lax.fori_loop(0, k, body, 0.0)

    _ = float(chained(1, x))
    t1 = time.perf_counter(); _ = float(chained(1, x)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, x)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


def blend_loss(xy, i):
    c, ft = pb.render_tiles_pallas(
        xy, prep.conics, prep.rgb, prep.opacities, b, grid_x, grid_y, TILE, bg
    )
    return jnp.mean(c ** 2)


def grad_once(xy):
    return jax.jit(jax.grad(lambda m: blend_loss(m, 0)))(xy)


results = {}
for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                   ("DEFAULT", jax.lax.Precision.DEFAULT)]:
    pb._EXACT = prec
    dt = timeit(lambda xy, i: jnp.mean(jax.grad(blend_loss)(xy, i)[:, 0]),
                prep.means2d)
    g = np.asarray(grad_once(prep.means2d))
    results[name] = g
    ref = results["HIGHEST"]
    scale = np.abs(ref).max()
    print(f"{name:8s} blend fwd+bwd {dt*1e3:8.2f} ms   "
          f"max|g-g_HIGHEST|/max|g| = {np.abs(g - ref).max() / scale:.3e}",
          flush=True)
