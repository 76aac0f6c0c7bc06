#!/usr/bin/env python
"""Compare fwd / fwd+bwd throughput of the full rasterizer at tile=32 vs 16.

Also reports the duplicated-instance count per tile size (binning growth).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
from tests.helpers import make_camera, make_random_gaussians

W, H, N = 1920, 1088, 300_000
cam = make_camera(W, H, cam_z=-5.0)
means, scales, quats, op, sh = make_random_gaussians(
    N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0)
)
bg = jnp.zeros(3)
impl = "pallas" if jax.default_backend() == "tpu" else "jnp"


def timeit(f, *args):
    g = jax.jit(f)
    _ = jax.block_until_ready(g(1, *args))
    t1 = time.perf_counter(); jax.block_until_ready(g(1, *args)); t1 = time.perf_counter() - t1
    it = 4
    t2 = time.perf_counter(); jax.block_until_ready(g(1 + it, *args)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / it, 1e-9)


for tile, maxi in [(32, 1 << 21), (16, 1 << 22)]:
    kw = dict(sh_degree=3, tile=tile, max_instances=maxi, max_per_tile=2048, impl=impl)

    out = rast.rasterize(means, scales, quats, op, sh, cam, bg, **kw)
    ni = int(out.num_instances)
    ov = bool(out.overflow)

    def fwd_loss(m):
        o = rast.rasterize(m, scales, quats, op, sh, cam, bg, **kw)
        return jnp.mean(o.color ** 2)

    grad1 = jax.grad(fwd_loss)

    def chained_fwd(k, m):
        def body(i, acc):
            return acc + fwd_loss(m * (1.0 + 1e-12 * i))
        return jax.lax.fori_loop(0, k, body, 0.0)

    def chained_bwd(k, m):
        def body(i, acc):
            return acc + jnp.mean(grad1(m * (1.0 + 1e-12 * i)))
        return jax.lax.fori_loop(0, k, body, 0.0)

    t_f = timeit(chained_fwd, means)
    t_b = timeit(chained_bwd, means)
    print(
        f"tile={tile:2d} instances={ni} overflow={ov} "
        f"fwd {t_f*1e3:7.2f} ms ({W*H/t_f/1e6:7.2f} Mpix/s)  "
        f"fwd+bwd {t_b*1e3:7.2f} ms ({W*H/t_b/1e6:7.2f} Mpix/s)"
    )
