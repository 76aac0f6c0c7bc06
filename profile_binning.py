#!/usr/bin/env python
"""Break down bin_gaussians cost at 1080p/300k gaussians, plus row-gather
cost-model experiments (per-row vs per-byte)."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
from tests.helpers import make_camera, make_random_gaussians

W, H, N = 1920, 1088, 300_000
TILE = 32
MAXI = 1 << 21
cam = make_camera(W, H, cam_z=-5.0)
means, scales, quats, op, sh = make_random_gaussians(
    N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0)
)
grid_x, grid_y = -(-W // TILE), -(-H // TILE)
prep = jax.jit(lambda m: preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE))(means)
prep = jax.block_until_ready(prep)


def timeit(name, fn, x, iters=4):
    @jax.jit
    def chained(k, x):
        def body(i, acc):
            return acc + fn(x + i, i)
        return jax.lax.fori_loop(0, k, body, 0.0)

    _ = float(chained(1, x))
    t1 = time.perf_counter(); _ = float(chained(1, x)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, x)); t2 = time.perf_counter() - t2
    dt = max((t2 - t1) / iters, 1e-9)
    print(f"{name:40s} {dt*1e3:9.2f} ms", flush=True)
    return dt


zero = jnp.zeros((), jnp.int32)

# full binning
def full_bin(z, i):
    tt = prep.tiles_touched + z * 0
    p = prep._replace(tiles_touched=tt)
    b = binning_ops.bin_gaussians(p, grid_x, grid_y, MAXI, tile_px=TILE)
    return jnp.sum(b.offsets[::17].astype(jnp.float32))

timeit("full bin_gaussians", full_bin, zero)

tiles = prep.tiles_touched.astype(jnp.int32)
cum = jnp.cumsum(tiles)
excl = cum - tiles

# stage: mark + cumsum for slot->gaussian
def stage_mark(z, i):
    mark = jnp.zeros(MAXI, jnp.int32).at[excl + z].add(1, mode="drop")
    g = jnp.cumsum(mark) - 1
    return jnp.sum(g[::129].astype(jnp.float32))

timeit("mark scatter + cumsum (K)", stage_mark, zero)

# stage: attrs row gather (K, 8)
attrs8 = jnp.stack([excl] * 8, axis=1)
gidx = jnp.clip(jnp.arange(MAXI) * 7 % N, 0, N - 1).astype(jnp.int32)

def stage_gather8(z, i):
    a = attrs8[gidx + z]
    return jnp.sum(a[::129, 0].astype(jnp.float32))

timeit("attrs row gather (K,8) int32", stage_gather8, zero)

attrs5 = attrs8[:, :5]
def stage_gather5(z, i):
    a = attrs5[gidx + z]
    return jnp.sum(a[::129, 0].astype(jnp.float32))

timeit("attrs row gather (K,5) int32", stage_gather5, zero)

attrs16 = jnp.concatenate([attrs8, attrs8], axis=1)
def stage_gather16(z, i):
    a = attrs16[gidx + z]
    return jnp.sum(a[::129, 0].astype(jnp.float32))

timeit("attrs row gather (K,16) int32", stage_gather16, zero)

# 1D gather for comparison
vec = jnp.arange(N, dtype=jnp.float32)
def stage_gather1(z, i):
    a = vec[gidx + z]
    return jnp.sum(a[::129])

timeit("1D gather (K,) f32", stage_gather1, zero)

# stage: the packed-key sort
rank = jnp.arange(N, dtype=jnp.int32)
rank_bits = max(1, (N - 1).bit_length())
g_of = jnp.clip(gidx, 0, N - 1)
tile_rand = (jnp.arange(MAXI, dtype=jnp.uint32) * jnp.uint32(2654435761)).astype(jnp.int32) % (grid_x * grid_y)

def stage_sort(z, i):
    key = ((tile_rand + z) << rank_bits) | rank[g_of]
    ks, gs = jax.lax.sort((key, g_of), num_keys=1)
    return jnp.sum(gs[::129].astype(jnp.float32))

timeit("packed-key sort (key,g) K", stage_sort, zero)

# stage: searchsorted offsets
tile_sorted = jnp.sort(tile_rand)
def stage_ss(z, i):
    off = jnp.searchsorted(
        tile_sorted + z, jnp.arange(grid_x * grid_y + 1, dtype=jnp.int32), side="left"
    )
    return jnp.sum(off.astype(jnp.float32))

timeit("searchsorted offsets (T+1)", stage_ss, zero)
