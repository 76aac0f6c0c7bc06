#!/usr/bin/env python
"""Targeted optimization experiments on the 1080p blend path:
(a) _sorted_features gather cost, (b) fwd kernel precision variants,
(c) grad-reduce restructuring candidates (light sort + row gather vs the
current 10-payload sort)."""
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
num_tiles = grid_x * grid_y

prep = jax.jit(lambda m: preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE))(means)
b = jax.jit(lambda: binning_ops.bin_gaussians(prep, grid_x, grid_y, MAXI))()
prep, b = jax.block_until_ready((prep, b))
K = b.gauss_id.shape[0]
counts = (b.offsets[1:] - b.offsets[:-1]).astype(jnp.int32)
print(f"instances={int(b.num_instances)} K={K}", flush=True)


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
    print(f"{name:38s} {dt*1e3:9.2f} ms", flush=True)
    return dt


# (a) sorted-features gather alone
def gather_fn(xy, i):
    f = pb._sorted_features(xy, prep.conics, prep.rgb, prep.opacities, b.gauss_id, CHUNK)
    return jnp.sum(f[:, ::257])

timeit("(a) _sorted_features gather", gather_fn, prep.means2d)

feat_soa = jax.jit(
    lambda: pb._sorted_features(
        prep.means2d, prep.conics, prep.rgb, prep.opacities, b.gauss_id, CHUNK
    )
)()
feat_soa = jax.block_until_ready(feat_soa)


# (b) fwd kernel alone under different precisions
def fwd_only(f, i):
    out = pb._fwd_call(f, b.offsets, counts, grid_x, grid_y, TILE, CHUNK, False)
    return jnp.sum(out[:, ::31, 0])

for prec in ("HIGHEST", "DEFAULT"):
    pb._EXACT = getattr(jax.lax.Precision, prec)
    timeit(f"(b) fwd kernel prec={prec}", fwd_only, feat_soa)
pb._EXACT = jax.lax.Precision.HIGHEST

# (c) grad-reduce variants. Input: dfeat (FEAT, S) as the bwd kernel writes.
gaoff = pb.grad_region_offsets(b.offsets, CHUNK)
s_grad = K + num_tiles * CHUNK
key0 = jax.random.PRNGKey(1)
dfeat = jax.random.normal(key0, (pb.FEAT, s_grad), jnp.float32)
# simulate gid row: region position -> sorted index -> gid
tile_of = jnp.cumsum(jnp.zeros(s_grad, jnp.int32).at[gaoff[:-1]].add(1)) - 1
align = (b.offsets[:-1] // CHUNK) * CHUNK
sorted_idx = align[tile_of] + (jnp.arange(s_grad, dtype=jnp.int32) - gaoff[tile_of])
inrange = (sorted_idx >= b.offsets[tile_of]) & (sorted_idx < b.offsets[tile_of + 1])
gid_f = jnp.where(inrange, b.gauss_id[jnp.clip(sorted_idx, 0, K - 1)].astype(jnp.float32), jnp.inf)
dfeat = dfeat.at[pb.GID_ROW].set(gid_f)
dfeat = jax.block_until_ready(dfeat)

n = b.gauss_start.shape[0]
last = b.gauss_start[n - 1: n] + b.gauss_count[n - 1: n]
pos = jnp.minimum(jnp.concatenate([b.gauss_start, last]), b.offsets[-1])


def reduce_current(df, i):
    s_ax = df.shape[1]
    live = jnp.arange(s_ax) < gaoff[-1]
    key = jnp.where(live, df[pb.GID_ROW], jnp.inf)
    sorted_ = jax.lax.sort((key,) + tuple(df[j] for j in range(9)), num_keys=1)
    rows = jnp.stack(sorted_[1:], axis=0)
    csum = jnp.concatenate(
        [jnp.zeros((9, 1), jnp.float32), jnp.cumsum(rows, axis=1)], axis=1
    )
    at_bounds = jnp.take(csum, pos, axis=1)
    return jnp.sum(jnp.abs(at_bounds[:, 1:] - at_bounds[:, :-1]))

timeit("(c0) reduce current 10-payload sort", reduce_current, dfeat)


def reduce_light(df, i):
    """Sort only (gid, region_pos), then ONE row gather of the transposed
    grads, cumsum on sublanes via transpose."""
    s_ax = df.shape[1]
    live = jnp.arange(s_ax) < gaoff[-1]
    key = jnp.where(live, df[pb.GID_ROW], jnp.inf)
    _, perm = jax.lax.sort((key, jnp.arange(s_ax, dtype=jnp.int32)), num_keys=1)
    rows_t = df[:9].T[perm]  # (S, 9) row gather in gid order
    csum = jnp.concatenate(
        [jnp.zeros((1, 9), jnp.float32), jnp.cumsum(rows_t, axis=0)], axis=0
    )
    at_bounds = csum[pos]  # (N+1, 9) row gather
    return jnp.sum(jnp.abs(at_bounds[1:] - at_bounds[:-1]))

timeit("(c1) reduce light sort + row gather", reduce_light, dfeat)


def reduce_sortonly(df, i):
    s_ax = df.shape[1]
    live = jnp.arange(s_ax) < gaoff[-1]
    key = jnp.where(live, df[pb.GID_ROW], jnp.inf)
    _, perm = jax.lax.sort((key, jnp.arange(s_ax, dtype=jnp.int32)), num_keys=1)
    return jnp.sum(perm[::63].astype(jnp.float32))

timeit("(c2) 2-payload sort alone", reduce_sortonly, dfeat)


def rowgather_only(df, i):
    idx = jnp.arange(df.shape[1] - 1, -1, -1, dtype=jnp.int32)
    rows_t = df[:9].T[idx]
    return jnp.sum(rows_t[::63, 0])

timeit("(c3) (S,9) row gather alone", rowgather_only, dfeat)


def cumsum_lanes(df, i):
    csum = jnp.cumsum(df[:9], axis=1)
    return jnp.sum(csum[:, ::63])

timeit("(c4) lane cumsum (9,S) alone", cumsum_lanes, dfeat)


def cumsum_rows(df, i):
    csum = jnp.cumsum(df[:9].T, axis=0)
    return jnp.sum(csum[::63, 0])

timeit("(c5) sublane cumsum (S,9) alone", cumsum_rows, dfeat)
