#!/usr/bin/env python
"""Fine-grained timing of backward-pass components at 1080p on TPU.

Isolates: feature gather, fwd kernel alone, bwd kernel alone, the
scatter-free gradient reduction (sort + gather + cumsum-difference), and
sort costs — each timed with the chained-fori_loop protocol on
precomputed inputs.
"""
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
P = TILE * TILE

prep = jax.jit(lambda m: preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE))(means)
b = jax.jit(lambda: binning_ops.bin_gaussians(prep, grid_x, grid_y, MAXI))()
feat_soa = jax.jit(
    lambda: pb._sorted_features(
        prep.means2d, prep.conics, prep.rgb, prep.opacities, b.gauss_id, CHUNK
    )
)()
counts = (b.offsets[1:] - b.offsets[:-1]).astype(jnp.int32)
gaoff = pb.grad_region_offsets(b.offsets, CHUNK)
feat_soa, counts, gaoff, b = jax.block_until_ready((feat_soa, counts, gaoff, b))
fwd_out = jax.jit(
    lambda f: pb._fwd_call(f, b.offsets, counts, grid_x, grid_y, TILE, CHUNK, False)
)(feat_soa)
fwd_out = jax.block_until_ready(fwd_out)
gimg = jnp.ones_like(fwd_out) * 0.1
K = feat_soa.shape[1]
print(f"instances={int(b.num_instances)} K={K}", flush=True)


def timeit(name, fn, x, iters=4):
    @jax.jit
    def chained(k, x):
        def body(i, acc):
            return acc + fn(x * (1.0 + 1e-12 * i) if x.dtype == jnp.float32 else x, i)

        return jax.lax.fori_loop(0, k, body, 0.0)

    _ = float(chained(1, x))
    t1 = time.perf_counter(); _ = float(chained(1, x)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, x)); t2 = time.perf_counter() - t2
    dt = max((t2 - t1) / iters, 1e-9)
    print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)
    return dt


timeit("feat_gather(_sorted_feats)", lambda m, i: jnp.mean(
    pb._sorted_features(m, prep.conics, prep.rgb, prep.opacities, b.gauss_id, CHUNK)[0]
), prep.means2d)

timeit("fwd_kernel", lambda f, i: jnp.mean(
    pb._fwd_call(f, b.offsets, counts, grid_x, grid_y, TILE, CHUNK, False)
), feat_soa)

timeit("bwd_kernel", lambda f, i: jnp.mean(
    pb._bwd_call(f, b.offsets, counts, gaoff, gimg, fwd_out,
                 grid_x, grid_y, TILE, CHUNK, False)
), feat_soa)

# gradient reduction alone on a dummy dfeat
s_grad = K + num_tiles * CHUNK
dfeat = jnp.broadcast_to(jnp.arange(s_grad, dtype=jnp.float32) * 1e-9, (pb.FEAT, s_grad))
dfeat = jax.block_until_ready(dfeat + 0.0)
chunks_done = fwd_out[:, 0, 4].astype(jnp.int32)


def reduce_fn(df, i):
    # mirrors _blend_bwd's reduction exactly (gid-key payload sort)
    s_ax = df.shape[1]
    live = jnp.arange(s_ax) < gaoff[-1]
    key = jnp.where(live, df[pb.GID_ROW], jnp.inf)
    sorted_ = jax.lax.sort((key,) + tuple(df[j] for j in range(9)), num_keys=1)
    rows = jnp.stack(sorted_[1:], axis=0)
    csum = jnp.concatenate(
        [jnp.zeros((9, 1), jnp.float32), jnp.cumsum(rows, axis=1)], axis=1
    )
    n = b.gauss_start.shape[0]
    last = b.gauss_start[n - 1: n] + b.gauss_count[n - 1: n]
    pos = jnp.minimum(jnp.concatenate([b.gauss_start, last]), b.offsets[-1])
    at_bounds = jnp.take(csum, pos, axis=1)
    return jnp.sum(jnp.abs(at_bounds[:, 1:] - at_bounds[:, :-1]))


timeit("grad_reduce(sort+cumsum)", reduce_fn, dfeat)

timeit("binning", lambda m, i: jnp.mean(
    binning_ops.bin_gaussians(
        prep._replace(means2d=m), grid_x, grid_y, MAXI
    ).gauss_id.astype(jnp.float32)
), prep.means2d)
