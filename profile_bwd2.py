#!/usr/bin/env python
"""Account every ms of the 1080p fwd+bwd step: blend-only grad, grad-reduce
(telescoping-defeated), preprocess grad, full rasterize grad."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend as pb
from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
from tests.helpers import make_camera, make_random_gaussians

W, H, N = 1920, 1088, 300_000
TILE, CHUNK = 32, 128
MAXI = (1 << 20) + (1 << 19) + (1 << 16)
MAXL = (1 << 20) + (1 << 18) + (1 << 17)
cam = make_camera(W, H, cam_z=-5.0)
means, scales, quats, op, sh = make_random_gaussians(
    N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0)
)
grid_x, grid_y = -(-W // TILE), -(-H // TILE)
num_tiles = grid_x * grid_y
bg = jnp.zeros(3)

prep = jax.jit(lambda m: preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE))(means)
b = jax.jit(lambda: binning_ops.bin_gaussians(prep, grid_x, grid_y, MAXI, max_live=MAXL))()
prep, b = jax.block_until_ready((prep, b))
K = b.gauss_id.shape[0]
print(f"instances={int(b.num_instances)} overflow={bool(b.overflow)} K={K}",
      flush=True)


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
    print(f"{name:30s} {dt*1e3:9.2f} ms", flush=True)
    return dt


# 1. blend-only fwd+bwd (gather + fwd kernel + bwd kernel + grad reduce)
def blend_loss(xy, i):
    c, ft = pb.render_tiles_pallas(
        xy, prep.conics, prep.rgb, prep.opacities, b, grid_x, grid_y, TILE, bg
    )
    return jnp.mean(c ** 2)


timeit("blend fwd only", lambda xy, i: blend_loss(xy, i), prep.means2d)
timeit("blend fwd+bwd", lambda xy, i: jnp.mean(jax.grad(blend_loss)(xy, i)[:, 0]),
       prep.means2d)

# 2. grad reduce standalone, telescoping defeated via abs
counts = (b.offsets[1:] - b.offsets[:-1]).astype(jnp.int32)
gaoff = pb.grad_region_offsets(b.offsets, CHUNK)
feat_soa = jax.jit(
    lambda: pb._sorted_features(
        prep.means2d, prep.conics, prep.rgb, prep.opacities, b.gauss_id, CHUNK
    )
)()
fwd_out = jax.jit(
    lambda f: pb._fwd_call(f, b.offsets, counts, grid_x, grid_y, TILE, CHUNK, False)
)(feat_soa)
fwd_out = jax.block_until_ready(fwd_out)
chunks_done = fwd_out[:, 0, 4].astype(jnp.int32)
s_grad = K + num_tiles * CHUNK
dfeat = jnp.broadcast_to(
    jnp.arange(s_grad, dtype=jnp.float32)[None, :] * 1e-9, (pb.FEAT, s_grad)
) + 0.0
dfeat = jax.block_until_ready(dfeat)


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


timeit("grad_reduce (abs-defended)", reduce_fn, dfeat)

# 3. preprocess fwd+bwd alone
def prep_loss(m, i):
    p = preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE)
    return jnp.mean(p.means2d ** 2) + jnp.mean(p.rgb ** 2) + jnp.mean(p.conics ** 2)


timeit("preprocess fwd+bwd", lambda m, i: jnp.mean(jax.grad(prep_loss)(m, i)[:, 0]),
       means)

# 4. full rasterize fwd+bwd (reference total)
def full_loss(m, i):
    out = rast.rasterize(
        m, scales, quats, op, sh, cam, bg, sh_degree=3,
        max_instances=MAXI, max_live=MAXL, max_per_tile=2048, impl="pallas",
    )
    return jnp.mean(out.color ** 2)


timeit("full rasterize fwd+bwd",
       lambda m, i: jnp.mean(jax.grad(full_loss)(m, i)[:, 0]), means)
