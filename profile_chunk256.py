#!/usr/bin/env python
"""CHUNK=256 vs 128 for both kernels (halves chunk-loop iterations at the
cost of coarser early-exit), plus fovea_step0 sub-stage timing."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import amr as amr_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend as pb
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
from tests.helpers import make_camera, make_random_gaussians

W, H, N = 1920, 1088, 300_000
TILE = 32
MAXI = (1 << 20) + (1 << 19) + (1 << 16)
MAXL = (1 << 20) + (1 << 18) + (1 << 17)
GX, GY = -(-W // TILE), -(-H // TILE)
NT = GX * GY


def timeit(fn, *args, iters=8):
    @jax.jit
    def chained(k, *args):
        def body(i, acc):
            out = fn(*args, i)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l[..., -1:].astype(jnp.float32))
                             for l in leaves)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    _ = float(chained(1, *args))
    t1 = time.perf_counter(); _ = float(chained(1, *args)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, *args)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


def main():
    cam = make_camera(W, H, cam_z=-5.0)
    means, scales, quats, op, sh = make_random_gaussians(
        N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0))
    bg = jnp.zeros(3)
    prep = jax.jit(lambda m: preprocess(m, scales, quats, op, sh, 3, cam,
                                        tile=TILE))(means)
    si = jax.jit(lambda p: binning_ops.build_sorted_instances(
        p.means2d, p.conics, p.rgb, p.opacities, p.tiles_touched,
        p.rect_min, p.rect_max, p.cull_thr, p.depths, GX, GY, MAXI,
        tile_px=TILE, max_live=MAXL))(prep)
    offsets = si.binning.offsets
    counts = (offsets[1:] - offsets[:-1]).astype(jnp.int32)

    for chunk in (128, 256):
        feat_soa = jax.jit(lambda fr, c=chunk: pb._feat_soa_from_rows(fr, c))(
            si.feat_rows)
        gaoff = jax.jit(lambda o, c=chunk: pb.grad_region_offsets(o, c))(offsets)
        jax.block_until_ready((feat_soa, gaoff))

        t = timeit(lambda fs, o_, c_, i, c=chunk: pb._fwd_call(
            fs * (1 + 1e-12 * i), o_, c_, GX, GY, TILE, c, False),
            feat_soa, offsets, counts)
        print(f"fwd  chunk={chunk}: {t*1e3:8.3f} ms", flush=True)

        fwd_out = jax.jit(lambda fs, o_, c_, c=chunk: pb._fwd_call(
            fs, o_, c_, GX, GY, TILE, c, False))(feat_soa, offsets, counts)
        g_out = jax.jit(lambda tl: jax.grad(lambda x: jnp.mean(
            pb._assemble_tiles(x, GX, GY, TILE, bg)[0][:, :H, :W] ** 2))(tl))(
            fwd_out)
        jax.block_until_ready((fwd_out, g_out))
        t = timeit(lambda fs, o_, c_, ga, go, fo, i, c=chunk: pb._bwd_call(
            fs * (1 + 1e-12 * i), o_, c_, ga, go, fo, GX, GY, TILE, c, False),
            feat_soa, offsets, counts, gaoff, g_out, fwd_out)
        print(f"bwd  chunk={chunk}: {t*1e3:8.3f} ms", flush=True)

    # fovea_step0 decomposition: bin vs levels vs feat_soa pad
    def s_bin(m, i):
        p = preprocess(m * (1 + 1e-12 * i), scales, quats, op, sh, 3, cam,
                       tile=TILE)
        si2 = binning_ops.build_sorted_instances(
            p.means2d, p.conics, p.rgb, p.opacities, p.tiles_touched,
            p.rect_min, p.rect_max, p.cull_thr, p.depths, GX, GY, 1 << 20,
            tile_px=TILE)
        return (si2.feat_rows[0], si2.binning.offsets)

    t = timeit(s_bin, means, iters=4)
    print(f"step0.preprocess+bin(cap 1M): {t*1e3:8.3f} ms", flush=True)

    def s_step0(m, i):
        st = amr_ops.fovea_step0(
            m * (1 + 1e-12 * i), scales, quats, op, sh, 3, cam,
            max_instances=1 << 20)
        return (st.feat_soa[0], st.tile_levels)

    t = timeit(s_step0, means, iters=4)
    print(f"step0.full:                   {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
