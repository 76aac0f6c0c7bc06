#!/usr/bin/env python
"""Ablation microbenchmark of the BACKWARD blend kernel: cumulative variants
locate the per-chunk cost (alpha recompute, scans, moment matmuls, DMA)."""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend as pb
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
PIXELS = TILE * TILE
prep = jax.jit(lambda m: preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE))(means)
b = jax.jit(lambda: binning_ops.bin_gaussians(
    prep, grid_x, grid_y, MAXI, max_live=MAXL))()
prep, b = jax.block_until_ready((prep, b))
counts = (b.offsets[1:] - b.offsets[:-1]).astype(jnp.int32)
feat_soa = jax.block_until_ready(jax.jit(lambda xy: pb._sorted_features(
    xy, prep.conics, prep.rgb, prep.opacities, b.gauss_id, CHUNK))(prep.means2d))
fwd_out = jax.block_until_ready(jax.jit(lambda f: pb._fwd_call(
    f, b.offsets, counts, grid_x, grid_y, TILE, CHUNK, False))(feat_soa))
gaoff = jax.block_until_ready(jax.jit(
    lambda: pb.grad_region_offsets(b.offsets, CHUNK))())
gimg = jnp.ones((num_tiles, PIXELS, pb.OUTC), jnp.float32) * 1e-3


def make_bwd(variant):
    def kernel(off_ref, counts_ref, gaoff_ref, feat_hbm, gimg_ref, fwdout_ref,
               dfeat_hbm, fbuf, dbuf, sem, outsem):
        t = pl.program_id(0)
        o = off_ref[t]
        n = counts_ref[t]
        start = (o // CHUNK) * CHUNK
        n_chunks = jnp.where(n > 0, pl.cdiv(o + n - start, CHUNK), 0)
        gbase = gaoff_ref[t]
        px, py = pb._pixel_coords(t, grid_x, PIXELS, TILE)
        gr = gimg_ref[0, :, 0:1]
        gg = gimg_ref[0, :, 1:2]
        gb = gimg_ref[0, :, 2:3]
        gT_ext = gimg_ref[0, :, 3:4]
        final_t = fwdout_ref[0, :, 3:4]
        n_chunks_done = fwdout_ref[0, 0, 4].astype(jnp.int32)
        log_final_t = fwdout_ref[0, :, 5:6]

        def dma_in(slot, ci):
            off = pl.multiple_of(start + ci * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(off, CHUNK)], fbuf.at[slot], sem.at[slot])

        def grad_dma(slot, ci):
            off = pl.multiple_of(gbase + ci * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                dbuf.at[slot], dfeat_hbm.at[:, pl.ds(off, CHUNK)], outsem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            dma_in((n_chunks - 1) % 2, n_chunks - 1).start()

        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        ox = ((t % grid_x) * TILE).astype(jnp.float32)
        oy = ((t // grid_x) * TILE).astype(jnp.float32)
        moment_m = pb._moment_matrix(px - ox, py - oy, PIXELS)
        cot_m = jnp.concatenate([gr, gg, gb], axis=1)
        blk = min(CHUNK, pb._SCAN_BLK)
        prefix_m = pb._prefix_excl_matrix(blk)
        suffix_m = pb._suffix_excl_matrix(blk)

        def body(i, carry):
            ci = n_chunks - 1 - i
            slot = i % 2

            @pl.when(ci > 0)
            def _():
                dma_in((ci - 1) % 2, ci - 1).start()

            @pl.when(i >= 2)
            def _():
                grad_dma(slot, ci + 2).wait()

            dma_in(ci % 2, ci).wait()
            f = fbuf[ci % 2]
            ids = start + ci * CHUNK + lane_ids
            lane_valid = (ids >= o) & (ids < o + n)
            logT_after, S = carry

            if variant == "dma_only":
                dbuf[slot, 0:pb.GID_ROW, :] = jnp.broadcast_to(
                    jnp.sum(f[0:1, :]), (pb.GID_ROW, CHUNK))
            else:
                alpha, alpha_raw, g, power, keep = pb._alpha_terms(
                    f, px, py, ids, o, o + n)
                om = 1.0 - alpha
                lom = jnp.log(om)
                if variant in ("no_scans", "no_scans_no_mom"):
                    s = lom * 0.5
                    tot = lom[:, -1:]
                    suf_ex = lom * 0.25
                    suf_tot = lom[:, 0:1]
                else:
                    s, tot = pb._prefix_scan(lom, prefix_m, blk)
                logT_before = logT_after - tot
                T_i = jnp.exp(logT_before + s)
                w = alpha * T_i
                G_rgb = (gr * f[5:6, :] + gg * f[6:7, :]) + gb * f[7:8, :]
                u = G_rgb * w
                if variant not in ("no_scans", "no_scans_no_mom"):
                    suf_ex, suf_tot = pb._suffix_scan(u, suffix_m, blk)
                S_i = S + suf_ex
                d_alpha = T_i * G_rgb - S_i / om
                d_power_px = jnp.where(
                    keep & (alpha_raw < pb.ALPHA_MAX), d_alpha * alpha_raw, 0.0)
                if variant in ("no_mom", "no_scans_no_mom"):
                    red = jnp.sum(d_power_px, axis=0, keepdims=True)
                    for j in range(9):
                        dbuf[slot, j:j + 1, :] = red * (j + 1.0)
                else:
                    mom = pb._dot_sub(moment_m, d_power_px)
                    m0, mx, my, mxx, mxy, myy = (
                        mom[j:j + 1, :] for j in range(6))
                    x_c = f[0:1, :] - ox
                    y_c = f[1:2, :] - oy
                    ca = f[2:3, :]
                    cb = f[3:4, :]
                    cc = f[4:5, :]
                    e_x = x_c * m0 - mx
                    e_y = y_c * m0 - my
                    e_xx = x_c * x_c * m0 - 2.0 * x_c * mx + mxx
                    e_xy = x_c * y_c * m0 - x_c * my - y_c * mx + mxy
                    e_yy = y_c * y_c * m0 - 2.0 * y_c * my + myy
                    wmom = pb._dot3_sub(cot_m, w)
                    dbuf[slot, 0:1, :] = -(ca * e_x + cb * e_y)
                    dbuf[slot, 1:2, :] = -(cc * e_y + cb * e_x)
                    dbuf[slot, 2:3, :] = -0.5 * e_xx
                    dbuf[slot, 3:4, :] = -e_xy
                    dbuf[slot, 4:5, :] = -0.5 * e_yy
                    dbuf[slot, 5:8, :] = wmom
                    dbuf[slot, 8:9, :] = m0 / jnp.maximum(f[8:9, :], 1e-30)
                S = S + suf_tot
                logT_after = logT_before

            dbuf[slot, pb.GID_ROW:pb.GID_ROW + 1, :] = jnp.where(
                lane_valid, f[pb.GID_ROW:pb.GID_ROW + 1, :], jnp.float32(jnp.inf))
            dbuf[slot, pb.GID_ROW + 1:pb.FEAT, :] = jnp.zeros(
                (pb.FEAT - pb.GID_ROW - 1, CHUNK), jnp.float32)
            grad_dma(slot, ci).start()
            return logT_after, S

        S0 = gT_ext * final_t
        jax.lax.fori_loop(0, n_chunks, body, (log_final_t, S0))

        @pl.when(n_chunks >= 1)
        def _():
            grad_dma((n_chunks - 1) % 2, 0).wait()

        @pl.when(n_chunks >= 2)
        def _():
            grad_dma((n_chunks - 2) % 2, 1).wait()

    s_grad = feat_soa.shape[1] + num_tiles * CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, PIXELS, pb.OUTC), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIXELS, pb.OUTC), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, pb.FEAT, CHUNK), jnp.float32),
            pltpu.VMEM((2, pb.FEAT, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((pb.FEAT, s_grad), jnp.float32),
        grid_spec=grid_spec,
        interpret=False,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
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
    print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)
    return dt


for variant in ["full", "no_mom", "no_scans_no_mom", "dma_only"]:
    call = make_bwd(variant)

    def run(f, i, call=call):
        d = call(b.offsets, counts, gaoff, f, gimg, fwd_out)
        return jnp.sum(d[0, ::509])

    timeit(variant, run, feat_soa)
