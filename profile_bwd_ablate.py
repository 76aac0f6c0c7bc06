#!/usr/bin/env python
"""Ablate the bwd kernel: which of its matmul/VPU stages cost what.
Modes strip or re-precision one stage each; timing-only (outputs unused)."""
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
GX, GY = -(-W // TILE), -(-H // TILE)
NT = GX * GY
P_PIX = TILE * TILE


def timeit(fn, *args, iters=8):
    @jax.jit
    def chained(k, *args):
        def body(i, acc):
            out = fn(*args, i)
            return acc + jnp.sum(out[..., -1:].astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    _ = float(chained(1, *args))
    t1 = time.perf_counter(); _ = float(chained(1, *args)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, *args)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


def make_bwd(mode, chunk=CHUNK):
    def kernel(off_ref, counts_ref, gaoff_ref, feat_hbm, gimg_ref, fwdout_ref,
               dfeat_hbm, fbuf, dbuf, sem, outsem):
        t = pl.program_id(0)
        o = off_ref[t]
        n = counts_ref[t]
        start = (o // chunk) * chunk
        n_chunks = jnp.where(n > 0, pl.cdiv(o + n - start, chunk), 0)
        gbase = gaoff_ref[t]
        px, py = pb._pixel_coords(t, GX, P_PIX, TILE)
        gr = gimg_ref[0, :, 0:1]
        gg = gimg_ref[0, :, 1:2]
        gb = gimg_ref[0, :, 2:3]
        gT_ext = gimg_ref[0, :, 3:4]
        final_t = fwdout_ref[0, :, 3:4]
        n_chunks_done = fwdout_ref[0, 0, 4].astype(jnp.int32)
        log_final_t = fwdout_ref[0, :, 5:6]

        def dma_in(slot, ci):
            off = pl.multiple_of(start + ci * chunk, chunk)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(off, chunk)], fbuf.at[slot], sem.at[slot])

        def grad_dma(slot, ci):
            off = pl.multiple_of(gbase + ci * chunk, chunk)
            return pltpu.make_async_copy(
                dbuf.at[slot], dfeat_hbm.at[:, pl.ds(off, chunk)],
                outsem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            dma_in((n_chunks - 1) % 2, n_chunks - 1).start()

        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        ox = ((t % GX) * TILE).astype(jnp.float32)
        oy = ((t // GX) * TILE).astype(jnp.float32)
        pxl, pyl = px - ox, py - oy
        moment_m = jnp.concatenate(
            [jnp.ones((P_PIX, 1), jnp.float32), pxl, pyl, pxl * pxl,
             pxl * pyl, pyl * pyl], axis=1)
        cot_m = jnp.concatenate([gr, gg, gb], axis=1)
        blk = min(chunk, 128)
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
            ids = start + ci * chunk + lane_ids
            lane_valid = (ids >= o) & (ids < o + n)

            logT_after, S = carry
            if mode == "dma_only":
                dbuf[slot, 0:pb.FEAT, :] = f * 1e-20
                grad_dma(slot, ci).start()
                return logT_after, S
            alpha, alpha_raw, power, keep = pb._alpha_terms(
                f, px, py, ids, o, o + n)
            om = 1.0 - alpha
            lom = jnp.log(om)
            if mode == "no_prefix":
                s = lom
                tot = lom[:, -1:]
            else:
                s, tot = pb._prefix_scan(lom, prefix_m, blk)
            logT_before = logT_after - tot
            T_i = jnp.exp(logT_before + s)
            w = alpha * T_i
            G_rgb = (gr * f[5:6, :] + gg * f[6:7, :]) + gb * f[7:8, :]
            u = G_rgb * w
            if mode == "no_suffix":
                suf_ex = u
                suf_tot = u[:, 0:1]
            else:
                suf_ex, suf_tot = pb._suffix_scan(u, suffix_m, blk)
            S_i = S + suf_ex
            d_alpha = T_i * G_rgb - S_i / om
            d_power_px = jnp.where(
                keep & (alpha_raw < pb.ALPHA_MAX), d_alpha * alpha_raw, 0.0)
            if mode == "no_mom":
                mom = jnp.zeros((6, chunk), jnp.float32) + d_power_px[0:6, :]
            elif mode == "mom3":
                mom = pb._dot3_sub(moment_m, d_power_px)
            elif mode == "momT":
                pxl_t, pyl_t = pb._pixel_coords_T(t, GX, P_PIX, TILE)
                moment_mT = pb._moment_matrix_T(pxl_t, pyl_t, P_PIX)
                mom = pb._dot(moment_mT, d_power_px)
            elif mode == "momT3":
                pxl_t, pyl_t = pb._pixel_coords_T(t, GX, P_PIX, TILE)
                moment_mT = pb._moment_matrix_T(pxl_t, pyl_t, P_PIX)
                mom = pb._dot3(moment_mT, d_power_px, (((1,), (0,)), ((), ())))
            elif mode == "mom_vpu":
                d = d_power_px
                red = lambda x: jnp.sum(x, axis=0, keepdims=True)
                mom = jnp.concatenate([
                    red(d), red(d * pxl), red(d * pyl),
                    red(d * (pxl * pxl)), red(d * (pxl * pyl)),
                    red(d * (pyl * pyl))], axis=0)
            else:
                mom = pb._dot_sub(moment_m, d_power_px)
            m0, mx, my, mxx, mxy, myy = (mom[j:j + 1, :] for j in range(6))
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
            if mode == "no_wmom":
                wmom = w[0:3, :]
            else:
                wmom = pb._dot3_sub(cot_m, w)
            dbuf[slot, 0:1, :] = -(ca * e_x + cb * e_y)
            dbuf[slot, 1:2, :] = -(cc * e_y + cb * e_x)
            dbuf[slot, 2:3, :] = -0.5 * e_xx
            dbuf[slot, 3:4, :] = -e_xy
            dbuf[slot, 4:5, :] = -0.5 * e_yy
            dbuf[slot, 5:8, :] = wmom
            dbuf[slot, 8:9, :] = m0 / jnp.maximum(f[8:9, :], 1e-30)
            dbuf[slot, pb.GID_ROW:pb.GID_ROW + 1, :] = jnp.where(
                lane_valid, f[pb.GID_ROW:pb.GID_ROW + 1, :],
                jnp.float32(jnp.inf))
            dbuf[slot, pb.GID_ROW + 1:pb.FEAT, :] = jnp.zeros(
                (pb.FEAT - pb.GID_ROW - 1, chunk), jnp.float32)
            grad_dma(slot, ci).start()
            return logT_before, S + suf_tot

        S0 = gT_ext * final_t
        jax.lax.fori_loop(0, n_chunks, body, (log_final_t, S0))

        @pl.when(n_chunks >= 1)
        def _():
            grad_dma((n_chunks - 1) % 2, 0).wait()

        @pl.when(n_chunks >= 2)
        def _():
            grad_dma((n_chunks - 2) % 2, 1).wait()

    def call(feat_soa, offsets, counts, gaoff, gimg, fwd_out):
        s_grad = feat_soa.shape[1] + NT * CHUNK
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(NT,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, P_PIX, pb.OUTC), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P_PIX, pb.OUTC), lambda t, *_: (t, 0, 0),
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
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(offsets, counts, gaoff, feat_soa, gimg, fwd_out)

    return call


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
    feat_soa = jax.jit(lambda fr: pb._feat_soa_from_rows(fr, CHUNK))(
        si.feat_rows)
    offsets = si.binning.offsets
    counts = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
    gaoff = jax.jit(lambda o: pb.grad_region_offsets(o, CHUNK))(offsets)
    fwd_out = jax.jit(lambda fs, o_, c_: pb._fwd_call(
        fs, o_, c_, GX, GY, TILE, CHUNK, False))(feat_soa, offsets, counts)
    g_out = jax.jit(lambda tl: jax.grad(lambda x: jnp.mean(
        pb._assemble_tiles(x, GX, GY, TILE, bg)[0][:, :H, :W] ** 2))(tl))(
        fwd_out)
    jax.block_until_ready((feat_soa, offsets, counts, gaoff, fwd_out, g_out))

    modes = sys.argv[1:] or ["full", "mom3", "no_mom", "no_wmom", "no_suffix",
                             "no_prefix", "dma_only"]
    for mode in modes:
        call = make_bwd(mode)

        def s_fn(fs, o_, c_, ga, go, fo, i, call=call):
            return call(fs * (1 + 1e-12 * i), o_, c_, ga, go, fo)

        t = timeit(s_fn, feat_soa, offsets, counts, gaoff, g_out, fwd_out)
        print(f"bwd[{mode:10s}]: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
