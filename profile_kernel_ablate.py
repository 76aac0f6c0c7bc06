#!/usr/bin/env python
"""Ablate the fwd kernel to locate its real bound: DMA/loop overhead vs
alpha math vs special functions (exp/log) vs scan matmul vs color matmul.
Each variant strips one stage; run on the bench workload."""
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


def make_kernel(mode, chunk=CHUNK):
    def kernel(off_ref, counts_ref, feat_hbm, out_ref, fbuf, sem):
        t = pl.program_id(0)
        o = off_ref[t]
        n = counts_ref[t]
        start = (o // chunk) * chunk
        n_chunks = jnp.where(n > 0, pl.cdiv(o + n - start, chunk), 0)
        px, py = pb._pixel_coords(t, GX, P_PIX, TILE)
        blk = min(chunk, 128)
        prefix_m = pb._prefix_excl_matrix(blk)

        def dma(slot, ci):
            off = pl.multiple_of(start + ci * chunk, chunk)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(off, chunk)], fbuf.at[slot], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            dma(0, 0).start()

        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

        def body(carry):
            ci, logT, rgb_acc, done = carry

            @pl.when(ci + 1 < n_chunks)
            def _():
                dma((ci + 1) % 2, ci + 1).start()

            dma(ci % 2, ci).wait()
            f = fbuf[ci % 2]
            ids = start + ci * chunk + lane_ids
            if mode == "dma_only":
                # touch the chunk minimally: one (P,C)-free reduction
                logT = logT + jnp.sum(f[0:1, :]) * 1e-20
                done = jnp.bool_(False)
                return ci + 1, logT, rgb_acc, done
            valid = (ids >= o) & (ids < o + n)
            if mode == "alpha_cheap":
                # polynomial instead of exp/log: isolates special-fn cost
                hca = -0.5 * f[2:3, :]
                ncb = -f[3:4, :]
                hcc = -0.5 * f[4:5, :]
                opm = jnp.where(valid, f[8:9, :], 0.0)
                dx = f[0:1, :] - px
                dy = f[1:2, :] - py
                power = (hca * dx + ncb * dy) * dx + (hcc * dy) * dy
                g = 1.0 / (1.0 - power)  # cheap stand-in for exp
                alpha_raw = opm * g
                alpha = jnp.minimum(pb.ALPHA_MAX, alpha_raw)
                keep = (power <= 0.0) & (alpha_raw >= pb.ALPHA_MIN)
                alpha = jnp.where(keep, alpha, 0.0)
                lom = -alpha - 0.5 * alpha * alpha  # stand-in for log1p
            else:
                alpha, _, _, _ = pb._alpha_terms(f, px, py, ids, o, o + n)
                lom = jnp.log(1.0 - alpha)
            if mode == "no_scan":
                s = lom
                tot = lom[:, -1:]
                w = alpha * (1.0 + s)
            elif mode == "alpha_cheap":
                s, tot = pb._prefix_scan(lom, prefix_m, blk, carry0=logT)
                w = alpha * (1.0 + s * 1e-20)
            else:
                s, tot = pb._prefix_scan(lom, prefix_m, blk, carry0=logT)
                w = alpha * jnp.exp(s)
            if mode == "no_color":
                rgb_acc = rgb_acc + w[:, 0:3]
            elif mode == "color_t":
                # explicit small transpose then NATIVE-form matmul
                rgbT = f[5:8, :].T  # (C, 3)
                rgb_acc = rgb_acc + pb._dot3(
                    w, rgbT, (((1,), (0,)), ((), ())))
            elif mode == "color_pad128":
                # embed rgb^T in a (C, 128) operand so the matmul is the
                # same native shape as the (free) scan matmul
                rgbT = f[5:8, :].T  # (C, 3)
                bmat = jnp.pad(rgbT, ((0, 0), (0, 125)))
                acc = pb._dot3(w, bmat, (((1,), (0,)), ((), ())))
                rgb_acc = rgb_acc + acc[:, 0:3]
            elif mode == "color_bf16":
                # single bf16 pass (precision probe only)
                rgb_acc = rgb_acc + jax.lax.dot_general(
                    w.astype(jnp.bfloat16), f[5:8, :].astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                rgb_acc = rgb_acc + pb._dot3_lanes(w, f[5:8, :])
            logT = logT + tot
            done = jnp.max(logT) < pb.LOG_T_MIN
            return ci + 1, logT, rgb_acc, done

        def cond(carry):
            ci, _, _, done = carry
            return (ci < n_chunks) & jnp.logical_not(done)

        zero = jnp.zeros((P_PIX, 1), jnp.float32)
        ci, logT, rgb_acc, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), zero,
                         jnp.zeros((P_PIX, 3), jnp.float32), jnp.bool_(False)))

        @pl.when(ci < n_chunks)
        def _():
            dma(ci % 2, ci).wait()

        out_ref[0, :, 0:3] = rgb_acc
        out_ref[0, :, 3:4] = logT
        out_ref[0, :, 4:pb.OUTC] = jnp.zeros((P_PIX, pb.OUTC - 4), jnp.float32)

    def call(feat_soa, offsets, counts):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NT,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, P_PIX, pb.OUTC), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, pb.FEAT, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NT, P_PIX, pb.OUTC), jnp.float32),
            grid_spec=grid_spec,
        )(offsets, counts, feat_soa)

    return call


def main():
    cam = make_camera(W, H, cam_z=-5.0)
    means, scales, quats, op, sh = make_random_gaussians(
        N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0))
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
    jax.block_until_ready((feat_soa, offsets, counts))

    modes = sys.argv[1:] or ["full", "no_color", "no_scan", "alpha_cheap",
                             "dma_only"]
    for mode in modes:
        # TUNE['alpha'] probes: run the PRODUCTION kernel (not the local
        # ablation clone) under each alpha mode, e.g. "tune:bf16"
        if mode.startswith("tune:"):
            import gaussian_splatting_with_eye_tracking_tpu.ops.pallas_blend as pbm
            old = pbm.TUNE["alpha"]
            pbm.TUNE["alpha"] = mode.split(":", 1)[1]
            jax.clear_caches()
            try:
                def s_fn(fs, o_, c_, i):
                    cnt = (o_[1:] - o_[:-1]).astype(jnp.int32)
                    return pb._fwd_call(fs * (1 + 1e-12 * i), o_, cnt,
                                        GX, GY, TILE, CHUNK, False)
                t = timeit(s_fn, feat_soa, offsets, counts)
                print(f"fwd[{mode:12s}]: {t*1e3:8.3f} ms", flush=True)
            finally:
                pbm.TUNE["alpha"] = old
                jax.clear_caches()
            continue
        call = make_kernel(mode)

        def s_fn(fs, o_, c_, i, call=call):
            return call(fs * (1 + 1e-12 * i), o_, c_)

        t = timeit(s_fn, feat_soa, offsets, counts)
        print(f"fwd[{mode:12s}]: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
