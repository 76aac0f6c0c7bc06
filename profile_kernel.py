#!/usr/bin/env python
"""Microbenchmark forward-kernel variants to locate the per-chunk cost.

Variants (cumulative ablations of the forward blend kernel):
  full      - production kernel (MXU power)
  vpu_power - power computed directly on the VPU (dx/dy form)
  no_scan   - cumprod scan replaced by a single multiply (wrong output)
  no_exp    - exp replaced by a polynomial (wrong output)
  no_mxu    - color accumulation without the MXU matmul (plain add)
  dma_only  - DMA chunks, trivial reduction (floor)
"""
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
TILE = 32
CHUNK = 128
MAXI = 1 << 21
cam = make_camera(W, H, cam_z=-5.0)
means, scales, quats, op, sh = make_random_gaussians(
    N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0)
)
grid_x, grid_y = -(-W // TILE), -(-H // TILE)
prep = preprocess(means, scales, quats, op, sh, 3, cam, tile=TILE)
b = binning_ops.bin_gaussians(prep, grid_x, grid_y, MAXI)
feat_soa = pb._sorted_features(
    prep.means2d, prep.conics, prep.rgb, prep.opacities, b.gauss_id, CHUNK
)
counts = (b.offsets[1:] - b.offsets[:-1]).astype(jnp.int32)
offsets = b.offsets
feat_soa, counts, offsets = jax.device_put((feat_soa, counts, offsets))
PIXELS = TILE * TILE


def make_kernel(variant):
    def kernel(off_ref, counts_ref, feat_hbm, out_ref, fbuf, sem):
        t = pl.program_id(0)
        o = off_ref[t]
        n = counts_ref[t]
        start = (o // CHUNK) * CHUNK
        n_chunks = jnp.where(n > 0, pl.cdiv(o + n - start, CHUNK), 0)
        px, py = pb._pixel_coords(t, grid_x, PIXELS, TILE)
        ox = ((t % grid_x) * TILE).astype(jnp.float32)
        oy = ((t // grid_x) * TILE).astype(jnp.float32)
        moment_m = pb._moment_matrix(px - ox, py - oy, PIXELS)

        def dma(slot, ci):
            off = pl.multiple_of(start + ci * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(off, CHUNK)], fbuf.at[slot], sem.at[slot]
            )

        @pl.when(n_chunks > 0)
        def _():
            dma(0, 0).start()

        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def body(ci, carry):
            logT, rgb_acc = carry

            @pl.when(ci + 1 < n_chunks)
            def _():
                dma((ci + 1) % 2, ci + 1).start()

            dma(ci % 2, ci).wait()
            f = fbuf[ci % 2]
            ids = start + ci * CHUNK + lane_ids
            if variant == "dma_only":
                rgb_acc = rgb_acc + jnp.sum(f[0:3, :]).reshape(1, 1)
                return logT, rgb_acc
            if variant == "full":
                alpha, _, _, _, _ = pb._alpha_terms(f, px, py, ids, o, o + n)
            else:
                ca, cb, cc, opp = f[2:3, :], f[3:4, :], f[4:5, :], f[8:9, :]
                dx = f[0:1, :] - px
                dy = f[1:2, :] - py
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                if variant == "no_exp":
                    g = jnp.abs(power) * 0.3
                else:
                    g = jnp.exp(jnp.minimum(power, 0.0))
                alpha_raw = opp * g
                alpha = jnp.minimum(pb.ALPHA_MAX, alpha_raw)
                keepm = (ids >= o) & (ids < o + n)
                keep = keepm & (power <= 0.0) & (alpha >= pb.ALPHA_MIN)
                alpha = jnp.where(keep, alpha, 0.0)
            om = 1.0 - alpha
            if variant.startswith("mxu_scan"):
                prec = (
                    jax.lax.Precision.HIGH
                    if variant == "mxu_scan_high"
                    else jax.lax.Precision.HIGHEST
                )
                ii = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
                jj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
                upper = (ii < jj).astype(jnp.float32)
                lom = jnp.log(om)
                s = jax.lax.dot_general(
                    lom, upper, (((1,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32,
                )
                w = alpha * jnp.exp(logT + s)
                logT = logT + s[:, -1:] + lom[:, -1:]
                rgb_acc = rgb_acc + pb._dot_lanes(w, f[5:8, :])
                return logT, rgb_acc
            if variant == "no_scan":
                cp = om * 0.999
            else:
                cp = om
                k = 1
                while k < CHUNK:
                    cp = cp * jnp.concatenate(
                        [jnp.ones((PIXELS, k), jnp.float32), cp[:, :-k]], axis=1
                    )
                    k *= 2
            excl = jnp.concatenate(
                [jnp.ones((PIXELS, 1), jnp.float32), cp[:, :-1]], axis=1
            )
            T = jnp.exp(logT)
            w = alpha * (T * excl)
            if variant == "no_mxu":
                rgb_acc = rgb_acc + jnp.sum(w, axis=1, keepdims=True)
            else:
                rgb_acc = rgb_acc + pb._dot_lanes(w, f[5:8, :])
            logT = logT + jnp.log(jnp.maximum(cp[:, -1:], 1e-37))
            return logT, rgb_acc

        zero = jnp.zeros((PIXELS, 1), jnp.float32)
        nc = 1 if variant == "dma_only" else 3
        acc0 = (
            jnp.zeros((1, 1), jnp.float32)
            if variant == "dma_only"
            else jnp.zeros((PIXELS, nc), jnp.float32)
        )
        logT, rgb_acc = jax.lax.fori_loop(0, n_chunks, body, (zero, acc0))
        out_ref[0, :, 0:3] = jnp.broadcast_to(
            jnp.sum(rgb_acc).reshape(1, 1), (PIXELS, 3)
        ) if variant == "dma_only" else rgb_acc
        out_ref[0, :, 3:8] = jnp.zeros((PIXELS, 5), jnp.float32)

    return kernel


def run(variant):
    num_tiles = grid_x * grid_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, PIXELS, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, pb.FEAT, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIXELS, 8), jnp.float32),
        grid_spec=grid_spec,
    )

    @jax.jit
    def chained(k, x):
        def body(i, acc):
            out = call(offsets, counts, x + 1e-12 * i)
            return acc + jnp.sum(out[:, 0, 0])

        return jax.lax.fori_loop(0, k, body, 0.0)

    _ = float(chained(1, feat_soa))
    t1 = time.perf_counter(); float(chained(1, feat_soa)); t1 = time.perf_counter() - t1
    it = 8
    t2 = time.perf_counter(); float(chained(1 + it, feat_soa)); t2 = time.perf_counter() - t2
    dt = max((t2 - t1) / it, 1e-9)
    print(f"{variant:10s} {dt*1e3:8.2f} ms")


for v in sys.argv[1:] or ["full", "vpu_power", "no_scan", "no_exp", "no_mxu", "dma_only"]:
    run(v)
