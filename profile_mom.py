#!/usr/bin/env python
"""Microbench: the bwd kernel's 6-row pixel-moment reduction
mom(6,C) = A(6,P) @ d(P,C), P=1024, C=128 — measured ~1.2us/chunk in the
kernel ablation (12.5 ms/frame), suspected latency-bound on the sublane
(K=P) contraction. Compare lowering strategies inside a minimal kernel that
mimics the bwd loop (chunked stream over a big array, same shapes)."""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend as pb

P_PIX, C = 1024, 128
N_CHUNKS = 10000  # ~ the bench workload's chunk count


def timeit(fn, *args, iters=4):
    @jax.jit
    def chained(k, *args):
        def body(i, acc):
            out = fn(*args, i)
            return acc + jnp.sum(out[..., -1:])

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    _ = float(chained(1, *args))
    t1 = time.perf_counter(); _ = float(chained(1, *args)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, *args)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


def make(mode):
    def kernel(x_hbm, out_ref, fbuf, sem, acc):
        t = pl.program_id(0)
        pxl_t, pyl_t = pb._pixel_coords_T(t, 60, P_PIX, 32)
        momT = pb._moment_matrix_T(pxl_t, pyl_t, P_PIX)  # (6, P)
        mom8 = jnp.pad(momT, ((0, 2), (0, 0)))  # (8, P)
        px, py = pb._pixel_coords(t, 60, P_PIX, 32)
        mom_m = jnp.concatenate(
            [jnp.ones((P_PIX, 1)), px, py, px * px, px * py, py * py], axis=1)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        def dma(slot, ci):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(ci * C, C)], fbuf.at[slot], sem.at[slot])

        nc = N_CHUNKS // pl.num_programs(0)
        dma(0, 0).start()

        def body(ci, _):
            @pl.when(ci + 1 < nc)
            def _():
                dma((ci + 1) % 2, ci + 1).start()

            dma(ci % 2, ci).wait()
            # synthesize a (P, C) block from the small streamed chunk (the
            # production kernel computes d from (16, C) features; one
            # outer-product pass, identical across modes)
            d = fbuf[ci % 2][0:1, :] * px
            if mode == "none":
                mom = d[0:6, :]
            elif mode == "highest":
                mom = pb._dot(momT, d)
            elif mode == "dot3":
                mom = pb._dot3(momT, d, (((1,), (0,)), ((), ())))
            elif mode == "dot1_bf16":
                mom = jax.lax.dot_general(
                    momT.astype(jnp.bfloat16), d.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif mode == "pad8_highest":
                mom = pb._dot(mom8, d)[0:6, :]
            elif mode == "sub_highest":
                mom = pb._dot_sub(mom_m, d)
            elif mode == "lanes_digT":
                # transpose d via MXU? no — contract lanes of momT vs a
                # TRANSPOSED copy of d, transpose on the VPU
                dT = d.T  # (C, P)
                mom = pb._dot_lanes(momT, dT)
            elif mode == "block128":
                # 8 throughput passes: contract 128-sublane blocks
                parts = None
                for b in range(8):
                    pm = pb._dot(momT[:, b * 128:(b + 1) * 128],
                                 d[b * 128:(b + 1) * 128, :])
                    parts = pm if parts is None else parts + pm
                mom = parts
            elif mode == "vpu7":
                red = lambda z: jnp.sum(z, axis=0, keepdims=True)
                pxl = px
                pyl = py
                mom = jnp.concatenate([
                    red(d), red(d * pxl), red(d * pyl), red(d * (pxl * pxl)),
                    red(d * (pxl * pyl)), red(d * (pyl * pyl))], axis=0)
            acc[0:mom.shape[0], :] += mom
            return 0

        jax.lax.fori_loop(0, nc, body, 0)
        out_ref[...] = acc[...]

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(8,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((8, C), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 16, C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((8, C), jnp.float32),
            ],
        )(x)

    return call


def main():
    x = jax.random.uniform(jax.random.PRNGKey(0), (16, N_CHUNKS * C // 8))
    modes = sys.argv[1:] or ["none", "highest", "dot3", "dot1_bf16",
                             "pad8_highest", "sub_highest", "block128", "vpu7"]
    for mode in modes:
        call = make(mode)

        def fn(x_, i, call=call):
            return call(x_ * (1 + 1e-12 * i))

        t = timeit(fn, x)
        print(f"mom[{mode:12s}]: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
