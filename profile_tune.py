#!/usr/bin/env python
"""Measure PRODUCTION blend-kernel variants via the pallas_blend.TUNE knobs
(fwd _fwd_call + bwd _bwd_call on the bench workload), including chunk size
and DMA pipeline depth. Usage:
    python profile_tune.py fwd|bwd|both [chunk] [key=val ...]
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
TILE = 32
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


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    for kv in sys.argv[3:]:
        k, v = kv.split("=")
        pb.TUNE[k] = int(v) if v.isdigit() else v
    print(f"chunk={chunk} TUNE={pb.TUNE}", flush=True)

    cam = make_camera(W, H, cam_z=-5.0)
    means, scales, quats, op, sh = make_random_gaussians(
        N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0))
    prep = jax.jit(lambda m: preprocess(m, scales, quats, op, sh, 3, cam,
                                        tile=TILE))(means)
    si = jax.jit(lambda p: binning_ops.build_sorted_instances(
        p.means2d, p.conics, p.rgb, p.opacities, p.tiles_touched,
        p.rect_min, p.rect_max, p.cull_thr, p.depths, GX, GY, MAXI,
        tile_px=TILE, max_live=MAXL))(prep)
    feat_soa = jax.jit(
        lambda fr: pb._feat_soa_from_rows(fr, chunk))(si.feat_rows)
    offsets = si.binning.offsets
    counts = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
    jax.block_until_ready((feat_soa, offsets, counts))

    if which in ("fwd", "both"):
        def s_fwd(fs, o_, c_, i):
            return pb._fwd_call(fs * (1 + 1e-12 * i), o_, c_, GX, GY, TILE,
                                chunk, False)

        t = timeit(s_fwd, feat_soa, offsets, counts)
        print(f"fwd[chunk={chunk} color={pb.TUNE['color']} "
              f"nbuf={pb.TUNE['nbuf']}]: {t*1e3:8.3f} ms", flush=True)

    if which in ("bwd", "both"):
        fwd_out = jax.block_until_ready(jax.jit(
            lambda f: pb._fwd_call(f, offsets, counts, GX, GY, TILE, chunk,
                                   False))(feat_soa))
        gaoff = jax.block_until_ready(jax.jit(
            lambda: pb.grad_region_offsets(offsets, chunk))())
        gimg = jnp.ones((NT, P_PIX, pb.OUTC), jnp.float32) * 1e-3

        def s_bwd(fs, g, fo, i):
            return pb._bwd_call(fs * (1 + 1e-12 * i), offsets, counts, gaoff,
                                g, fo, GX, GY, TILE, chunk, False)

        t = timeit(s_bwd, feat_soa, gimg, fwd_out)
        print(f"bwd[chunk={chunk} grgb={pb.TUNE['grgb']} mom={pb.TUNE['mom']} "
              f"wmom={pb.TUNE['wmom']}]: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
