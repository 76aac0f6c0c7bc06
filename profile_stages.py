#!/usr/bin/env python
"""Stage-by-stage timing of the 1080p rasterization pipeline on TPU.

Times cumulative pipeline prefixes with the unrolled-chain protocol
(profile_util.chain_time): preprocess | +binning | +feature align |
+forward | +forward+backward, at a given tile size (arg 1, default 32).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from profile_util import chain_time
from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
from tests.helpers import make_camera, make_random_gaussians

W, H, N = 1920, 1088, 300_000
TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 32
MAXI = (1 << 21) if TILE == 32 else (1 << 22)
MAXL = MAXI
cam = make_camera(W, H, cam_z=-5.0)
means, scales, quats, op, sh = make_random_gaussians(
    N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0)
)
bg = jnp.zeros(3)
grid_x = -(-W // TILE)
grid_y = -(-H // TILE)


def chainify(stat_fn):
    """stat_fn: means -> scalar; returns means -> means for chain_time."""
    return lambda m: m + 1e-30 * stat_fn(m)


def stage_prep(m):
    p = preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE)
    return jnp.sum(p.means2d) + jnp.sum(p.rgb)


def stage_bin(m):
    """Fused instance builder (compaction + expand + payload sort)."""
    p = preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE)
    si = binning_ops.build_sorted_instances(
        p.means2d, p.conics, p.rgb, p.opacities, p.tiles_touched,
        p.rect_min, p.rect_max, p.cull_thr, p.depths,
        grid_x, grid_y, MAXI, tile_px=TILE, max_live=MAXL,
    )
    return (jnp.sum(si.feat_rows[0]) +
            jnp.sum(si.binning.offsets).astype(jnp.float32))


def stage_align(m):
    """Legacy gather-based binning+align (bin_gaussians + _sorted_features),
    for comparison against stage_bin."""
    p = preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE)
    b = binning_ops.bin_gaussians(p, grid_x, grid_y, MAXI, tile_px=TILE,
                                  max_live=MAXL)
    feat_soa = pallas_blend._sorted_features(
        p.means2d, p.conics, p.rgb, p.opacities, b.gauss_id, 128
    )
    return jnp.sum(feat_soa[0])


def stage_fwd(m):
    p = preprocess(m, scales, quats, op, sh, 3, cam, tile=TILE)
    color, final_t, aux = pallas_blend.render_tiles_pallas(
        p, p.means2d, grid_x, grid_y, TILE, bg, MAXI, MAXL,
    )
    return jnp.mean(color)


def stage_fwdbwd(m):
    def loss(mm):
        out = rast.rasterize(
            mm, scales, quats, op, sh, cam, bg, sh_degree=3, tile=TILE,
            max_instances=MAXI, max_live=MAXL, max_per_tile=2048,
            impl="pallas",
        )
        return jnp.mean(out.color ** 2)

    return jnp.mean(jax.grad(loss)(m))


def main():
    # reps kept low: XLA compile time for an unrolled chain of sort-heavy
    # stages grows superlinearly (9 copies of the instance builder took
    # >35 min to compile; 3 copies are minutes)
    reps_override = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    stages = [
        ("preprocess", stage_prep, 9),
        ("+instances", stage_bin, 3),
        ("+old-gather", stage_align, 3),
        ("+forward", stage_fwd, 3),
        ("+fwd+bwd", stage_fwdbwd, 3),
    ]
    if reps_override:
        stages = [(n_, f_, reps_override) for n_, f_, _ in stages]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    print(f"tile={TILE} grid={grid_x}x{grid_y} maxi={MAXI}", flush=True)
    for name, fn, reps in stages:
        if names and not any(s in name for s in names):
            continue
        dt = chain_time(chainify(fn), means, reps=reps)
        print(f"{name:12s} {dt*1e3:9.2f} ms  ({W*H/dt/1e6:8.2f} Mpix/s)",
              flush=True)


if __name__ == "__main__":
    main()
