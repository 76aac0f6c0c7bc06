#!/usr/bin/env python
"""AMR algorithm prototype & visual cross-check (reference AMR_test.py +
AMR_test_cuda.py): renders a scene, recomputes per-tile intersection counts
and percentile AMR levels in NumPy, cross-checks them against the production
binning/level path, and saves level-overlay + reconstruction comparisons."""

from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    import jax.numpy as jnp

    from gaussian_splatting_with_eye_tracking_tpu.ops import amr, binning, rasterize as rast
    from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
    from gaussian_splatting_with_eye_tracking_tpu.utils.image_utils import save_image
    from tests.helpers import make_camera, make_random_gaussians
    import fps_test

    parser = ArgumentParser()
    parser.add_argument("--model_path", "-m", default="", type=str)
    parser.add_argument("--source_path", "-s", default="", type=str)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--num_gaussians", default=50_000, type=int)
    parser.add_argument("--width", default=640, type=int)
    parser.add_argument("--height", default=480, type=int)
    parser.add_argument("--out_dir", default="amr_test_out", type=str)
    args = parser.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    state, deg, active = fps_test.load_or_synthetic(args)
    from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
    from gaussian_splatting_with_eye_tracking_tpu import renderer as rnd

    p = state.params
    sh = gm.get_sh(p) * rnd.sh_band_mask(state.sh_degree, deg)[None, None, :]
    cam = make_camera(args.width, args.height, cam_z=-5.0)
    bg = jnp.zeros(3)
    tile = 32
    gx, gy = -(-cam.width // tile), -(-cam.height // tile)

    # production levels
    st = amr.fovea_step0(
        p.xyz, gm.get_scaling(p), p.rotation, gm.get_opacity(p), sh, deg, cam,
        active_mask=active,
    )
    counts_prod = np.asarray(st.offsets[1:] - st.offsets[:-1])
    levels_prod = np.asarray(st.tile_levels)

    # NumPy re-derivation (the oracle, reference AMR_test_cuda.py:209-218):
    prep = preprocess(p.xyz, gm.get_scaling(p), p.rotation, gm.get_opacity(p),
                      sh, deg, cam, active_mask=active)
    rmin = np.asarray(prep.rect_min)
    rmax = np.asarray(prep.rect_max)
    counts_np = np.zeros(gx * gy, np.int64)
    for g in np.nonzero(np.asarray(prep.radii) > 0)[0]:
        for ty in range(rmin[g, 1], rmax[g, 1]):
            for tx in range(rmin[g, 0], rmax[g, 0]):
                counts_np[ty * gx + tx] += 1
    match = (counts_np == counts_prod).all()
    print(f"intersection counts match: {match}")
    thr = [np.sort(counts_np)[min(int(q * len(counts_np)), len(counts_np) - 1)]
           for q in (0.25, 0.5, 0.9)]
    levels_np = 1 + sum((counts_np > t).astype(int) for t in thr)
    lv_match = (levels_np == levels_prod).all()
    print(f"AMR levels match: {lv_match}")
    for k in range(1, 5):
        print(f"  level {k}: {(levels_prod == k).mean() * 100:.1f}% of tiles")

    # renders: full vs AMR vs AMR+interp, plus level overlay
    full = rast.rasterize(p.xyz, gm.get_scaling(p), p.rotation, gm.get_opacity(p),
                          sh, cam, bg, sh_degree=deg, active_mask=active,
                          max_instances=1 << 20, max_per_tile=2048).color
    color, st2 = amr.render_amr(
        p.xyz, gm.get_scaling(p), p.rotation, gm.get_opacity(p), sh, deg, cam,
        bg, active_mask=active,
    )
    save_image(np.asarray(jnp.clip(full, 0, 1)), f"{args.out_dir}/full.png")
    save_image(np.asarray(jnp.clip(color, 0, 1)), f"{args.out_dir}/amr.png")
    err = float(jnp.mean(jnp.abs(color - full)))
    print(f"mean |AMR - full| = {err:.4f}")

    overlay = np.asarray(jnp.clip(full, 0, 1)).copy()
    lvl_map = levels_prod.reshape(gy, gx)
    for ty in range(gy):
        for tx in range(gx):
            v = (lvl_map[ty, tx] - 1) / 3.0
            ys, ye = ty * tile, min((ty + 1) * tile, cam.height)
            xs, xe = tx * tile, min((tx + 1) * tile, cam.width)
            overlay[0, ys:ye, xs:xe] = 0.5 * overlay[0, ys:ye, xs:xe] + 0.5 * v
    save_image(overlay, f"{args.out_dir}/levels_overlay.png")
    print(f"wrote {args.out_dir}/{{full,amr,levels_overlay}}.png")
    return match and lv_match


if __name__ == "__main__":
    main()
