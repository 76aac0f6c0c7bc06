#!/usr/bin/env python
"""Distance-based point pruning study (reference KDtree_test.py:64-71):
prune gaussians by camera distance and compare the pruned render with the
full render."""

from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    import jax.numpy as jnp

    from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
    from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
    from gaussian_splatting_with_eye_tracking_tpu import renderer as rnd
    from gaussian_splatting_with_eye_tracking_tpu.utils.image_utils import save_image
    from tests.helpers import make_camera
    import fps_test

    parser = ArgumentParser()
    parser.add_argument("--model_path", "-m", default="", type=str)
    parser.add_argument("--source_path", "-s", default="", type=str)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--num_gaussians", default=50_000, type=int)
    parser.add_argument("--keep_fraction", default=0.5, type=float)
    parser.add_argument("--width", default=640, type=int)
    parser.add_argument("--height", default=480, type=int)
    parser.add_argument("--out_dir", default="kdtree_test_out", type=str)
    args = parser.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    state, deg, active = fps_test.load_or_synthetic(args)
    p = state.params
    sh = gm.get_sh(p) * rnd.sh_band_mask(state.sh_degree, deg)[None, None, :]
    cam = make_camera(args.width, args.height, cam_z=-5.0)
    bg = jnp.zeros(3)
    kw = dict(sh_degree=deg, max_instances=1 << 20, max_per_tile=2048)

    dist = jnp.linalg.norm(p.xyz - cam.campos[None, :], axis=-1)
    masked = jnp.sort(jnp.where(active, dist, jnp.inf))
    idx = (args.keep_fraction * active.sum()).astype(jnp.int32)
    thresh = masked[jnp.clip(idx, 0, masked.shape[0] - 1)]
    keep = active & (dist <= thresh)
    print(f"keeping {int(keep.sum())}/{int(active.sum())} gaussians "
          f"(nearest {args.keep_fraction * 100:.0f}% by camera distance)")

    full = rast.rasterize(p.xyz, gm.get_scaling(p), p.rotation, gm.get_opacity(p),
                          sh, cam, bg, active_mask=active, **kw).color
    pruned = rast.rasterize(p.xyz, gm.get_scaling(p), p.rotation, gm.get_opacity(p),
                            sh, cam, bg, active_mask=keep, **kw).color
    mse = float(jnp.mean((full - pruned) ** 2))
    print(f"PSNR(pruned, full) = {-10 * np.log10(max(mse, 1e-12)):.2f} dB")
    save_image(np.asarray(jnp.clip(full, 0, 1)), f"{args.out_dir}/full.png")
    save_image(np.asarray(jnp.clip(pruned, 0, 1)), f"{args.out_dir}/pruned.png")


if __name__ == "__main__":
    main()
