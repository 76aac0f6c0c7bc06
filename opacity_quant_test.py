#!/usr/bin/env python
"""Opacity quantization study (reference opacity_quant_test.py:55-71):
render original vs quantized-opacity vs quantized+residual-corrected and
report/save the comparison."""

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
    parser.add_argument("--bits", default=4, type=int)
    parser.add_argument("--width", default=640, type=int)
    parser.add_argument("--height", default=480, type=int)
    parser.add_argument("--out_dir", default="opacity_quant_out", type=str)
    args = parser.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    state, deg, active = fps_test.load_or_synthetic(args)
    p = state.params
    sh = gm.get_sh(p) * rnd.sh_band_mask(state.sh_degree, deg)[None, None, :]
    cam = make_camera(args.width, args.height, cam_z=-5.0)
    bg = jnp.zeros(3)
    kw = dict(sh_degree=deg, active_mask=active, max_instances=1 << 20,
              max_per_tile=2048)

    op = gm.get_opacity(p)
    levels = (1 << args.bits) - 1
    op_q = jnp.round(op * levels) / levels
    residual = op - op_q

    img0 = rast.rasterize(p.xyz, gm.get_scaling(p), p.rotation, op, sh, cam, bg, **kw).color
    img_q = rast.rasterize(p.xyz, gm.get_scaling(p), p.rotation, op_q, sh, cam, bg, **kw).color
    img_qr = rast.rasterize(p.xyz, gm.get_scaling(p), p.rotation, op_q + residual,
                            sh, cam, bg, **kw).color

    def psnr(a, b):
        mse = float(jnp.mean((a - b) ** 2))
        return -10 * np.log10(max(mse, 1e-12))

    print(f"{args.bits}-bit opacity quantization:")
    print(f"  PSNR(quantized, original)          = {psnr(img_q, img0):.2f} dB")
    print(f"  PSNR(quantized+residual, original) = {psnr(img_qr, img0):.2f} dB (identity check)")
    save_image(np.asarray(jnp.clip(img0, 0, 1)), f"{args.out_dir}/original.png")
    save_image(np.asarray(jnp.clip(img_q, 0, 1)), f"{args.out_dir}/quantized.png")
    save_image(np.asarray(jnp.clip(img_qr, 0, 1)), f"{args.out_dir}/quantized_residual.png")


if __name__ == "__main__":
    main()
