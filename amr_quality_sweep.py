#!/usr/bin/env python
"""Foveated-decimation quality evidence (VERDICT r4 #4): PSNR/SSIM of the
gaze-driven fused foveated render under instance-stream decimation vs the
UNDECIMATED fused render, swept over scene density and decimation
aggressiveness, plus a committed side-by-side image.

Both sides of every comparison are the same fused AMR path with the same
gaze rings — the delta isolates the decimation knob (the coarse peripheral
resolution and nearest-pixel interpolation cancel out). Optionally also
sweeps TUNE['alpha'] bf16 modes (the other lossy speed knob) against the
f32 render.

Reference anchors: fps_test_amr_1080p_foveated.py workload (1080p, gaze
rings ~4/8/16 deg); decimation itself has no reference counterpart (the
reference's AMR is exact per level) — it is this framework's periphery
knob, so its quality must be documented, not assumed.

Usage:
  python amr_quality_sweep.py --out AMR_QUALITY_r05.json \
      [--model logs/train_r05/model] [--densities 100000 1000000]
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np


def psnr_ssim(a, b):
    import jax.numpy as jnp

    from gaussian_splatting_with_eye_tracking_tpu.ops import ssim as ssim_ops

    mse = float(np.mean((a - b) ** 2))
    p = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    s = float(ssim_ops.ssim(jnp.asarray(a), jnp.asarray(b)))
    return p, s


def main(argv=None):
    ap = ArgumentParser()
    ap.add_argument("--model_path", "-m", default="", type=str)
    ap.add_argument("--iteration", default=-1, type=int)
    ap.add_argument("--densities", nargs="*", type=int,
                    default=[100_000, 400_000, 1_000_000])
    ap.add_argument("--width", default=1920, type=int)
    ap.add_argument("--height", default=1088, type=int)
    ap.add_argument("--max_instances", default=1 << 20, type=int)
    ap.add_argument("--out", default="AMR_QUALITY_r05.json")
    ap.add_argument("--png", default="amr_quality_side_by_side.png")
    ap.add_argument("--alpha_modes", nargs="*",
                    default=["bf16"], help="extra TUNE['alpha'] modes")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import fps_test
    from gaussian_splatting_with_eye_tracking_tpu.models import (
        gaussian_model as gm,
    )
    from gaussian_splatting_with_eye_tracking_tpu import renderer as rnd
    from gaussian_splatting_with_eye_tracking_tpu.ops import amr as amr_ops
    from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend
    from tests.helpers import make_camera

    w, h = args.width, args.height
    cam = make_camera(w, h, cam_z=-5.0)
    gaze = jnp.asarray([w / 2.0, h / 2.0])
    radii = jnp.asarray([h / 8.0, h / 4.0, h / 2.0])
    bg = jnp.zeros(3)
    decims = [(2, 2, 1, 1), (4, 2, 1, 1), (8, 4, 2, 1)]

    workloads = []
    if args.model_path:
        class A:  # fps_test.load_or_synthetic reads argparse-style fields
            model_path = args.model_path
            source_path = ""
            iteration = args.iteration
            synthetic = False
            num_gaussians = 0
        state, deg, active = fps_test.load_or_synthetic(A)
        workloads.append(("trained", state, deg, active))
    for n in args.densities:
        class B:
            model_path = ""
            source_path = ""
            iteration = -1
            synthetic = True
            num_gaussians = n
        state, deg, active = fps_test.load_or_synthetic(B)
        workloads.append((f"synthetic_{n}", state, deg, active))

    results = []
    png_panels = None
    for name, state, deg, active in workloads:
        p = state.params
        sh = gm.get_sh(p) * rnd.sh_band_mask(
            state.sh_degree, deg)[None, None, :]
        sc, op_ = gm.get_scaling(p), gm.get_opacity(p)

        def render(decimation, alpha_mode="f32", predecimate=False):
            # TUNE is read at trace time: flush jit caches only when the
            # mode actually changes (decimation/predecimate are static
            # args with their own cache entries)
            if pallas_blend.TUNE["alpha"] != alpha_mode:
                pallas_blend.TUNE["alpha"] = alpha_mode
                jax.clear_caches()
            f = jax.jit(lambda xyz, s_, r_, o_, h_, a_: amr_ops.render_amr_fused(
                xyz, s_, r_, o_, h_, deg, cam, bg, active_mask=a_,
                max_instances=args.max_instances, gaze_xy=gaze,
                gaze_radii=radii, decimation=decimation,
                predecimate=predecimate)[0])
            return np.clip(np.asarray(
                f(p.xyz, sc, p.rotation, op_, sh, active)), 0, 1)

        base = render((1, 1, 1, 1))
        row = {"workload": name, "num_gaussians": int(p.xyz.shape[0]),
               "gaze_rings_px": [float(r) for r in np.asarray(radii)],
               "decimation": [], "alpha_modes": []}
        # predecimate baseline: its level map is the PURE gaze rings (the
        # percentile component is undefined pre-sort), so compare it
        # against an undecimated render with the SAME pure-gaze levels
        base_pre = render((1, 1, 1, 1), predecimate=True)
        for d in decims:
            img = render(d)
            ps, ss = psnr_ssim(img, base)
            imgp = render(d, predecimate=True)
            psp, ssp = psnr_ssim(imgp, base_pre)
            row["decimation"].append(
                {"decimation": list(d), "psnr_db": round(ps, 2),
                 "ssim": round(ss, 4), "predecimate_psnr_db": round(psp, 2),
                 "predecimate_ssim": round(ssp, 4)})
            print(f"[{name}] decim {d}: kernel PSNR {ps:.2f} dB SSIM "
                  f"{ss:.4f} | binning-time PSNR {psp:.2f} dB SSIM {ssp:.4f}",
                  flush=True)
            if png_panels is None and d == (4, 2, 1, 1) and \
                    name.startswith("synthetic"):
                png_panels = (base_pre, imgp)
        for m in args.alpha_modes:
            img = render((1, 1, 1, 1), alpha_mode=m)
            ps, ss = psnr_ssim(img, base)
            row["alpha_modes"].append(
                {"mode": m, "psnr_db": round(ps, 2), "ssim": round(ss, 4)})
            print(f"[{name}] alpha {m}: PSNR {ps:.2f} dB SSIM {ss:.4f}",
                  flush=True)
        results.append(row)
    if pallas_blend.TUNE["alpha"] != "f32":
        pallas_blend.TUNE["alpha"] = "f32"
        jax.clear_caches()

    if png_panels is not None:
        from PIL import Image
        a, b = png_panels
        diff = np.clip(np.abs(a - b) * 10.0, 0, 1)
        panel = np.concatenate([a, b, diff], axis=2)  # (3, H, 3W)
        arr = (np.transpose(panel, (1, 2, 0)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(args.png)
        print(f"side-by-side (undecimated | (4,2,1,1) | 10x diff) -> "
              f"{args.png}", flush=True)

    doc = {"protocol": "fused gaze-driven AMR, decimated vs undecimated "
                       "(same path, same gaze rings); full-image metrics",
           "resolution": [w, h], "results": results}
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(results[-1]["decimation"]), flush=True)


if __name__ == "__main__":
    main()
