#!/usr/bin/env python
"""Metrics CLI (reference metrics.py:36-103): SSIM/PSNR/LPIPS over the
renders written by render.py; writes results.json + per_view.json."""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from gaussian_splatting_with_eye_tracking_tpu import metrics_lib
from gaussian_splatting_with_eye_tracking_tpu.ops import ssim as ssim_ops
from gaussian_splatting_with_eye_tracking_tpu.utils.image_utils import load_image_chw


def read_images(renders_dir: Path, gt_dir: Path):
    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        renders.append(load_image_chw(str(renders_dir / fname)))
        gts.append(load_image_chw(str(gt_dir / fname)))
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths, use_lpips=True):
    full_dict, per_view_dict = {}, {}
    for scene_dir in model_paths:
        try:
            print("Scene:", scene_dir)
            full_dict[scene_dir] = {}
            per_view_dict[scene_dir] = {}
            test_dir = Path(scene_dir) / "test"
            for method in sorted(os.listdir(test_dir)):
                print("Method:", method)
                method_dir = test_dir / method
                renders, gts, names = read_images(method_dir / "renders", method_dir / "gt")
                ssims, psnrs, lpipss = [], [], []
                lp_ok = use_lpips and metrics_lib.lpips_available()
                if use_lpips and not lp_ok:
                    print("  (LPIPS skipped: no pretrained weights; set LPIPS_WEIGHTS)")
                for r, g in zip(renders, gts):
                    rj, gj = jnp.asarray(r), jnp.asarray(g)
                    ssims.append(float(ssim_ops.ssim(rj, gj)))
                    mse = float(jnp.mean((rj - gj) ** 2))
                    psnrs.append(-10 * np.log10(max(mse, 1e-10)))
                    if lp_ok:
                        lpipss.append(float(metrics_lib.lpips(rj, gj)[0]))
                print(f"  SSIM : {np.mean(ssims):.7f}")
                print(f"  PSNR : {np.mean(psnrs):.7f}")
                if lp_ok:
                    print(f"  LPIPS: {np.mean(lpipss):.7f}")
                full_dict[scene_dir][method] = {
                    "SSIM": float(np.mean(ssims)),
                    "PSNR": float(np.mean(psnrs)),
                    **({"LPIPS": float(np.mean(lpipss))} if lp_ok else {}),
                }
                per_view_dict[scene_dir][method] = {
                    "SSIM": dict(zip(names, map(float, ssims))),
                    "PSNR": dict(zip(names, map(float, psnrs))),
                    **({"LPIPS": dict(zip(names, map(float, lpipss)))} if lp_ok else {}),
                }
            with open(os.path.join(scene_dir, "results.json"), "w") as f:
                json.dump(full_dict[scene_dir], f, indent=True)
            with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
                json.dump(per_view_dict[scene_dir], f, indent=True)
        except Exception as e:
            print(f"Unable to compute metrics for model {scene_dir}: {e}")
    return full_dict


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+", type=str)
    parser.add_argument("--no_lpips", action="store_true")
    args = parser.parse_args(argv)
    evaluate(args.model_paths, use_lpips=not args.no_lpips)


if __name__ == "__main__":
    main()
