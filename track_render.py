#!/usr/bin/env python
"""Eye-tracking driven foveated rendering CLI (reference track_render.py:28-111).

Pipeline: eye image -> RITnet segmentation -> pupil-centroid gaze estimate ->
gaze-mapped fovea center -> AMR foveated render of the trained scene.
The gaze->camera step the reference leaves as a stub (track_render.py:99-106)
is implemented here: the pupil centroid in eye-image coordinates maps
linearly onto render-image coordinates and drives the per-tile AMR levels.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.config import (
    ModelConfig,
    PipelineConfig,
    add_config_args,
    extract_config,
    get_combined_args,
)
from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from gaussian_splatting_with_eye_tracking_tpu.models import ritnet
from gaussian_splatting_with_eye_tracking_tpu.ops import amr
from gaussian_splatting_with_eye_tracking_tpu.scene import Scene
from gaussian_splatting_with_eye_tracking_tpu.utils.general_utils import safe_state
from gaussian_splatting_with_eye_tracking_tpu.utils.image_utils import save_image


def estimate_gaze(eye_image_path: str, weights_path: str | None = None,
                  out_seg_path: str = ""):
    """Eye image -> (gaze_uv in [0,1]^2, segmentation map). With no
    weights_path the vendored pretrained weights load (self-contained, like
    the reference shipping RITnet/best_model.pkl in-repo)."""
    from PIL import Image

    eye = np.asarray(Image.open(eye_image_path).convert("L"))
    h = eye.shape[0] - eye.shape[0] % 16
    w = eye.shape[1] - eye.shape[1] % 16
    eye = eye[:h, :w]
    params = ritnet.load_pretrained(weights_path)
    x = ritnet.preprocess_eye_image(eye)
    logits = ritnet.densenet2d_apply(params, x)
    pred = np.asarray(ritnet.get_predictions(logits))[0]
    if out_seg_path:
        # save a visualization like the reference's eye_seg_pred.png
        viz = (pred.astype(np.float32) / 3.0)
        save_image(np.stack([viz] * 3), out_seg_path)
    gaze_px = ritnet.pupil_centroid(pred)
    return gaze_px / np.array([w, h]), pred


def main(argv=None):
    parser = ArgumentParser(description="Eye-tracked foveated rendering")
    add_config_args(parser, ModelConfig(), "Model Parameters", sentinel=True)
    add_config_args(parser, PipelineConfig(), "Pipeline Parameters")
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--eye_image", default="eye.png", type=str)
    parser.add_argument("--ritnet_weights", default=os.environ.get(
        "RITNET_WEIGHTS", None), type=str,
        help="RITnet weights (.npz or torch .pkl); default: vendored "
             "pretrained weights")
    parser.add_argument("--out_dir", default="", type=str)
    parser.add_argument("--num_views", default=4, type=int)
    parser.add_argument("--quiet", action="store_true")
    args = get_combined_args(parser, argv)
    safe_state(args.quiet)

    gaze_uv, pred = estimate_gaze(
        args.eye_image, args.ritnet_weights,
        os.path.join(args.model_path, "eye_seg_pred.png") if args.model_path else "",
    )
    print(f"Gaze estimate (normalized): {gaze_uv}")

    cfg = extract_config(args, ModelConfig)
    scene = Scene(cfg, load_iteration=args.iteration, shuffle=False)
    state = scene.gaussians
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0])
    out_dir = args.out_dir or os.path.join(cfg.model_path, "foveated")
    os.makedirs(out_dir, exist_ok=True)

    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    p = state.params
    from gaussian_splatting_with_eye_tracking_tpu import renderer as rnd

    sh = gm.get_sh(p) * rnd.sh_band_mask(state.sh_degree, scene.max_sh_degree)[None, None, :]
    for i, cam in enumerate(scene.get_train_cameras()[: args.num_views]):
        c = cam.params()
        gaze_xy = jnp.asarray(
            [gaze_uv[0] * c.width, gaze_uv[1] * c.height], jnp.float32
        )
        radii = jnp.asarray([c.width / 2, c.width / 4, c.width / 8], jnp.float32)
        color, amr_state = amr.render_amr(
            p.xyz, gm.get_scaling(p), p.rotation, gm.get_opacity(p), sh,
            scene.max_sh_degree, c, bg,
            impl=impl, active_mask=state.active,
            gaze_xy=gaze_xy, gaze_radii=radii,
        )
        save_image(np.asarray(jnp.clip(color, 0, 1)),
                   os.path.join(out_dir, f"foveated_{i:03d}.png"))
    print(f"Wrote foveated renders to {out_dir}")


if __name__ == "__main__":
    main()
