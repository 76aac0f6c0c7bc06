#!/usr/bin/env python
"""Batch render CLI (reference render.py:24-66): renders train/test sets of a
trained model into <model>/{train,test}/ours_<iter>/{renders,gt}/*.png."""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_with_eye_tracking_tpu import train_lib
from gaussian_splatting_with_eye_tracking_tpu.config import (
    ModelConfig,
    PipelineConfig,
    add_config_args,
    extract_config,
    get_combined_args,
)
from gaussian_splatting_with_eye_tracking_tpu.scene import Scene
from gaussian_splatting_with_eye_tracking_tpu.utils.general_utils import safe_state
from gaussian_splatting_with_eye_tracking_tpu.utils.image_utils import save_image


def render_set(model_path, name, iteration, views, scene, state, bg, impl):
    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(gts_path, exist_ok=True)

    renders = {}
    for idx, view in enumerate(views):
        key = (view.width, view.height)
        if key not in renders:
            renders[key] = train_lib.make_eval_render(
                scene.max_sh_degree, view.width, view.height, impl=impl
            )
        img = renders[key](state, *train_lib.camera_arrays(view.params()), bg)
        save_image(np.asarray(jnp.clip(img, 0, 1)), os.path.join(render_path, f"{idx:05d}.png"))
        save_image(view.image, os.path.join(gts_path, f"{idx:05d}.png"))


def render_sets(cfg: ModelConfig, iteration, skip_train=False, skip_test=False):
    scene = Scene(cfg, load_iteration=iteration, shuffle=False)
    state = scene.gaussians
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0])
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if not skip_train:
        render_set(cfg.model_path, "train", scene.loaded_iter,
                   scene.get_train_cameras(), scene, state, bg, impl)
    if not skip_test:
        render_set(cfg.model_path, "test", scene.loaded_iter,
                   scene.get_test_cameras(), scene, state, bg, impl)
    return scene


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    add_config_args(parser, ModelConfig(), "Model Parameters", sentinel=True)
    add_config_args(parser, PipelineConfig(), "Pipeline Parameters")
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = get_combined_args(parser, argv)
    print("Rendering " + args.model_path)
    safe_state(args.quiet)
    render_sets(
        extract_config(args, ModelConfig), args.iteration,
        args.skip_train, args.skip_test,
    )


if __name__ == "__main__":
    main()
