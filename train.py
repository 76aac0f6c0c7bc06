#!/usr/bin/env python
"""Training CLI (reference train.py:190-216 / training() :31-129).

Usage: python train.py -s <scene_dir> [-m <model_dir>] [--iterations 30000] ...
"""

from __future__ import annotations

import os
import sys
import time
import uuid
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_with_eye_tracking_tpu import train_lib
from gaussian_splatting_with_eye_tracking_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    add_config_args,
    extract_config,
    save_cfg_args,
)
from gaussian_splatting_with_eye_tracking_tpu.models import checkpoint as ckpt
from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from gaussian_splatting_with_eye_tracking_tpu.scene import Scene
from gaussian_splatting_with_eye_tracking_tpu.utils.general_utils import safe_state


def training(
    cfg: ModelConfig,
    opt: OptimizationConfig,
    pipe: PipelineConfig,
    testing_iterations,
    saving_iterations,
    checkpoint_iterations,
    start_checkpoint,
    quiet=False,
    gui=None,
    random_order_seed=0,
):
    if not cfg.model_path:
        cfg.model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
    os.makedirs(cfg.model_path, exist_ok=True)
    save_cfg_args(cfg.model_path, cfg)
    tb = _try_tensorboard(cfg.model_path)

    scene = Scene(cfg, opt, seed=random_order_seed)
    state, tx = scene.gaussians, scene.tx
    first_iter = 0
    if start_checkpoint:
        state, first_iter = ckpt.load_checkpoint(start_checkpoint)
        print(f"Restored checkpoint at iteration {first_iter}")

    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0])
    cams = scene.get_train_cameras()
    # one jitted step per distinct resolution
    steps = {}
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"

    def step_for(cam):
        key = (cam.width, cam.height)
        if key not in steps:
            steps[key] = train_lib.make_train_step(
                tx, opt, max_sh_degree=scene.max_sh_degree,
                width=cam.width, height=cam.height, impl=impl,
            )
        return steps[key]

    rng = np.random.default_rng(random_order_seed)
    stack = []
    key = jax.random.PRNGKey(random_order_seed)
    ema_loss = 0.0
    t_start = time.time()

    for iteration in range(first_iter + 1, opt.iterations + 1):
        if gui is not None:
            gui.poll(state, scene, pipe, iteration, opt.iterations)
        if iteration % 1000 == 0:
            state = gm.oneup_sh_degree(state, scene.max_sh_degree)

        if not stack:
            stack = list(rng.permutation(len(cams)))
        cam = cams[stack.pop()]
        densify_phase = (
            iteration < opt.densify_until_iter and iteration >= opt.densify_from_iter
        )
        state, aux = step_for(cam)(
            state, *train_lib.camera_arrays(cam.params()), cam.gt(), bg,
            iteration < opt.densify_until_iter,
        )

        if bool(aux.overflow):
            print(f"[it {iteration}] WARNING: instance-capacity overflow (truncated render)")

        # density control (reference train.py:110-120)
        if iteration < opt.densify_until_iter:
            if densify_phase and iteration % opt.densification_interval == 0:
                key, sub = jax.random.split(key)
                max_screen = 20.0 if iteration > opt.opacity_reset_interval else 0.0
                state, info = train_lib.densify_step(
                    state, sub, opt, scene.cameras_extent, max_screen
                )
            if iteration % opt.opacity_reset_interval == 0 or (
                cfg.white_background and iteration == opt.densify_from_iter
            ):
                state = gm.reset_opacity(state)

        ema_loss = 0.4 * float(aux.loss) + 0.6 * ema_loss
        if iteration % 100 == 0 and not quiet:
            n = int(gm.num_active(state))
            print(
                f"[it {iteration}/{opt.iterations}] loss={ema_loss:.5f} "
                f"psnr={float(aux.psnr):.2f} points={n} "
                f"({(time.time()-t_start):.1f}s)"
            )
        if tb and iteration % 10 == 0:
            tb.add_scalar("train_loss_patches/total_loss", float(aux.loss), iteration)
            tb.add_scalar("train_loss_patches/l1_loss", float(aux.l1), iteration)

        if iteration in testing_iterations:
            _report(scene, state, bg, iteration, tb, impl)
        if iteration in saving_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            scene.gaussians = state
            scene.save(iteration)
        if iteration in checkpoint_iterations:
            print(f"\n[ITER {iteration}] Saving Checkpoint")
            ckpt.save_checkpoint(
                os.path.join(cfg.model_path, f"chkpnt{iteration}.ckpt"),
                state, iteration,
            )

    scene.gaussians = state
    return scene, state


def _report(scene, state, bg, iteration, tb, impl):
    from gaussian_splatting_with_eye_tracking_tpu import train_lib as tl

    renders = {}
    for name, cams in [
        ("test", scene.get_test_cameras()),
        ("train", scene.get_train_cameras()[:5]),
    ]:
        if not cams:
            continue
        l1s, psnrs = [], []
        for cam in cams:
            key = (cam.width, cam.height)
            if key not in renders:
                renders[key] = tl.make_eval_render(
                    scene.max_sh_degree, cam.width, cam.height, impl=impl
                )
            img = renders[key](state, *tl.camera_arrays(cam.params()), bg)
            img = jnp.clip(img, 0, 1)
            gt = cam.gt()
            l1s.append(float(jnp.mean(jnp.abs(img - gt))))
            mse = float(jnp.mean((img - gt) ** 2))
            psnrs.append(-10 * np.log10(max(mse, 1e-10)))
        print(
            f"\n[ITER {iteration}] Evaluating {name}: "
            f"L1 {np.mean(l1s):.4f} PSNR {np.mean(psnrs):.2f}"
        )
        if tb:
            tb.add_scalar(f"{name}/loss_viewpoint - l1_loss", np.mean(l1s), iteration)
            tb.add_scalar(f"{name}/loss_viewpoint - psnr", np.mean(psnrs), iteration)
    if tb:
        tb.add_scalar("total_points", int(gm.num_active(state)), iteration)


def _try_tensorboard(model_path):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(model_path)
    except Exception:
        print("Tensorboard not available: not logging progress")
        return None


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    mc, oc, pc = ModelConfig(), OptimizationConfig(), PipelineConfig()
    add_config_args(parser, mc, "Model Parameters")
    add_config_args(parser, oc, "Optimization Parameters")
    add_config_args(parser, pc, "Pipeline Parameters")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[7_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--disable_viewer", action="store_true", default=False)
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    print("Optimizing " + (args.model_path or ""))
    safe_state(args.quiet)
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    gui = None
    if not args.disable_viewer:
        try:
            from gaussian_splatting_with_eye_tracking_tpu.renderer import network_gui

            gui = network_gui.NetworkGUI(args.ip, args.port)
        except Exception as e:
            print(f"Viewer server disabled: {e}")

    training(
        extract_config(args, ModelConfig),
        extract_config(args, OptimizationConfig),
        extract_config(args, PipelineConfig),
        set(args.test_iterations),
        set(args.save_iterations),
        set(args.checkpoint_iterations),
        args.start_checkpoint,
        quiet=args.quiet,
        gui=gui,
    )
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
