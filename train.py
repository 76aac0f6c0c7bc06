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
    RasterizeConfig,
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
    instance_capacity=None,
    capacity_bucket=1 << 17,
):
    # Multi-PROCESS runs (ADVICE r4 #1): the model state lives as GLOBAL
    # fully-replicated arrays on a mesh spanning every process's devices.
    # Each process replays the identical (seeded) host loop, so every jitted
    # step/densify/eval is the same SPMD program launched collectively; the
    # orbax save then receives true global arrays (each process writes its
    # addressable shards) instead of racing process-local copies. File IO
    # and logging gate on process 0.
    dist = jax.process_count() > 1
    is_main = jax.process_index() == 0
    if dist:
        from gaussian_splatting_with_eye_tracking_tpu.parallel import multihost

        mesh = multihost.make_global_mesh()

        def _rep(tree):
            return multihost.replicate_to_mesh(tree, mesh)
    else:

        def _rep(tree):
            return tree

    if dist and gui is not None:
        gui = None  # jitted GUI renders would be collective; viewer is 1-proc

    if not cfg.model_path:
        cfg.model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
    os.makedirs(cfg.model_path, exist_ok=True)
    if is_main:
        save_cfg_args(cfg.model_path, cfg)
    tb = _try_tensorboard(cfg.model_path) if is_main else None

    scene = Scene(cfg, opt, seed=random_order_seed)
    state, tx = scene.gaussians, scene.tx
    first_iter = 0
    if start_checkpoint:
        if os.path.isdir(start_checkpoint):  # orbax checkpoint directory
            state, first_iter = ckpt.load_checkpoint_orbax(start_checkpoint)
        else:
            state, first_iter = ckpt.load_checkpoint(start_checkpoint)
        print(f"Restored checkpoint at iteration {first_iter}")
    state = _rep(state)

    bg = _rep(jnp.asarray(
        [1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0]))
    cams = scene.get_train_cameras()
    cam_cache = {}  # camera -> replicated (cam_args, gt) in dist mode

    def cam_inputs(cam):
        if not dist:
            return (*train_lib.camera_arrays(cam.params()), cam.gt())
        if cam.image_name not in cam_cache:
            cam_cache[cam.image_name] = tuple(
                _rep(a) for a in
                (*train_lib.camera_arrays(cam.params()), cam.gt()))
        return cam_cache[cam.image_name]
    # one jitted step per distinct (resolution, instance-capacity) pair
    steps = {}
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"

    # Adaptive instance capacity (the reference allocates its duplicate-
    # instance buffers at exactly num_rendered per frame via resize
    # closures, rasterize_points.cu:26-33; XLA needs static shapes, so we
    # bucket and recompile on growth). Oversized capacity is pure waste:
    # the binning sort, feature gather, and gradient reduction all scale
    # with it (~20% of step time at 1080p for a 40% oversize). Undersized
    # capacity silently truncates the render, so overflowed steps are
    # REDONE at the grown capacity (the step is pure state -> state).
    cap_bucket = capacity_bucket
    cap = max(instance_capacity or RasterizeConfig().max_instances, cap_bucket)
    # live capacity (ellipse-culled instances that reach the sorted list and
    # every downstream stage) adapts independently of the rect-enumeration
    # capacity; it starts equal and tightens from measured live counts
    cap_live = cap
    shrink_streak = 0

    def _grow(above):
        c = cap_bucket
        while c <= above:
            c += max(cap_bucket, c // 2)  # ~x1.5 steps on bucket grid
        return -(-c // cap_bucket) * cap_bucket

    def step_for(cam):
        key = (cam.width, cam.height, cap, cap_live)
        if key not in steps:
            steps[key] = train_lib.make_train_step(
                tx, opt, max_sh_degree=scene.max_sh_degree,
                width=cam.width, height=cam.height, impl=impl,
                max_instances=cap, max_live=min(cap_live, cap),
            )
        return steps[key]

    rng = np.random.default_rng(random_order_seed)
    stack = []
    key = jax.random.PRNGKey(random_order_seed)
    ema_loss = 0.0
    t_start = time.time()

    # Deferred step bookkeeping: fetching aux.overflow right after dispatch
    # would drain the async queue every iteration (a full host round-trip
    # per step). Instead the check for step i runs AFTER step i+1 is
    # dispatched — its fetch overlaps i+1's execution, keeping the dispatch
    # queue >= 1 deep — except at host-mutation boundaries (densify, reset,
    # eval, save, GUI), which resolve synchronously.
    pending = None  # (iteration, cam, prev_state, step_args, state, aux)

    def _resolve(p):
        """Overflow redo + capacity adaptation + logging for a dispatched
        step. Returns (post-step state, redo_happened)."""
        nonlocal cap, cap_live, shrink_streak, ema_loss
        it_p, cam_p, prev_p, args_p, state_p, aux_p = p
        redone = False
        if bool(aux_p.overflow):
            # grow capacities and REDO from the pre-step state: an
            # overflowed step rendered (and differentiated) a truncated
            # instance list
            cap = _grow(max(int(aux_p.num_enumerated), cap))
            cap_live = _grow(max(int(aux_p.num_instances), cap_live))
            shrink_streak = 0
            if not quiet:
                print(f"[it {it_p}] instance capacity -> "
                      f"{cap}/{cap_live} (overflow redo)")
            state_p, aux_p = step_for(cam_p)(prev_p, *args_p)
            redone = True
        else:
            ne = int(aux_p.num_enumerated)
            ni = int(aux_p.num_instances)
            if ne > 0.9 * cap or ni > 0.9 * cap_live:
                # grow ahead of overflow
                cap = _grow(max(int(ne * 1.3), cap))
                cap_live = _grow(max(int(ni * 1.3), cap_live))
                shrink_streak = 0
            elif (ne < 0.35 * cap or ni < 0.35 * cap_live) and (
                cap > cap_bucket or cap_live > cap_bucket
            ):
                shrink_streak += 1
                if shrink_streak >= 200:  # sustained headroom: shed the waste
                    cap = _grow(int(ne * 1.6))
                    cap_live = _grow(int(ni * 1.6))
                    shrink_streak = 0
            else:
                shrink_streak = 0

        loss_p = float(aux_p.loss)
        if not np.isfinite(loss_p):
            # Numerical tripwire (VERDICT r4 weak #6): one non-finite loss
            # means the Adam update that was just applied is NaN — abort NOW
            # with the pre-step state on disk instead of silently training a
            # corpse for the rest of the schedule.
            dump = os.path.join(cfg.model_path, f"nanstep{it_p}.ckpt")
            if is_main:
                ckpt.save_checkpoint(dump, prev_p, it_p - 1)
            raise FloatingPointError(
                f"non-finite loss {loss_p} at iteration {it_p} "
                f"(camera {cam_p.image_name}); pre-step state saved to {dump}"
            )
        ema_loss = 0.4 * loss_p + 0.6 * ema_loss
        if it_p % 100 == 0 and not quiet:
            n = int(gm.num_active(state_p))
            print(
                f"[it {it_p}/{opt.iterations}] loss={ema_loss:.5f} "
                f"psnr={float(aux_p.psnr):.2f} points={n} "
                f"({(time.time()-t_start):.1f}s)"
            )
        if tb and it_p % 10 == 0:
            tb.add_scalar("train_loss_patches/total_loss", float(aux_p.loss), it_p)
            tb.add_scalar("train_loss_patches/l1_loss", float(aux_p.l1), it_p)
        return state_p, redone

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
        step_args = (
            *cam_inputs(cam), bg,
            iteration < opt.densify_until_iter,
        )
        sync_after = (
            gui is not None
            or (iteration < opt.densify_until_iter and (
                (densify_phase
                 and iteration % opt.densification_interval == 0)
                or iteration % opt.opacity_reset_interval == 0
                or (cfg.white_background
                    and iteration == opt.densify_from_iter)))
            or iteration in testing_iterations
            or iteration in saving_iterations
            or iteration in checkpoint_iterations
            or iteration == opt.iterations
        )
        prev_state = state
        state, aux = step_for(cam)(state, *step_args)
        if pending is not None:
            fixed, redone = _resolve(pending)
            if redone:
                # the step above consumed a truncated predecessor: replay
                # it on the corrected state (at the grown capacity),
                # re-applying this iteration's pre-step mutations (the SH
                # bump above ran on the now-discarded stale state)
                if iteration % 1000 == 0:
                    fixed = gm.oneup_sh_degree(fixed, scene.max_sh_degree)
                prev_state = fixed
                state, aux = step_for(cam)(prev_state, *step_args)
        pending = (iteration, cam, prev_state, step_args, state, aux)
        if sync_after:
            state, _ = _resolve(pending)
            pending = None

        # density control (reference train.py:110-120)
        if iteration < opt.densify_until_iter:
            if densify_phase and iteration % opt.densification_interval == 0:
                # grow the POINT capacity ahead of saturation (the
                # reference torch.cats unboundedly; static shapes make
                # growth a host-side re-pad + re-jit — gm.grow_capacity).
                # 85% headroom: one densify round can clone+split up to
                # ~2x the high-grad set.
                n_act = int(gm.num_active(state))
                cap_pts = state.params.xyz.shape[0]
                if n_act > 0.85 * cap_pts and cap_pts < (1 << 22):
                    state = gm.grow_capacity(state, cap_pts * 2)
                    if is_main and not quiet:
                        print(f"[it {iteration}] point capacity -> "
                              f"{cap_pts * 2} ({n_act} active)")
                key, sub = jax.random.split(key)
                max_screen = 20.0 if iteration > opt.opacity_reset_interval else 0.0
                state, info = train_lib.densify_step(
                    state, _rep(np.asarray(sub)), opt, scene.cameras_extent,
                    max_screen
                )
            if iteration % opt.opacity_reset_interval == 0 or (
                cfg.white_background and iteration == opt.densify_from_iter
            ):
                state = gm.reset_opacity(state)

        if iteration in testing_iterations:
            # every process joins (the jitted evals are collective over the
            # global mesh in dist mode); only process 0 prints/logs
            _report(scene, state, bg, iteration, tb, impl,
                    cam_inputs=cam_inputs, quiet=not is_main)
        if iteration in saving_iterations:
            if is_main:
                print(f"\n[ITER {iteration}] Saving Gaussians")
                scene.gaussians = state
                scene.save(iteration)
        if iteration in checkpoint_iterations:
            print(f"\n[ITER {iteration}] Saving Checkpoint")
            if jax.process_count() > 1:
                # multi-host: orbax coordinates the distributed write
                # (async; drained below before exit)
                ckpt.save_checkpoint_orbax(
                    os.path.join(cfg.model_path, f"chkpnt{iteration}.orbax"),
                    state, iteration, async_save=True,
                )
            else:
                ckpt.save_checkpoint(
                    os.path.join(cfg.model_path, f"chkpnt{iteration}.ckpt"),
                    state, iteration,
                )

    ckpt.wait_for_async_saves()
    scene.gaussians = state
    return scene, state


def _report(scene, state, bg, iteration, tb, impl, cam_inputs=None, quiet=False):
    from gaussian_splatting_with_eye_tracking_tpu import train_lib as tl

    if cam_inputs is None:
        def cam_inputs(cam):
            return (*tl.camera_arrays(cam.params()), cam.gt())

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
            *cam_args, gt = cam_inputs(cam)
            img = renders[key](state, *cam_args, bg)
            img = jnp.clip(img, 0, 1)
            l1s.append(float(jnp.mean(jnp.abs(img - gt))))
            mse = float(jnp.mean((img - gt) ** 2))
            psnrs.append(-10 * np.log10(max(mse, 1e-10)))
        if quiet:
            continue
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

    # multi-HOST runs (BASELINE config 5): autodetects
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID and
    # initializes jax.distributed BEFORE any device use; single-process
    # no-op. Checkpoints switch to orbax dirs (save from every process);
    # logging/IO below gates on process 0 exactly like the reference gates
    # tqdm on a single process.
    from gaussian_splatting_with_eye_tracking_tpu.parallel import multihost

    distributed = multihost.maybe_initialize_distributed()
    if distributed and jax.process_index() != 0:
        args.quiet = True
        args.disable_viewer = True

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
