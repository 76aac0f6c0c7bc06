#!/usr/bin/env python
"""Rasterizer FPS sweep (reference fps_test.py): 1920x1080 x ratio 0.2..2.0,
N views, forward-only timing around the rasterizer call.

Timing is measured by chaining K renders inside one compiled program and
fetching a scalar (device-event analog of the reference's CUDA-event timing,
gaussian_renderer/__init__.py:87-106: excludes host dispatch).

Works on a trained model (-m) or, with --synthetic, on a random scene.
Writes fps_data.json (+ optional matplotlib plot like the reference's).
"""

from __future__ import annotations

import functools
import json
import os
import time
from argparse import ArgumentParser

import numpy as np


def chain_timer(fn, x0, iters=5):
    """Measure per-iteration device time of ``fn`` (x -> x, same
    shape/dtype) by chaining it ``iters`` times UNROLLED inside one jit and
    differencing against a single call (removes the fixed dispatch/fetch
    overhead). Unrolled rather than fori_loop: dynamic-trip-count loops
    around lax.sort compile pathologically slowly (minutes) on this stack.
    """
    import functools

    import jax

    f1 = jax.jit(fn)
    fr = jax.jit(lambda x: functools.reduce(lambda a, _: fn(a), range(1 + iters), x))

    def drain(y):
        np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[:1])

    drain(f1(x0)); drain(fr(x0))
    t1 = time.perf_counter(); drain(f1(x0)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); drain(fr(x0)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


def run_sweep(state, max_sh_degree, active, base=(1920, 1080), ratios=None,
              impl="auto", amr_mode=False, out_json="fps_data.json"):
    import jax
    import jax.numpy as jnp

    from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
    from gaussian_splatting_with_eye_tracking_tpu import renderer as rnd
    from gaussian_splatting_with_eye_tracking_tpu.ops import amr as amr_ops
    from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
    from tests.helpers import make_camera

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    ratios = ratios or [0.2, 0.4, 0.6, 0.8, 1.0, 1.2, 1.4, 1.6, 1.8, 2.0]
    p = state.params
    sh = gm.get_sh(p) * rnd.sh_band_mask(state.sh_degree, max_sh_degree)[None, None, :]
    scales = gm.get_scaling(p)
    ops = gm.get_opacity(p)
    bg = jnp.zeros(3)

    results = []
    for ratio in ratios:
        w = int(base[0] * ratio) // 32 * 32
        h = int(base[1] * ratio) // 32 * 32
        w, h = max(w, 32), max(h, 32)
        cam = make_camera(w, h, cam_z=-5.0)

        if amr_mode:
            def chain_fn(xyz, cam=cam):
                color, _ = amr_ops.render_amr(
                    xyz, scales, p.rotation, ops, sh, max_sh_degree, cam,
                    bg, impl=impl, active_mask=active,
                    max_instances=1 << 20, max_per_tile=2048,
                )
                return xyz + 1e-30 * jnp.mean(color)
        else:
            def chain_fn(xyz, cam=cam):
                out = rast.rasterize(
                    xyz, scales, p.rotation, ops, sh, cam, bg,
                    sh_degree=max_sh_degree, max_instances=1 << 20,
                    max_per_tile=2048, active_mask=active, impl=impl,
                )
                return xyz + 1e-30 * jnp.mean(out.color)

        dt = chain_timer(chain_fn, p.xyz)
        fps = 1.0 / dt
        results.append({"width": w, "height": h, "ratio": ratio,
                        "ms": dt * 1000, "fps": fps})
        print(f"{w}x{h} (ratio {ratio}): {dt*1000:.2f} ms -> {fps:.1f} fps")

    with open(out_json, "w") as f:
        json.dump({"impl": impl, "amr": amr_mode, "results": results}, f, indent=2)
    return results


def plot_results(results, out_png, label):
    """Resolution-vs-fps plot with the reference's overlay curves
    (fps_test.py:72-82: 1.5e8/x^2 and 7e4/x)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    xs = [r["width"] for r in results]
    ys = [r["fps"] for r in results]
    plt.figure()
    plt.plot(xs, ys, "o-", label=label)
    xr = np.linspace(min(xs), max(xs), 100)
    plt.plot(xr, 1.5e8 / xr**2, "--", label="1.5e8/x^2")
    plt.plot(xr, 7e4 / xr, ":", label="7e4/x")
    plt.xlabel("width (px)")
    plt.ylabel("fps")
    plt.yscale("log")
    plt.legend()
    plt.savefig(out_png, dpi=120)


def load_or_synthetic(args):
    import jax.numpy as jnp

    if args.synthetic or not args.model_path:
        from gaussian_splatting_with_eye_tracking_tpu.config import OptimizationConfig
        from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
        from tests.helpers import make_random_gaussians

        n = args.num_gaussians
        rng = np.random.default_rng(0)
        state, _ = gm.create_from_points(
            rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32),
            rng.uniform(size=(n, 3)).astype(np.float32),
            3, OptimizationConfig(), 1.0,
        )
        state = state._replace(sh_degree=jnp.int32(3))
        return state, 3, state.active
    from gaussian_splatting_with_eye_tracking_tpu.config import ModelConfig
    from gaussian_splatting_with_eye_tracking_tpu.scene import Scene

    cfg = ModelConfig(model_path=args.model_path, source_path=args.source_path)
    scene = Scene(cfg, load_iteration=args.iteration, shuffle=False, load_images=False)
    return scene.gaussians, scene.max_sh_degree, scene.gaussians.active


def main(argv=None, amr_mode=False, base=(1920, 1080), ratios=None):
    parser = ArgumentParser()
    parser.add_argument("--model_path", "-m", default="", type=str)
    parser.add_argument("--source_path", "-s", default="", type=str)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--num_gaussians", default=100_000, type=int)
    parser.add_argument("--out", default="", type=str)
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args(argv)

    state, deg, active = load_or_synthetic(args)
    tag = "amr" if amr_mode else "vanilla"
    out_json = args.out or f"fps_data_{tag}.json"
    results = run_sweep(state, deg, active, base=base, ratios=ratios,
                        amr_mode=amr_mode, out_json=out_json)
    if args.plot:
        plot_results(results, out_json.replace(".json", ".png"),
                     f"model: 3DGS-TPU{' AMR' if amr_mode else ''}")


if __name__ == "__main__":
    main()
