#!/usr/bin/env python
"""Headline benchmark: rasterization throughput at 1080p on one chip.

Measures forward+backward pixels/s of the production rasterizer (Pallas on
TPU, XLA fallback elsewhere) on a synthetic 100k-gaussian scene at
1920x1088, the analog of the reference fps_test.py protocol (1920x1080,
rasterizer-only timing, gaussian_renderer/__init__.py:87-106).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pixels/s", "vs_baseline": N}
vs_baseline normalizes against the reference's real-time claim of 30 fps at
1080p (README.md:16) = 62.2M forward pixels/s; we benchmark the strictly
harder fwd+bwd training step, so vs_baseline >= 1.0 beats the reference's
forward-only headline.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
    from tests.helpers import make_camera, make_random_gaussians

    W, H = 1920, 1088
    N = 100_000
    cam = make_camera(W, H, cam_z=-5.0)
    means, scales, quats, op, sh = make_random_gaussians(
        N, seed=0, sh_degree=3, spread=2.5
    )
    bg = jnp.zeros(3)
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    kw = dict(
        sh_degree=3, max_instances=1 << 20,
        max_per_tile=4096, impl=impl,
    )

    def loss(means, scales, quats, op, sh):
        out = rast.rasterize(means, scales, quats, op, sh, cam, bg, **kw)
        return jnp.mean(out.color ** 2)

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    args = (means, scales, quats, op, sh)

    # compile + warmup
    g = step(*args)
    jax.block_until_ready(g)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*args)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters

    pixels_per_s = W * H / dt
    baseline = 30.0 * 1920 * 1080  # reference: 30 fps @ 1080p, forward-only
    print(
        json.dumps(
            {
                "metric": "1080p_fwd_bwd_rasterize_throughput",
                "value": round(pixels_per_s, 1),
                "unit": "pixels/s",
                "vs_baseline": round(pixels_per_s / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
