#!/usr/bin/env python
"""Which part of preprocess's vjp is pathological? Time sub-vjps."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import sh as sh_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import transforms as tf
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
from tests.helpers import make_camera, make_random_gaussians

W, H, N = 1920, 1088, 300_000


def timeit(fn, *args, iters=8):
    @jax.jit
    def chained(k, *args):
        def body(i, acc):
            out = fn(*args, i)
            return acc + sum(jnp.sum(l[..., -1:]) for l in
                             jax.tree_util.tree_leaves(out))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    _ = float(chained(1, *args))
    t1 = time.perf_counter(); _ = float(chained(1, *args)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, *args)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


def main():
    cam = make_camera(W, H, cam_z=-5.0)
    means, scales, quats, op, sh = make_random_gaussians(
        N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0))
    ct3 = jnp.ones((N, 3))
    ct1 = jnp.ones((N,))

    def s_sh_fwd(m, shc, i):
        rgb, _ = sh_ops.sh_to_rgb(3, shc, m * (1 + 1e-12 * i), cam.campos)
        return (rgb,)

    print(f"sh_to_rgb fwd      : {timeit(s_sh_fwd, means, sh)*1e3:8.3f} ms",
          flush=True)

    def s_sh(m, shc, c, i):
        def f(m_, sh_):
            rgb, _ = sh_ops.sh_to_rgb(3, sh_, m_ * (1 + 1e-12 * i), cam.campos)
            return jnp.sum(rgb * c)

        return jax.grad(f, argnums=(0, 1))(m, shc)

    print(f"sh_to_rgb vjp      : {timeit(s_sh, means, sh, ct3)*1e3:8.3f} ms",
          flush=True)

    def s_cov_fwd(s, q, i):
        return (tf.build_cov3d(s * (1 + 1e-12 * i), q),)

    print(f"build_cov3d fwd    : {timeit(s_cov_fwd, scales, quats)*1e3:8.3f} ms",
          flush=True)

    def s_cov(s, q, c, i):
        def f(s_, q_):
            cov = tf.build_cov3d(s_ * (1 + 1e-12 * i), q_)
            return jnp.sum(cov[:, :3] * c)

        return jax.grad(f, argnums=(0, 1))(s, q)

    print(f"build_cov3d vjp    : {timeit(s_cov, scales, quats, ct3)*1e3:8.3f} ms",
          flush=True)

    def s_ewa(m, s, q, c, i):
        def f(m_, s_, q_):
            cov3d = tf.build_cov3d(s_, q_)
            cov2d = tf.ewa_project(
                m_ * (1 + 1e-12 * i), cov3d, cam.viewmatrix,
                W / (2 * cam.tan_fovx), H / (2 * cam.tan_fovy),
                cam.tan_fovx, cam.tan_fovy)
            return jnp.sum(cov2d * c)

        return jax.grad(f, argnums=(0, 1, 2))(m, s, q)

    print(f"cov3d+ewa vjp      : {timeit(s_ewa, means, scales, quats, ct3)*1e3:8.3f} ms",
          flush=True)

    def s_full(m, s, q, o, shc, i):
        def f(m_, s_, q_, o_, sh_):
            p = preprocess(m_ * (1 + 1e-12 * i), s_, q_, o_, sh_, 3, cam,
                           tile=32)
            return (jnp.sum(p.means2d) + jnp.sum(p.conics) + jnp.sum(p.rgb)
                    + jnp.sum(p.opacities))

        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(m, s, q, o, shc)

    print(f"preprocess full vjp: {timeit(s_full, means, scales, quats, op, sh)*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
