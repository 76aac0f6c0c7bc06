"""Shared test fixtures: synthetic cameras and random Gaussian scenes."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.ops import transforms as tf
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import CameraParams


def make_camera(width=64, height=64, fovx=math.radians(60), fovy=None, cam_z=-5.0):
    """A camera at (0,0,cam_z) looking down +z toward the origin."""
    if fovy is None:
        fovy = fovx
    R = np.eye(3)
    t = np.array([0.0, 0.0, -cam_z])  # world->view translation
    view = tf.world_to_view(R, t)
    proj = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    full = (proj @ view).astype(np.float32)
    cam_center = np.linalg.inv(view)[:3, 3]
    return CameraParams(
        viewmatrix=jnp.asarray(view),
        projmatrix=jnp.asarray(full),
        campos=jnp.asarray(cam_center.astype(np.float32)),
        tan_fovx=math.tan(fovx / 2),
        tan_fovy=math.tan(fovy / 2),
        width=width,
        height=height,
    )


def make_orbit_camera(azimuth, elevation=0.3, radius=5.0, width=64, height=64,
                      fovx=math.radians(60), fovy=None, target=(0.0, 0.0, 0.0)):
    """A camera on a sphere of ``radius`` around ``target``, looking at it.
    Multi-view analog of make_camera for training regressions (the reference
    trains from COLMAP orbits, scene/dataset_readers.py)."""
    if fovy is None:
        fovy = fovx
    target = np.asarray(target, np.float64)
    p = target + radius * np.array(
        [
            math.cos(elevation) * math.sin(azimuth),
            math.sin(elevation),
            -math.cos(elevation) * math.cos(azimuth),
        ]
    )
    f = target - p
    f = f / np.linalg.norm(f)
    up = np.array([0.0, 1.0, 0.0])
    r = np.cross(up, f)
    r = r / np.linalg.norm(r)
    u = np.cross(f, r)
    Rv = np.stack([r, u, f])  # world->view rotation (camera looks down +z)
    t = -Rv @ p
    view = tf.world_to_view(Rv.T, t)
    proj = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    full = (proj @ view).astype(np.float32)
    return CameraParams(
        viewmatrix=jnp.asarray(view.astype(np.float32)),
        projmatrix=jnp.asarray(full),
        campos=jnp.asarray(p.astype(np.float32)),
        tan_fovx=math.tan(fovx / 2),
        tan_fovy=math.tan(fovy / 2),
        width=width,
        height=height,
    )


def make_random_gaussians(n=500, seed=0, sh_degree=0, spread=1.5, depth_range=(3.0, 7.0),
                          scale_range=(-3.5, -2.0)):
    """Random gaussians in front of the make_camera() viewpoint (world z>0)."""
    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread, spread, n),
            rng.uniform(depth_range[0] - 5.0, depth_range[1] - 5.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.uniform(scale_range[0], scale_range[1], (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacities = rng.uniform(0.2, 0.95, n).astype(np.float32)
    k = (sh_degree + 1) ** 2
    sh = rng.normal(scale=0.3, size=(n, 3, k)).astype(np.float32)
    sh[:, :, 0] += 0.8
    return (
        jnp.asarray(means),
        jnp.asarray(scales),
        jnp.asarray(quats),
        jnp.asarray(opacities),
        jnp.asarray(sh),
    )
