"""Camera / rigid-transform / covariance math, pure JAX.

Capability parity with the reference's math helpers:
- utils/graphics_utils.py:31-77 (getWorld2View2, getProjectionMatrix, fov/focal)
- utils/general_utils.py:78-110 (build_rotation, build_scaling_rotation)
- cuda_rasterizer/forward.cu:74-152 (computeCov2D EWA projection, computeCov3D)

Conventions (differ from the reference's transposed-row-major torch tensors;
chosen so plain matmul works): matrices act on COLUMN vectors,
``x_cam = view @ [x_world, 1]``. The camera looks down +z in view space.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# fov <-> focal (reference utils/graphics_utils.py:73-77)
# ---------------------------------------------------------------------------

def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


# ---------------------------------------------------------------------------
# View / projection matrices
# ---------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """World->camera 4x4 (reference getWorld2View2, utils/graphics_utils.py:38-50).

    ``R`` is the camera-to-world rotation as stored by the COLMAP reader
    (the reference stores ``R = qvec2rotmat(...).T``, scene/dataset_readers.py),
    ``t`` the world-to-camera translation. ``translate``/``scale`` optionally
    recentre/rescale the camera position (used for scene normalization).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        cam_center = C2W[:3, 3]
        cam_center = (cam_center + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection 4x4 (reference getProjectionMatrix,
    utils/graphics_utils.py:52-71): maps view space to clip space with
    z in [0, zfar], w = z_view."""
    tan_half_fovx = math.tan(fovx / 2.0)
    tan_half_fovy = math.tan(fovy / 2.0)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right

    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


# ---------------------------------------------------------------------------
# Quaternions and covariances (vectorized over leading axis N)
# ---------------------------------------------------------------------------

def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) wxyz quaternions -> (N, 3, 3) rotations, normalizing first
    (reference build_rotation, utils/general_utils.py:78-99)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def _quat_rot_cols(q: jnp.ndarray):
    """(N, 4) wxyz quaternions -> the 9 rotation-matrix entries as (N,)
    columns (row-major R00..R22), normalizing first. UNPACKED on purpose:
    (N, 3, 3) arrays put a 3x3 block on the (8, 128)-tiled minor dims, and
    the autodiff transpose of batched tiny matmuls over that layout
    measured 12-24 ms/step at N=300k (profile_prep_bwd) vs <1 ms for the
    same math as elementwise (N,) column arithmetic."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    )


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0) -> jnp.ndarray:
    """(N,3) activated scales + (N,4) quaternions -> (N,6) upper-triangular
    world covariance [xx, xy, xz, yy, yz, zz]
    (reference computeCov3D, forward.cu:118-152; build_scaling_rotation,
    utils/general_utils.py:101-110: Sigma = (R S)(R S)^T = R diag(s^2) R^T).

    Fully unpacked into (N,) column arithmetic — see _quat_rot_cols for why
    (the (N,3,3) formulation's vjp is 15-30x slower on TPU)."""
    R00, R01, R02, R10, R11, R12, R20, R21, R22 = _quat_rot_cols(quats)
    s = scale_modifier * scales
    u0, u1, u2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    xx = R00 * R00 * u0 + R01 * R01 * u1 + R02 * R02 * u2
    xy = R00 * R10 * u0 + R01 * R11 * u1 + R02 * R12 * u2
    xz = R00 * R20 * u0 + R01 * R21 * u1 + R02 * R22 * u2
    yy = R10 * R10 * u0 + R11 * R11 * u1 + R12 * R12 * u2
    yz = R10 * R20 * u0 + R11 * R21 * u1 + R12 * R22 * u2
    zz = R20 * R20 * u0 + R21 * R21 * u1 + R22 * R22 * u2
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def cov3d_to_matrix(cov6: jnp.ndarray) -> jnp.ndarray:
    """(N,6) packed -> (N,3,3) symmetric."""
    xx, xy, xz, yy, yz, zz = [cov6[..., i] for i in range(6)]
    return jnp.stack(
        [jnp.stack([xx, xy, xz], -1),
         jnp.stack([xy, yy, yz], -1),
         jnp.stack([xz, yz, zz], -1)],
        axis=-2,
    )


def ewa_project(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
    low_pass: float = 0.3,
) -> jnp.ndarray:
    """EWA 2D covariance (reference computeCov2D, forward.cu:74-113).

    means3d (N,3) world, cov3d (N,6) packed, viewmatrix (4,4) column-vector
    convention. Returns (N,3) packed 2D covariance [a, b, c] with the +0.3 px
    low-pass added to the diagonal.
    """
    t = means3d @ viewmatrix[:3, :3].T + viewmatrix[:3, 3]  # (N,3) view space
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    # Points behind/at the camera plane are frustum-culled upstream (z<=0.2);
    # keep tz away from 0 so their (zero-cotangent) grads stay finite.
    tz = t[..., 2]
    tz = jnp.where(jnp.abs(tz) < 1e-4, 1e-4, tz)
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J = d(image)/d(view) rows: [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]
    # M = W V W^T (view-space covariance), fully UNPACKED into (N,) column
    # arithmetic with the constant W entries as scalars: the einsum over
    # (N,3,3) arrays puts 3x3 blocks on the (8,128)-tiled minor dims and
    # its autodiff transpose measured ~11 ms/step at N=300k
    # (profile_prep_bwd); the same math as columns is <1 ms.
    Wm = viewmatrix[:3, :3]
    v00, v01, v02 = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    v11, v12, v22 = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]

    def wv_row(i):
        # A[i, k] = sum_j W[i, j] V[j, k] for k = 0, 1, 2
        wi0, wi1, wi2 = Wm[i, 0], Wm[i, 1], Wm[i, 2]
        return (
            wi0 * v00 + wi1 * v01 + wi2 * v02,
            wi0 * v01 + wi1 * v11 + wi2 * v12,
            wi0 * v02 + wi1 * v12 + wi2 * v22,
        )

    a0 = wv_row(0)
    a1 = wv_row(1)
    a2 = wv_row(2)

    def m_entry(ai, l):
        return ai[0] * Wm[l, 0] + ai[1] * Wm[l, 1] + ai[2] * Wm[l, 2]

    m00 = m_entry(a0, 0)
    m01 = m_entry(a0, 1)
    m02 = m_entry(a0, 2)
    m11 = m_entry(a1, 1)
    m12 = m_entry(a1, 2)
    m22 = m_entry(a2, 2)
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2
    # cov2d = J M J^T with J (N,2,3) sparse; expand manually (M symmetric).
    a = j00 * (j00 * m00 + j02 * m02) + j02 * (j00 * m02 + j02 * m22)
    b = j00 * (j11 * m01 + j12 * m02) + j02 * (j11 * m12 + j12 * m22)
    c = j11 * (j11 * m11 + j12 * m12) + j12 * (j11 * m12 + j12 * m22)
    return jnp.stack([a + low_pass, b, c + low_pass], axis=-1)


def ndc_to_pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """NDC [-1,1] -> pixel center coordinates (reference auxiliary.h ndc2Pix)."""
    return ((v + 1.0) * size - 1.0) * 0.5
