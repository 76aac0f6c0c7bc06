"""Per-Gaussian preprocessing: project, EWA 2D covariance, conic, radii, tile rects.

TPU-native equivalent of the CUDA ``preprocessCUDA`` kernel
(reference cuda_rasterizer/forward.cu:155-256) as vectorized JAX over all N
gaussians at once — XLA fuses the whole thing into a handful of elementwise
kernels, and its backward pass falls out of autodiff (replacing the
hand-derived reference backward.cu:144-396).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_with_eye_tracking_tpu.ops import sh as sh_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import transforms as tf


class CameraParams(NamedTuple):
    """Static-per-frame camera data consumed by the rasterizer.

    Mirrors GaussianRasterizationSettings (reference
    diff_gaussian_rasterization/__init__.py:144-158) minus the torch plumbing.
    """

    viewmatrix: jnp.ndarray  # (4,4) world->view, column-vector convention
    projmatrix: jnp.ndarray  # (4,4) full = proj @ view
    campos: jnp.ndarray  # (3,)
    tan_fovx: float
    tan_fovy: float
    width: int
    height: int


class Preprocessed(NamedTuple):
    """Per-gaussian screen-space quantities (reference GeometryState,
    rasterizer_impl.h:155-170)."""

    means2d: jnp.ndarray  # (N,2) pixel coords
    depths: jnp.ndarray  # (N,) view-space z
    conics: jnp.ndarray  # (N,3) inverse 2D covariance [a,b,c]
    rgb: jnp.ndarray  # (N,3) view-dependent color
    opacities: jnp.ndarray  # (N,)
    radii: jnp.ndarray  # (N,) int32 screen-space radius, 0 = culled
    tiles_touched: jnp.ndarray  # (N,) int32
    rect_min: jnp.ndarray  # (N,2) int32 tile-rect [x,y]
    rect_max: jnp.ndarray  # (N,2) int32 (exclusive)
    # opacity-aware cull threshold ln(255*op): a pixel at Mahalanobis
    # quadratic q = -power passes the blend's alpha >= 1/255 gate iff
    # q <= cull_thr, so tiles whose whole pixel rect has q > cull_thr are
    # provably zero-contribution. None = skip per-tile ellipse culling.
    cull_thr: Optional[jnp.ndarray] = None


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    sh: jnp.ndarray,
    sh_degree: int,
    cam: CameraParams,
    tile: int = 32,
    active_mask: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    near: float = 0.2,
) -> Preprocessed:
    """Vectorized preprocess (reference forward.cu:155-256).

    means3d (N,3), scales (N,3) activated, quats (N,4), opacities (N,)
    activated, sh (N, 3, K). ``active_mask`` (N,) bool kills padded capacity
    slots (TPU replacement for the reference's dynamic point counts).
    """
    N = means3d.shape[0]
    grid_x = (cam.width + tile - 1) // tile
    grid_y = (cam.height + tile - 1) // tile

    # Near culling (reference in_frustum, auxiliary.h:139-164: view z > 0.2).
    p_view = means3d @ cam.viewmatrix[:3, :3].T + cam.viewmatrix[:3, 3]
    depths = p_view[:, 2]
    visible = depths > near
    if active_mask is not None:
        visible = visible & active_mask

    # Projection to NDC then pixels (forward.cu:197-200, 233).
    p_hom = means3d @ cam.projmatrix[:3, :3].T + cam.projmatrix[:3, 3]
    p_w = means3d @ cam.projmatrix[3, :3] + cam.projmatrix[3, 3]
    # Guard culled points: w near zero would make grads inf, and
    # 0-cotangent * inf = NaN under autodiff.
    p_w = jnp.where(visible, p_w + 1e-7, 1.0)
    p_proj = p_hom / p_w[:, None]
    mean_x = tf.ndc_to_pix(p_proj[:, 0], cam.width)
    mean_y = tf.ndc_to_pix(p_proj[:, 1], cam.height)
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    # 3D covariance (forward.cu:118-152) unless precomputed.
    cov3d = cov3d_precomp if cov3d_precomp is not None else tf.build_cov3d(scales, quats, scale_modifier)

    focal_x = cam.width / (2.0 * cam.tan_fovx)
    focal_y = cam.height / (2.0 * cam.tan_fovy)
    cov2d = tf.ewa_project(
        means3d, cov3d, cam.viewmatrix, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy
    )
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    visible = visible & (det != 0.0)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # Screen-space radius = ceil(3 sqrt(max eigenvalue)) (forward.cu:229-232).
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda_max = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda_max, 0.0)))

    # Opacity-aware EXACT extents for tile binning. The set of pixels that
    # can pass the blend's alpha >= 1/255 gate (forward.cu:344-346) is the
    # ellipse {d : d^T conic d <= 2 ln(255 op)}; everything outside it
    # contributes exactly zero color and zero gradient, so tighter binning
    # is output-identical. Two bounds, both clamped to the reference's
    # 3-sigma radius (which defines the truncation semantics):
    #   - per-axis ellipse bbox half-widths sqrt(2 a ln), sqrt(2 c ln) for
    #     the tile RECT (the reference always bins the full 3-sigma square,
    #     auxiliary.h getRect, and wastes blend work on tiles an elongated
    #     or translucent gaussian never reaches);
    #   - the threshold ln(255 op) itself (cull_thr) for the exact
    #     ellipse-vs-tile-rect cull in ops/binning.py.
    # ``radii`` keeps the 3-sigma semantics (densification stats).
    ln_op = jnp.log(jnp.maximum(255.0 * opacities, 1.0))
    # NOTE: no 3-sigma cap here — the blend itself has no Mahalanobis gate
    # (truncation in the reference comes only from the binning rect,
    # forward.cu:344-346 gates on alpha alone), so the alpha bound is the
    # only test that keeps the cull output-exact.
    cull_thr = jax.lax.stop_gradient(ln_op)
    ext_x = jnp.ceil(jnp.sqrt(jnp.maximum(2.0 * a * ln_op, 1e-12)))
    ext_y = jnp.ceil(jnp.sqrt(jnp.maximum(2.0 * c * ln_op, 1e-12)))
    ext_x = jax.lax.stop_gradient(jnp.minimum(ext_x, radius))
    ext_y = jax.lax.stop_gradient(jnp.minimum(ext_y, radius))

    # Tile rectangle (auxiliary.h getRect) over the alpha-aware extents.
    rect_min_x = jnp.clip(((mean_x - ext_x) / tile).astype(jnp.int32), 0, grid_x)
    rect_min_y = jnp.clip(((mean_y - ext_y) / tile).astype(jnp.int32), 0, grid_y)
    rect_max_x = jnp.clip(((mean_x + ext_x + tile - 1) / tile).astype(jnp.int32), 0, grid_x)
    rect_max_y = jnp.clip(((mean_y + ext_y + tile - 1) / tile).astype(jnp.int32), 0, grid_y)
    tiles_touched = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)
    visible = visible & (tiles_touched > 0)

    radii = jnp.where(visible, radius, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(visible, tiles_touched, 0).astype(jnp.int32)

    # View-dependent color (forward.cu:20-71) unless precomputed.
    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        rgb, _ = sh_ops.sh_to_rgb(sh_degree, sh, means3d, cam.campos)

    return Preprocessed(
        means2d=means2d,
        depths=depths,
        conics=conics,
        rgb=rgb,
        opacities=jnp.where(visible, opacities, 0.0),
        radii=radii,
        tiles_touched=tiles_touched,
        rect_min=jnp.stack([rect_min_x, rect_min_y], axis=-1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], axis=-1),
        cull_thr=cull_thr,
    )
