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

    The common case (no precomputed colors/cov3d, sh_degree <= 3) routes
    through a HAND-DERIVED custom_vjp (the TPU analog of the reference's
    hand-written backward.cu:144-396) — XLA's autodiff of this graph
    lowers pathologically (~11 ms in-pipeline at N=300k vs a 0.45 ms
    forward; the transpose of the (N,3,K) SH slice chain and the scalar
    guard `where`s dominate). The hand VJP is pure fused column
    arithmetic. The general case falls back to the autodiff body below.
    """
    if colors_precomp is None and cov3d_precomp is None and sh_degree <= 3:
        maskf = (
            jnp.ones(means3d.shape[0], jnp.float32) if active_mask is None
            else active_mask.astype(jnp.float32)
        )
        static = (sh_degree, tile, cam.width, cam.height, float(near))
        return _preprocess_cvjp(
            static, means3d, scales, quats, opacities, sh, maskf,
            cam.viewmatrix, cam.projmatrix, cam.campos,
            jnp.asarray(cam.tan_fovx, jnp.float32),
            jnp.asarray(cam.tan_fovy, jnp.float32),
            jnp.asarray(scale_modifier, jnp.float32),
        )
    return _preprocess_autodiff(
        means3d, scales, quats, opacities, sh, sh_degree, cam, tile,
        active_mask, scale_modifier, colors_precomp, cov3d_precomp, near,
    )


def _preprocess_autodiff(
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
    """The reference implementation (XLA autodiff supplies the VJP)."""
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


# ---------------------------------------------------------------------------
# Hand-derived VJP (TPU analog of reference backward.cu:144-396)
# ---------------------------------------------------------------------------
#
# XLA's autodiff of the preprocess graph is correct but lowers badly on TPU
# (see preprocess() docstring). The math below is the same chain the CUDA
# reference hand-writes — computeCov2DCUDA (backward.cu:144-274: dconic ->
# dcov2D -> dJ/dM -> dmean_view/dcov3D), preprocessCUDA backward
# (:347-396: projection + cov3D -> scale/rot) and computeColorFromSH
# (:20-139: SH chain with clamp gating + dnormvdv) — expressed as (N,)
# column arithmetic so XLA fuses the whole backward into a few elementwise
# kernels. Cross-checked against jax.grad of _preprocess_autodiff to ~1e-6
# relative (tests/test_math_ops.py::TestPreprocessCustomVJP).

from functools import partial as _partial

from gaussian_splatting_with_eye_tracking_tpu.ops.sh import C0, C1, C2, C3


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _preprocess_cvjp(static, means3d, scales, quats, opacities, sh, maskf,
                     viewmatrix, projmatrix, campos, tan_fovx, tan_fovy,
                     scale_modifier):
    sh_degree, tile, width, height, near = static
    cam = CameraParams(viewmatrix=viewmatrix, projmatrix=projmatrix,
                       campos=campos, tan_fovx=tan_fovx, tan_fovy=tan_fovy,
                       width=width, height=height)
    return _preprocess_autodiff(
        means3d, scales, quats, opacities, sh, sh_degree, cam, tile,
        maskf > 0.5, scale_modifier, None, None, near)


def _pre_fwd(static, means3d, scales, quats, opacities, sh, maskf,
             viewmatrix, projmatrix, campos, tan_fovx, tan_fovy,
             scale_modifier):
    out = _preprocess_cvjp(static, means3d, scales, quats, opacities, sh,
                           maskf, viewmatrix, projmatrix, campos, tan_fovx,
                           tan_fovy, scale_modifier)
    res = (means3d, scales, quats, opacities, sh, maskf, viewmatrix,
           projmatrix, campos, tan_fovx, tan_fovy, scale_modifier)
    return out, res


def _pre_bwd(static, res, ct):
    sh_degree, tile, width, height, near = static
    (means3d, scales, quats, opacities, sh, maskf, viewmatrix, projmatrix,
     campos, tan_fovx, tan_fovy, scale_modifier) = res

    d_means2d = ct.means2d
    d_depths = ct.depths
    d_conics = ct.conics
    d_rgb = ct.rgb
    d_opac = ct.opacities

    W = viewmatrix
    P = projmatrix
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]

    # ---- recompute the forward quantities the chain needs (cheap; the
    # forward itself is ~0.45 ms, saving residuals would cost more HBM) ----
    t0 = W[0, 0] * mx + W[0, 1] * my + W[0, 2] * mz + W[0, 3]
    t1 = W[1, 0] * mx + W[1, 1] * my + W[1, 2] * mz + W[1, 3]
    t2 = W[2, 0] * mx + W[2, 1] * my + W[2, 2] * mz + W[2, 3]
    depths = t2
    vis0 = (depths > near) & (maskf > 0.5)

    p_hom_x = P[0, 0] * mx + P[0, 1] * my + P[0, 2] * mz + P[0, 3]
    p_hom_y = P[1, 0] * mx + P[1, 1] * my + P[1, 2] * mz + P[1, 3]
    p_w_raw = P[3, 0] * mx + P[3, 1] * my + P[3, 2] * mz + P[3, 3]
    p_w = jnp.where(vis0, p_w_raw + 1e-7, 1.0)

    # rotation entries from the normalized quaternion
    qn = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    qr, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    R00 = 1 - 2 * (qy * qy + qz * qz)
    R01 = 2 * (qx * qy - qr * qz)
    R02 = 2 * (qx * qz + qr * qy)
    R10 = 2 * (qx * qy + qr * qz)
    R11 = 1 - 2 * (qx * qx + qz * qz)
    R12 = 2 * (qy * qz - qr * qx)
    R20 = 2 * (qx * qz - qr * qy)
    R21 = 2 * (qy * qz + qr * qx)
    R22 = 1 - 2 * (qx * qx + qy * qy)

    s = scale_modifier * scales
    u0, u1, u2 = s[:, 0] ** 2, s[:, 1] ** 2, s[:, 2] ** 2
    v00 = R00 * R00 * u0 + R01 * R01 * u1 + R02 * R02 * u2
    v01 = R00 * R10 * u0 + R01 * R11 * u1 + R02 * R12 * u2
    v02 = R00 * R20 * u0 + R01 * R21 * u1 + R02 * R22 * u2
    v11 = R10 * R10 * u0 + R11 * R11 * u1 + R12 * R12 * u2
    v12 = R10 * R20 * u0 + R11 * R21 * u1 + R12 * R22 * u2
    v22 = R20 * R20 * u0 + R21 * R21 * u1 + R22 * R22 * u2

    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tz = jnp.where(jnp.abs(t2) < 1e-4, 1e-4, t2)
    rx = t0 / tz
    ry = t1 / tz
    crx = jnp.clip(rx, -limx, limx)
    cry = jnp.clip(ry, -limy, limy)
    inside_x = (rx >= -limx) & (rx <= limx)
    inside_y = (ry >= -limy) & (ry <= limy)
    tx = crx * tz
    ty = cry * tz
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z

    Wm = W[:3, :3]
    # M = Wm V Wm^T (entries needed by the J-chain)
    def _wv_row(i):
        wi0, wi1, wi2 = Wm[i, 0], Wm[i, 1], Wm[i, 2]
        return (wi0 * v00 + wi1 * v01 + wi2 * v02,
                wi0 * v01 + wi1 * v11 + wi2 * v12,
                wi0 * v02 + wi1 * v12 + wi2 * v22)

    a0 = _wv_row(0)
    a1 = _wv_row(1)
    a2 = _wv_row(2)

    def _m_entry(ai, l):
        return ai[0] * Wm[l, 0] + ai[1] * Wm[l, 1] + ai[2] * Wm[l, 2]

    m00 = _m_entry(a0, 0)
    m01 = _m_entry(a0, 1)
    m02 = _m_entry(a0, 2)
    m11 = _m_entry(a1, 1)
    m12 = _m_entry(a1, 2)
    m22 = _m_entry(a2, 2)
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2
    a = j00 * (j00 * m00 + j02 * m02) + j02 * (j00 * m02 + j02 * m22) + 0.3
    b = j00 * (j11 * m01 + j12 * m02) + j02 * (j11 * m12 + j12 * m22)
    c = j11 * (j11 * m11 + j12 * m12) + j12 * (j11 * m12 + j12 * m22) + 0.3
    det = a * c - b * b
    detvalid = det != 0.0
    det_safe = jnp.where(detvalid, det, 1.0)

    # ---- conic -> cov2d (2x2 inverse transpose; backward.cu:226-230) ----
    dca, dcb, dcc = d_conics[:, 0], d_conics[:, 1], d_conics[:, 2]
    inv_det2 = jnp.where(detvalid, 1.0 / (det_safe * det_safe), 0.0)
    d_a = inv_det2 * (-c * c * dca + b * c * dcb - b * b * dcc)
    d_b = inv_det2 * (2 * b * c * dca - (a * c + b * b) * dcb
                      + 2 * a * b * dcc)
    d_c = inv_det2 * (-b * b * dca + a * b * dcb - a * a * dcc)

    # ---- cov2d -> J entries and M entries (backward.cu:196-224) ----
    d_m00 = d_a * j00 * j00
    d_m01 = d_b * j00 * j11
    d_m02 = 2 * d_a * j00 * j02 + d_b * j00 * j12
    d_m11 = d_c * j11 * j11
    d_m12 = d_b * j02 * j11 + 2 * d_c * j11 * j12
    d_m22 = d_a * j02 * j02 + d_b * j02 * j12 + d_c * j12 * j12

    d_j00 = 2 * d_a * (j00 * m00 + j02 * m02) + d_b * (j11 * m01 + j12 * m02)
    d_j02 = 2 * d_a * (j00 * m02 + j02 * m22) + d_b * (j11 * m12 + j12 * m22)
    d_j11 = 2 * d_c * (j11 * m11 + j12 * m12) + d_b * (j00 * m01 + j02 * m12)
    d_j12 = 2 * d_c * (j11 * m12 + j12 * m22) + d_b * (j00 * m02 + j02 * m22)

    # ---- J -> (tx, ty, tz) (backward.cu:184-194) ----
    d_tx = -focal_x * inv_z2 * d_j02
    d_ty = -focal_y * inv_z2 * d_j12
    d_tz = (-focal_x * inv_z2 * d_j00
            - focal_y * inv_z2 * d_j11
            + 2.0 * focal_x * tx * inv_z2 * inv_z * d_j02
            + 2.0 * focal_y * ty * inv_z2 * inv_z * d_j12)

    # FOV-clamp gating (backward.cu:175-176, exact form: a clipped point's
    # tx = +-lim * tz still moves with tz)
    d_t0 = jnp.where(inside_x, d_tx, 0.0)
    d_t1 = jnp.where(inside_y, d_ty, 0.0)
    d_tz = (d_tz
            + jnp.where(inside_x, 0.0, crx * d_tx)
            + jnp.where(inside_y, 0.0, cry * d_ty))
    d_t2 = jnp.where(jnp.abs(t2) < 1e-4, 0.0, d_tz) + d_depths

    # ---- M -> V: d_V = Wm^T G Wm with G the symmetrized cotangent ----
    g00, g11, g22 = d_m00, d_m11, d_m22
    g01, g02, g12 = 0.5 * d_m01, 0.5 * d_m02, 0.5 * d_m12

    def _gw_col(l):
        # (G Wm)[:, l] as three columns
        w0l, w1l, w2l = Wm[0, l], Wm[1, l], Wm[2, l]
        return (g00 * w0l + g01 * w1l + g02 * w2l,
                g01 * w0l + g11 * w1l + g12 * w2l,
                g02 * w0l + g12 * w1l + g22 * w2l)

    gw0 = _gw_col(0)
    gw1 = _gw_col(1)
    gw2 = _gw_col(2)

    def _b_entry(k, gwl):
        return Wm[0, k] * gwl[0] + Wm[1, k] * gwl[1] + Wm[2, k] * gwl[2]

    d_v00 = _b_entry(0, gw0)
    d_v01 = 2.0 * _b_entry(0, gw1)
    d_v02 = 2.0 * _b_entry(0, gw2)
    d_v11 = _b_entry(1, gw1)
    d_v12 = 2.0 * _b_entry(1, gw2)
    d_v22 = _b_entry(2, gw2)

    # ---- V -> (R entries, u) (backward.cu computeCov3D bwd :278-341) ----
    h00, h11, h22 = d_v00, d_v11, d_v22
    h01, h02, h12 = 0.5 * d_v01, 0.5 * d_v02, 0.5 * d_v12
    # d_u_i = (R^T H R)_ii
    hr0_0 = h00 * R00 + h01 * R10 + h02 * R20
    hr0_1 = h00 * R01 + h01 * R11 + h02 * R21
    hr0_2 = h00 * R02 + h01 * R12 + h02 * R22
    hr1_0 = h01 * R00 + h11 * R10 + h12 * R20
    hr1_1 = h01 * R01 + h11 * R11 + h12 * R21
    hr1_2 = h01 * R02 + h11 * R12 + h12 * R22
    hr2_0 = h02 * R00 + h12 * R10 + h22 * R20
    hr2_1 = h02 * R01 + h12 * R11 + h22 * R21
    hr2_2 = h02 * R02 + h12 * R12 + h22 * R22
    d_u0 = R00 * hr0_0 + R10 * hr1_0 + R20 * hr2_0
    d_u1 = R01 * hr0_1 + R11 * hr1_1 + R21 * hr2_1
    d_u2 = R02 * hr0_2 + R12 * hr1_2 + R22 * hr2_2
    # d_R = 2 H R U  (U = diag(u))
    d_R00 = 2.0 * hr0_0 * u0
    d_R01 = 2.0 * hr0_1 * u1
    d_R02 = 2.0 * hr0_2 * u2
    d_R10 = 2.0 * hr1_0 * u0
    d_R11 = 2.0 * hr1_1 * u1
    d_R12 = 2.0 * hr1_2 * u2
    d_R20 = 2.0 * hr2_0 * u0
    d_R21 = 2.0 * hr2_1 * u1
    d_R22 = 2.0 * hr2_2 * u2

    d_scales = jnp.stack(
        [2.0 * scale_modifier * scale_modifier * scales[:, 0] * d_u0,
         2.0 * scale_modifier * scale_modifier * scales[:, 1] * d_u1,
         2.0 * scale_modifier * scale_modifier * scales[:, 2] * d_u2],
        axis=-1)

    # ---- R -> normalized quaternion -> quaternion ----
    d_qr = (-2 * qz * d_R01 + 2 * qy * d_R02 + 2 * qz * d_R10
            - 2 * qx * d_R12 - 2 * qy * d_R20 + 2 * qx * d_R21)
    d_qx = (2 * qy * d_R01 + 2 * qz * d_R02 + 2 * qy * d_R10
            - 4 * qx * d_R11 - 2 * qr * d_R12 + 2 * qz * d_R20
            + 2 * qr * d_R21 - 4 * qx * d_R22)
    d_qy = (-4 * qy * d_R00 + 2 * qx * d_R01 + 2 * qr * d_R02
            + 2 * qx * d_R10 + 2 * qz * d_R12 - 2 * qr * d_R20
            + 2 * qz * d_R21 - 4 * qy * d_R22)
    d_qz = (-4 * qz * d_R00 - 2 * qr * d_R01 + 2 * qx * d_R02
            + 2 * qr * d_R10 - 4 * qz * d_R11 + 2 * qy * d_R12
            + 2 * qx * d_R20 + 2 * qy * d_R21)
    d_qn = jnp.stack([d_qr, d_qx, d_qy, d_qz], axis=-1)
    qnorm = jnp.linalg.norm(quats, axis=-1, keepdims=True)
    d_quats = (d_qn - qn * jnp.sum(qn * d_qn, axis=-1, keepdims=True)) / qnorm

    # ---- means2d -> means3d through the projection (backward.cu:373-383) --
    d_ndc_x = d_means2d[:, 0] * (0.5 * width)
    d_ndc_y = d_means2d[:, 1] * (0.5 * height)
    inv_w = 1.0 / p_w
    d_p_hom_x = d_ndc_x * inv_w
    d_p_hom_y = d_ndc_y * inv_w
    d_p_w = jnp.where(
        vis0,
        -(d_ndc_x * p_hom_x + d_ndc_y * p_hom_y) * inv_w * inv_w,
        0.0)

    # ---- SH chain (backward.cu computeColorFromSH :20-139) ----
    dvx = mx - campos[0]
    dvy = my - campos[1]
    dvz = mz - campos[2]
    dn = jnp.sqrt(dvx * dvx + dvy * dvy + dvz * dvz)
    inv_dn = 1.0 / dn
    x = dvx * inv_dn
    y = dvy * inv_dn
    z = dvz * inv_dn

    K = sh.shape[-1]
    basis_cols = [jnp.full_like(x, C0)]
    if sh_degree > 0:
        basis_cols += [-C1 * y, C1 * z, -C1 * x]
        if sh_degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            basis_cols += [
                C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz, C2[4] * (xx - yy),
            ]
            if sh_degree > 2:
                basis_cols += [
                    C3[0] * y * (3 * xx - yy),
                    C3[1] * xy * z,
                    C3[2] * y * (4 * zz - xx - yy),
                    C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    C3[4] * x * (4 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3 * yy),
                ]
    nb = len(basis_cols)
    basis = jnp.stack(basis_cols, axis=-1)  # (N, nb)

    # clamp gating: rgb = max(eval + 0.5, 0)
    rgb_pre = jnp.einsum("nk,nck->nc", basis, sh[..., :nb],
                         precision=jax.lax.Precision.HIGHEST) + 0.5
    d_pre = jnp.where(rgb_pre < 0.0, 0.0, d_rgb)  # (N,3)

    d_sh = d_pre[:, :, None] * basis[:, None, :]  # (N,3,nb)
    if nb < K:
        d_sh = jnp.concatenate(
            [d_sh, jnp.zeros(sh.shape[:2] + (K - nb,), sh.dtype)], axis=-1)

    d_x = jnp.zeros_like(x)
    d_y = jnp.zeros_like(y)
    d_z = jnp.zeros_like(z)
    if sh_degree > 0:
        # w_k = sum_c sh[:, c, k] * d_pre[:, c]
        w = jnp.einsum("nck,nc->nk", sh[..., :nb], d_pre,
                       precision=jax.lax.Precision.HIGHEST)
        d_x += -C1 * w[:, 3]
        d_y += -C1 * w[:, 1]
        d_z += C1 * w[:, 2]
        if sh_degree > 1:
            w4, w5, w6, w7, w8 = (w[:, 4], w[:, 5], w[:, 6], w[:, 7], w[:, 8])
            d_x += (C2[0] * y * w4 - 2 * C2[2] * x * w6 + C2[3] * z * w7
                    + 2 * C2[4] * x * w8)
            d_y += (C2[0] * x * w4 + C2[1] * z * w5 - 2 * C2[2] * y * w6
                    - 2 * C2[4] * y * w8)
            d_z += C2[1] * y * w5 + 4 * C2[2] * z * w6 + C2[3] * x * w7
            if sh_degree > 2:
                w9, w10, w11 = w[:, 9], w[:, 10], w[:, 11]
                w12, w13, w14, w15 = w[:, 12], w[:, 13], w[:, 14], w[:, 15]
                d_x += (C3[0] * 6 * xy * w9
                        + C3[1] * yz * w10
                        - C3[2] * 2 * xy * w11
                        - C3[3] * 6 * xz * w12
                        + C3[4] * (4 * zz - 3 * xx - yy) * w13
                        + C3[5] * 2 * xz * w14
                        + C3[6] * (3 * xx - 3 * yy) * w15)
                d_y += (C3[0] * (3 * xx - 3 * yy) * w9
                        + C3[1] * xz * w10
                        + C3[2] * (4 * zz - xx - 3 * yy) * w11
                        - C3[3] * 6 * yz * w12
                        - C3[4] * 2 * xy * w13
                        - C3[5] * 2 * yz * w14
                        - C3[6] * 6 * xy * w15)
                d_z += (C3[1] * xy * w10
                        + C3[2] * 8 * yz * w11
                        + C3[3] * (6 * zz - 3 * xx - 3 * yy) * w12
                        + C3[4] * 8 * xz * w13
                        + C3[5] * (xx - yy) * w14)

    # dnormvdv (auxiliary.h:107-132): d_v = (d_dir - dir (dir . d_dir)) / |v|
    dot = x * d_x + y * d_y + z * d_z
    d_dvx = (d_x - x * dot) * inv_dn
    d_dvy = (d_y - y * dot) * inv_dn
    d_dvz = (d_z - z * dot) * inv_dn

    # ---- accumulate d_means3d from all chains ----
    d_mx = (d_p_hom_x * P[0, 0] + d_p_hom_y * P[1, 0] + d_p_w * P[3, 0]
            + W[0, 0] * d_t0 + W[1, 0] * d_t1 + W[2, 0] * d_t2 + d_dvx)
    d_my = (d_p_hom_x * P[0, 1] + d_p_hom_y * P[1, 1] + d_p_w * P[3, 1]
            + W[0, 1] * d_t0 + W[1, 1] * d_t1 + W[2, 1] * d_t2 + d_dvy)
    d_mz = (d_p_hom_x * P[0, 2] + d_p_hom_y * P[1, 2] + d_p_w * P[3, 2]
            + W[0, 2] * d_t0 + W[1, 2] * d_t1 + W[2, 2] * d_t2 + d_dvz)
    d_means3d = jnp.stack([d_mx, d_my, d_mz], axis=-1)

    # ---- opacity passthrough (gated by the FINAL visibility) ----
    rect_visible = _recompute_final_visible(
        static, means3d, opacities, maskf, viewmatrix, projmatrix,
        tan_fovx, tan_fovy, a, b, c, det, vis0, p_hom_x, p_hom_y, p_w)
    d_opacities = jnp.where(rect_visible, d_opac, 0.0)

    zeros_like = jnp.zeros_like
    return (d_means3d, d_scales, d_quats, d_opacities, d_sh,
            zeros_like(maskf), zeros_like(viewmatrix), zeros_like(projmatrix),
            zeros_like(campos), zeros_like(tan_fovx), zeros_like(tan_fovy),
            zeros_like(scale_modifier))


def _recompute_final_visible(static, means3d, opacities, maskf, viewmatrix,
                             projmatrix, tan_fovx, tan_fovy, a, b, c, det,
                             vis0, p_hom_x, p_hom_y, p_w):
    """The forward's final `visible` mask (near & mask & det & tiles>0)."""
    sh_degree, tile, width, height, near = static
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    mean_x = tf.ndc_to_pix(p_hom_x / p_w, width)
    mean_y = tf.ndc_to_pix(p_hom_y / p_w, height)
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, 0.0)))
    ln_op = jnp.log(jnp.maximum(255.0 * opacities, 1.0))
    ext_x = jnp.minimum(jnp.ceil(jnp.sqrt(jnp.maximum(2.0 * a * ln_op, 1e-12))), radius)
    ext_y = jnp.minimum(jnp.ceil(jnp.sqrt(jnp.maximum(2.0 * c * ln_op, 1e-12))), radius)
    rect_min_x = jnp.clip(((mean_x - ext_x) / tile).astype(jnp.int32), 0, grid_x)
    rect_min_y = jnp.clip(((mean_y - ext_y) / tile).astype(jnp.int32), 0, grid_y)
    rect_max_x = jnp.clip(((mean_x + ext_x + tile - 1) / tile).astype(jnp.int32), 0, grid_x)
    rect_max_y = jnp.clip(((mean_y + ext_y + tile - 1) / tile).astype(jnp.int32), 0, grid_y)
    tiles = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)
    return vis0 & (det != 0.0) & (tiles > 0)


_preprocess_cvjp.defvjp(_pre_fwd, _pre_bwd)
