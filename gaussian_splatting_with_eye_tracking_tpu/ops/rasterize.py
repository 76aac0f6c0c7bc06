"""Public differentiable rasterization API.

TPU-native replacement for the reference render entry + autograd glue
(gaussian_renderer/__init__.py:18-113 and
diff_gaussian_rasterization/__init__.py:44-221): one function

    rasterize(params..., cam) -> RenderOut

that runs preprocess (ops/projection.py) -> tile binning (ops/binning.py) ->
tile compositing (ops/tile_blend.py pure-XLA path or ops/pallas_blend.py
Pallas kernels), end-to-end differentiable.

The reference's dummy ``screenspace_points`` tensor whose .grad carries
dL/dmean2D for densification stats (gaussian_renderer/__init__.py:26-30,
scene/gaussian_model.py:405-407) becomes an explicit ``means2d_offset`` input:
pass zeros of shape (N, 2) and take ``jax.grad`` w.r.t. it to harvest the
screen-space gradient.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import tile_blend
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import (
    CameraParams,
    preprocess,
)


class RenderOut(NamedTuple):
    """Mirror of the reference render() dict return
    (gaussian_renderer/__init__.py:108-113) plus TPU extras."""

    color: jnp.ndarray  # (3, H, W)
    final_t: jnp.ndarray  # (H, W) remaining transmittance (ImageState.accum_alpha)
    radii: jnp.ndarray  # (N,) int32, 0 = culled (visibility_filter = radii > 0)
    means2d: jnp.ndarray  # (N, 2) screen-space centers
    num_instances: jnp.ndarray  # () int32 live instances (reference num_rendered)
    num_enumerated: jnp.ndarray  # () int32 rect pairs before the ellipse cull
    overflow: jnp.ndarray  # () bool, instance capacity exceeded


@partial(
    jax.jit,
    static_argnames=(
        "sh_degree", "width", "height", "tile", "max_instances",
        "max_live", "max_per_tile", "impl",
    ),
)
def _rasterize_impl(
    means3d, scales, quats, opacities, sh, means2d_offset, bg, active_mask,
    viewmatrix, projmatrix, campos, tan_fovx, tan_fovy, scale_modifier,
    *, sh_degree, width, height, tile, max_instances, max_live,
    max_per_tile, impl,
):
    cam = CameraParams(
        viewmatrix=viewmatrix, projmatrix=projmatrix, campos=campos,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy, width=width, height=height,
    )
    prep = preprocess(
        means3d, scales, quats, opacities, sh, sh_degree, cam,
        tile=tile, active_mask=active_mask, scale_modifier=scale_modifier,
    )
    means2d = prep.means2d + means2d_offset
    grid_x = -(-width // tile)
    grid_y = -(-height // tile)

    if impl == "pallas":
        # fused gather-free path: binning happens inside the custom_vjp
        # (ops/pallas_blend.splat_pallas)
        from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend

        color, final_t, aux = pallas_blend.render_tiles_pallas(
            prep, means2d, grid_x, grid_y, tile, bg,
            max_instances, max_live if max_live is not None else max_instances,
        )
        num_instances, num_enumerated, overflow = aux
    else:
        b = binning_ops.bin_gaussians(
            prep, grid_x, grid_y, max_instances, tile_px=tile,
            max_live=max_live,
        )
        color, final_t = tile_blend.render_tiles_jnp(
            means2d, prep.conics, prep.rgb, prep.opacities,
            b.gauss_id, b.offsets, grid_x, grid_y, tile, bg,
            max_per_tile=max_per_tile,
        )
        num_instances, num_enumerated, overflow = (
            b.num_instances, b.num_enumerated, b.overflow,
        )
    color = color[:, :height, :width]
    final_t = final_t[:height, :width]
    return RenderOut(
        color=color, final_t=final_t, radii=prep.radii, means2d=prep.means2d,
        num_instances=num_instances, num_enumerated=num_enumerated,
        overflow=overflow,
    )


@jax.jit
def mark_visible(means3d: jnp.ndarray, viewmatrix: jnp.ndarray) -> jnp.ndarray:
    """Coarse frustum containment test: (N,) bool, True where the point's
    view-space depth exceeds the near plane.

    Reference: ``_C.mark_visible`` / ``Rasterizer::markVisible``
    (ext.cpp:19, rasterizer_impl.cu:141-153) whose ``in_frustum``
    (auxiliary.h:139-164) reduces to ``p_view.z > 0.2`` — the screen-bound
    test is commented out there, and the projmatrix argument is unused.
    """
    p_view_z = means3d @ viewmatrix[2, :3] + viewmatrix[2, 3]
    return p_view_z > 0.2


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    sh: jnp.ndarray,
    cam: CameraParams,
    bg: jnp.ndarray,
    *,
    sh_degree: int = 3,
    tile: int = 32,
    max_instances: int = 1 << 19,
    max_live: int | None = None,
    max_per_tile: int = 1024,
    active_mask: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    impl: str = "jnp",
    scale_modifier: float = 1.0,
    debug: bool = False,
) -> RenderOut:
    """Differentiable 3DGS rasterization (activated parameters in, image out).

    means3d (N,3); scales (N,3) post-exp; quats (N,4) unnormalized ok;
    opacities (N,) post-sigmoid; sh (N, 3, (sh_degree+1)^2).

    ``debug=True`` dumps all inputs to ``snapshot_fw.npz`` on an exception
    before re-raising (reference crash forensics,
    diff_gaussian_rasterization/__init__.py:83-90).
    """
    n = means3d.shape[0]
    if means2d_offset is None:
        means2d_offset = jnp.zeros((n, 2), means3d.dtype)
    if active_mask is None:
        active_mask = jnp.ones((n,), bool)
    args = (
        means3d, scales, quats, opacities, sh, means2d_offset, bg, active_mask,
        cam.viewmatrix, cam.projmatrix, cam.campos,
        jnp.asarray(cam.tan_fovx, jnp.float32), jnp.asarray(cam.tan_fovy, jnp.float32),
        jnp.asarray(scale_modifier, jnp.float32),
    )
    kwargs = dict(
        sh_degree=sh_degree, width=cam.width, height=cam.height, tile=tile,
        max_instances=max_instances, max_live=max_live,
        max_per_tile=max_per_tile, impl=impl,
    )
    if not debug:
        return _rasterize_impl(*args, **kwargs)
    try:
        return _rasterize_impl(*args, **kwargs)
    except Exception:
        import numpy as np

        names = [
            "means3d", "scales", "quats", "opacities", "sh", "means2d_offset",
            "bg", "active_mask", "viewmatrix", "projmatrix", "campos",
            "tan_fovx", "tan_fovy", "scale_modifier",
        ]
        np.savez("snapshot_fw.npz", **{k: np.asarray(v) for k, v in zip(names, args)})
        print("\nAn error occurred in rasterization: inputs dumped to "
              "snapshot_fw.npz for forensics. Re-raising.")
        raise
