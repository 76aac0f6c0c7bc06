"""High-level render API (reference gaussian_renderer/__init__.py:18-113).

``render(camera, state, ...)`` applies the model activations and calls the
differentiable rasterizer; returns the same quantities as the reference
render dict: render / viewspace grads handle / visibility_filter / radii.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import CameraParams


def sh_band_mask(sh_degree, max_sh_degree: int) -> jnp.ndarray:
    """(K,) mask of SH coefficients active at ``sh_degree`` (dynamic).

    Replaces the reference's degree-sliced SH evaluation
    (forward.cu:20-71 switch on degree): coefficients beyond the active
    degree are zeroed so they receive no gradient — identical annealing
    semantics (reference oneupSHdegree, scene/gaussian_model.py:120-122).
    """
    k = (max_sh_degree + 1) ** 2
    idx = jnp.arange(k)
    band = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return band <= sh_degree


def render(
    cam: CameraParams,
    state: gm.GaussianModelState,
    bg: jnp.ndarray,
    *,
    max_sh_degree: int = 3,
    scale_modifier: float = 1.0,
    means2d_offset: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    tile: int = 32,
    max_instances: int = 1 << 20,
    max_live: Optional[int] = None,
    max_per_tile: int = 2048,
) -> rast.RenderOut:
    import jax

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    p = state.params
    sh = gm.get_sh(p) * sh_band_mask(state.sh_degree, max_sh_degree)[None, None, :]
    return rast.rasterize(
        p.xyz,
        gm.get_scaling(p),
        p.rotation,
        gm.get_opacity(p),
        sh,
        cam,
        bg,
        sh_degree=max_sh_degree,
        tile=tile,
        max_instances=max_instances,
        max_live=max_live,
        max_per_tile=max_per_tile,
        active_mask=state.active,
        means2d_offset=means2d_offset,
        impl=impl,
        scale_modifier=scale_modifier,
    )
