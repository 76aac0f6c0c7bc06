"""Training step + loop building blocks (reference train.py:31-129).

The jitted train step fuses render -> loss -> backward -> Adam update ->
densification-stat accumulation. Density control (densify/prune/opacity
reset) runs as separate jitted state->state transitions on the schedule the
reference uses (densify_from/until_iter, densification_interval,
opacity_reset_interval — arguments/__init__.py:71-89).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from gaussian_splatting_with_eye_tracking_tpu.config import (
    OptimizationConfig,
    RasterizeConfig,
)
from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from gaussian_splatting_with_eye_tracking_tpu.ops import ssim as ssim_ops
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import CameraParams
from gaussian_splatting_with_eye_tracking_tpu import renderer


class StepAux(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    psnr: jnp.ndarray
    num_instances: jnp.ndarray
    num_enumerated: jnp.ndarray
    overflow: jnp.ndarray
    image: jnp.ndarray


def make_train_step(
    tx: optax.GradientTransformation,
    opt: OptimizationConfig,
    max_sh_degree: int,
    width: int,
    height: int,
    impl: str = "auto",
    tile: int = 32,
    max_instances: int = 1 << 20,
    max_live: Optional[int] = None,
    max_per_tile: int = 2048,
):
    """Build the jitted train step for a fixed image resolution."""

    render_kw = dict(
        max_sh_degree=max_sh_degree, impl=impl, tile=tile,
        max_instances=max_instances, max_live=max_live,
        max_per_tile=max_per_tile,
    )

    @jax.jit
    def train_step(
        state: gm.GaussianModelState,
        viewmatrix, projmatrix, campos, tan_fovx, tan_fovy,
        gt, bg, accumulate_stats,
    ):
        cam = CameraParams(
            viewmatrix=viewmatrix, projmatrix=projmatrix, campos=campos,
            tan_fovx=tan_fovx, tan_fovy=tan_fovy, width=width, height=height,
        )
        cap = state.params.xyz.shape[0]
        offset0 = jnp.zeros((cap, 2))

        def loss_fn(params, offset):
            s = state._replace(params=params)
            out = renderer.render(cam, s, bg, means2d_offset=offset, **render_kw)
            l1 = jnp.mean(jnp.abs(out.color - gt))
            ssim_v = ssim_ops.ssim(out.color, gt)
            loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim_v)
            return loss, (out, l1)

        (loss, (out, l1)), (g_params, g_offset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, offset0)

        updates, opt_state = tx.update(g_params, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state._replace(params=params, opt_state=opt_state)

        # densification stats (reference train.py:110-113)
        state = jax.lax.cond(
            accumulate_stats,
            lambda s: gm.add_densification_stats(
                s, g_offset, out.radii, width=width, height=height
            ),
            lambda s: s,
            state,
        )

        mse = jnp.mean((out.color - gt) ** 2)
        aux = StepAux(
            loss=loss, l1=l1,
            psnr=-10.0 * jnp.log10(jnp.maximum(mse, 1e-10)),
            num_instances=out.num_instances,
            num_enumerated=out.num_enumerated, overflow=out.overflow,
            image=out.color,
        )
        return state, aux

    return train_step


def make_eval_render(max_sh_degree, width, height, impl="auto", tile=32,
                     max_instances=1 << 20, max_per_tile=2048):
    @jax.jit
    def eval_render(state, viewmatrix, projmatrix, campos, tan_fovx, tan_fovy,
                    bg, scale_modifier=1.0):
        cam = CameraParams(
            viewmatrix=viewmatrix, projmatrix=projmatrix, campos=campos,
            tan_fovx=tan_fovx, tan_fovy=tan_fovy, width=width, height=height,
        )
        out = renderer.render(
            cam, state, bg, max_sh_degree=max_sh_degree, impl=impl, tile=tile,
            max_instances=max_instances, max_per_tile=max_per_tile,
            scale_modifier=scale_modifier,
        )
        return out.color

    return eval_render


def camera_arrays(cam: CameraParams):
    return (cam.viewmatrix, cam.projmatrix, cam.campos, cam.tan_fovx, cam.tan_fovy)


@functools.partial(jax.jit, static_argnames=("opt_hash",))
def _noop(state, opt_hash=None):
    return state


def densify_step(state, key, opt: OptimizationConfig, extent: float,
                 max_screen_size: float):
    """One densify_and_prune call (reference train.py:114-117)."""
    fn = jax.jit(
        functools.partial(
            gm.densify_and_prune,
            grad_threshold=opt.densify_grad_threshold,
            min_opacity=0.005,
            extent=extent,
            max_screen_size=max_screen_size,
            percent_dense=opt.percent_dense,
        )
    )
    return fn(state, key)
