"""Naive dense reference rasterizer — the executable spec / test oracle.

Implements, per pixel over ALL gaussians (sorted by depth), the exact
front-to-back compositing semantics of the reference CUDA kernel
(cuda_rasterizer/forward.cu:261-374):

- skip if Mahalanobis ``power > 0`` (forward.cu:335-337),
- alpha = min(0.99, opacity * exp(power)), skip if alpha < 1/255
  (forward.cu:338-343),
- stop (skipping the stopping contribution) when the running transmittance
  would drop below 1e-4 (forward.cu:345-351),
- per-tile rect culling: a gaussian only ever reaches pixels whose tile lies
  inside its screen-space rect (duplicateWithKeys, rasterizer_impl.cu:70-111),
- final color = accumulated + T * background (forward.cu:367-373).

Vectorized with exclusive cumprods instead of a sequential loop, O(pixels x N)
— only for tests and small scenes; the production path is ops/rasterize.py.
Fully differentiable so it also serves as the gradient oracle.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_with_eye_tracking_tpu.ops.projection import Preprocessed

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_MIN = 1e-4


class NaiveRenderOut(NamedTuple):
    color: jnp.ndarray  # (3, H, W)
    final_t: jnp.ndarray  # (H, W) remaining transmittance
    n_contrib: jnp.ndarray  # (H, W) int32, number of applied contributions


def render_naive(
    prep: Preprocessed,
    width: int,
    height: int,
    bg: jnp.ndarray,
    tile: int = 32,
    pixel_chunk: int = 1024,
    exact_stop: bool = True,
) -> NaiveRenderOut:
    """Render by brute force. ``exact_stop=False`` disables the T<1e-4 early
    stop (the production kernels' continuous relaxation — differs from the
    exact semantics by < 1e-4 per channel)."""
    order = jnp.argsort(prep.depths, stable=True)
    xy = prep.means2d[order]
    conic = prep.conics[order]
    rgb = prep.rgb[order]
    op = prep.opacities[order]
    visible = prep.radii[order] > 0
    rmin = prep.rect_min[order]
    rmax = prep.rect_max[order]

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    pix = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)  # (P, 2)
    tiles = jnp.stack(
        [(xs.ravel() / tile).astype(jnp.int32), (ys.ravel() / tile).astype(jnp.int32)],
        axis=-1,
    )  # (P, 2) tile coords

    n_pix = width * height
    pad = (-n_pix) % pixel_chunk
    pix_p = jnp.pad(pix, ((0, pad), (0, 0)))
    tiles_p = jnp.pad(tiles, ((0, pad), (0, 0)))
    pix_chunks = pix_p.reshape(-1, pixel_chunk, 2)
    tile_chunks = tiles_p.reshape(-1, pixel_chunk, 2)

    def chunk_fn(args):
        pc, tc = args  # (C,2) float pix, (C,2) int tile
        d = xy[None, :, :] - pc[:, None, :]  # (C, N, 2)
        dx, dy = d[..., 0], d[..., 1]
        power = (
            -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy)
            - conic[None, :, 1] * dx * dy
        )
        alpha_raw = op[None, :] * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
        in_rect = (
            (tc[:, None, 0] >= rmin[None, :, 0])
            & (tc[:, None, 0] < rmax[None, :, 0])
            & (tc[:, None, 1] >= rmin[None, :, 1])
            & (tc[:, None, 1] < rmax[None, :, 1])
        )
        eligible = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_rect & visible[None, :]
        a = jnp.where(eligible, alpha, 0.0)

        one_minus = 1.0 - a
        # Exclusive cumulative transmittance over eligible contributions.
        t_before = jnp.concatenate(
            [jnp.ones_like(a[..., :1]), jnp.cumprod(one_minus, axis=-1)[..., :-1]],
            axis=-1,
        )
        if exact_stop:
            stop = eligible & (t_before * (1.0 - alpha) < T_MIN)
            done_before = jnp.concatenate(
                [
                    jnp.zeros_like(stop[..., :1]),
                    jax.lax.cummax(stop.astype(jnp.int32), axis=stop.ndim - 1)[..., :-1] > 0,
                ],
                axis=-1,
            )
            applied = eligible & ~stop & ~done_before
        else:
            applied = eligible
        w = jnp.where(applied, a * t_before, 0.0)
        color = jnp.einsum("pn,nc->pc", w, rgb)
        final_t = jnp.prod(jnp.where(applied, one_minus, 1.0), axis=-1)
        n_contrib = jnp.sum(applied, axis=-1).astype(jnp.int32)
        return color + final_t[:, None] * bg[None, :], final_t, n_contrib

    colors, final_ts, n_contribs = jax.lax.map(
        chunk_fn, (pix_chunks, tile_chunks)
    )
    color = colors.reshape(-1, 3)[:n_pix].reshape(height, width, 3)
    final_t = final_ts.reshape(-1)[:n_pix].reshape(height, width)
    n_contrib = n_contribs.reshape(-1)[:n_pix].reshape(height, width)
    return NaiveRenderOut(
        color=jnp.transpose(color, (2, 0, 1)), final_t=final_t, n_contrib=n_contrib
    )
