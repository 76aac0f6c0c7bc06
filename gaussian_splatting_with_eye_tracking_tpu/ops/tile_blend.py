"""Tile-parallel alpha compositing in pure JAX (XLA) — the vectorized
formulation shared by the Pallas kernel.

TPU-native re-formulation of the CUDA per-tile blend loop
(cuda_rasterizer/forward.cu:261-374). Instead of one thread per pixel walking
the tile's depth-sorted gaussian list sequentially, each tile computes, for a
block of instances at once:

    alpha[p, i]   (pixels x instances, VPU elementwise)
    logT[p, i]  = cumsum_excl_i log(1 - alpha)        (log-space scan)
    w[p, i]     = exp(logT) * alpha                    (weights)
    color[p, c] = w @ rgb                              (MXU matmul)

The per-pixel early-stop of the CUDA kernel (T < 1e-4 -> break) is relaxed to
chunk granularity in the Pallas kernel and dropped here; the resulting color
difference is bounded by T_MIN (= 1e-4) per channel (see
ops/reference.py::render_naive(exact_stop=...) and its test).

Instances are the depth-sorted per-tile lists from ops/binning.py, padded to a
static ``max_per_tile`` capacity (XLA static shapes replace the CUDA
dynamic ranges)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


class TileBlendOut(NamedTuple):
    color: jnp.ndarray  # (T, P, 3)
    final_t: jnp.ndarray  # (T, P)
    # per-pixel count of alpha-blended contributions (the reference's
    # ImageState.n_contrib, rasterizer_impl.cu:172-179: its backward walks
    # each pixel's list back from this index; our backward reconstructs
    # transmittance from logT instead, so this is a debug/parity output)
    n_contrib: jnp.ndarray


def dense_tile_instances(gauss_id, offsets, max_per_tile, counts=None):
    """CSR instance list -> dense (num_tiles, max_per_tile) gaussian indices +
    validity mask. Truncates tiles denser than the cap (reported upstream).
    ``counts`` optionally overrides per-tile lengths (used by AMR level
    gating to collapse skipped tiles to zero work)."""
    num_tiles = offsets.shape[0] - 1
    k = gauss_id.shape[0]
    if counts is None:
        ends = offsets[1:]
    else:
        ends = offsets[:-1] + counts
    idx = offsets[:-1, None] + jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    valid = idx < ends[:, None]
    g = gauss_id[jnp.clip(idx, 0, k - 1)]
    return g, valid, num_tiles


def blend_tile_block(px, py, xy, conic, rgb, op, valid, bg):
    """Composite one block of tiles.

    px, py: (T, P) pixel coords; xy (T, M, 2), conic (T, M, 3), rgb (T, M, 3),
    op (T, M), valid (T, M) for the tiles' instance lists (front-to-back).
    Returns color (T, P, 3) incl. background and final transmittance (T, P).
    """
    dx = xy[:, None, :, 0] - px[:, :, None]  # (T, P, M)
    dy = xy[:, None, :, 1] - py[:, :, None]
    a_ = conic[:, None, :, 0]
    b_ = conic[:, None, :, 1]
    c_ = conic[:, None, :, 2]
    power = -0.5 * (a_ * dx * dx + c_ * dy * dy) - b_ * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op[:, None, :] * jnp.exp(jnp.minimum(power, 0.0)))
    keep = valid[:, None, :] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(keep, alpha, 0.0)

    # log-transmittance: log1p(-alpha) is exact for alpha <= 0.99
    log_omA = jnp.log1p(-alpha)
    logT = jnp.cumsum(log_omA, axis=-1) - log_omA  # exclusive
    w = alpha * jnp.exp(logT)  # (T, P, M)
    color = jnp.einsum("tpm,tmc->tpc", w, rgb)
    final_t = jnp.exp(jnp.sum(log_omA, axis=-1))
    color = color + final_t[..., None] * bg[None, None, :]
    # blended contributions: kept instances whose incoming T clears the
    # 1e-4 termination threshold (forward.cu:335-351 semantics)
    n_contrib = jnp.sum(
        (alpha > 0.0) & (jnp.exp(logT) >= 1e-4), axis=-1).astype(jnp.int32)
    return TileBlendOut(color=color, final_t=final_t, n_contrib=n_contrib)


def render_tiles_jnp(
    xy, conic, rgb, op, gauss_id, offsets,
    grid_x: int, grid_y: int, tile: int, bg,
    max_per_tile: int = 1024, tiles_per_block: int = 8,
    stride: int = 1, offx: int = 0, offy: int = 0, counts=None,
    return_n_contrib: bool = False,
):
    """Full-image tile renderer in pure XLA. Returns (color (3, H, W),
    final_t (H, W)) with H = grid_y*tile, W = grid_x*tile (crop upstream).
    stride/offx/offy select an AMR-round pixel subgrid (output spatial dims
    shrink by stride)."""
    g, valid, num_tiles = dense_tile_instances(gauss_id, offsets, max_per_tile, counts)

    pw = tile // stride
    p = jnp.arange(pw * pw, dtype=jnp.float32)
    px_local = (p % pw) * stride + offx
    py_local = (p // pw) * stride + offy
    t_ids = jnp.arange(num_tiles, dtype=jnp.float32)
    tx = (t_ids % grid_x) * tile
    ty = (t_ids // grid_x) * tile
    px = tx[:, None] + px_local[None, :]  # (T, P)
    py = ty[:, None] + py_local[None, :]

    pad_t = (-num_tiles) % tiles_per_block
    def pad0(x):
        return jnp.pad(x, [(0, pad_t)] + [(0, 0)] * (x.ndim - 1))

    blocks = (num_tiles + pad_t) // tiles_per_block

    def block_fn(args):
        gb, vb, pxb, pyb = args
        return blend_tile_block(
            pxb, pyb, xy[gb], conic[gb], rgb[gb], op[gb], vb, bg
        )

    out = jax.lax.map(
        block_fn,
        (
            pad0(g).reshape(blocks, tiles_per_block, max_per_tile),
            pad0(valid).reshape(blocks, tiles_per_block, max_per_tile),
            pad0(px).reshape(blocks, tiles_per_block, pw * pw),
            pad0(py).reshape(blocks, tiles_per_block, pw * pw),
        ),
    )
    color = out.color.reshape(-1, pw * pw, 3)[:num_tiles]
    final_t = out.final_t.reshape(-1, pw * pw)[:num_tiles]

    # (T, P, 3) -> (3, H, W)
    color = color.reshape(grid_y, grid_x, pw, pw, 3)
    color = jnp.transpose(color, (4, 0, 2, 1, 3)).reshape(3, grid_y * pw, grid_x * pw)
    final_t = final_t.reshape(grid_y, grid_x, pw, pw)
    final_t = jnp.transpose(final_t, (0, 2, 1, 3)).reshape(grid_y * pw, grid_x * pw)
    if return_n_contrib:
        nc = out.n_contrib.reshape(-1, pw * pw)[:num_tiles]
        nc = nc.reshape(grid_y, grid_x, pw, pw)
        nc = jnp.transpose(nc, (0, 2, 1, 3)).reshape(grid_y * pw, grid_x * pw)
        return color, final_t, nc
    return color, final_t
