"""Pallas TPU kernels for per-tile alpha compositing, forward + backward.

TPU-native re-design of the CUDA render kernels
(cuda_rasterizer/forward.cu:261-374 and backward.cu:399-557):

- CUDA: 1 threadblock per 16x16 tile, 1 thread per pixel, sequential walk of
  the tile's depth-sorted gaussian list with shared-memory staging and
  atomicAdd in backward.
- TPU: grid = tile list, one program per 32x32 tile. Layout (validated on
  hardware): PIXELS on sublanes (P=1024 rows), INSTANCES on lanes (CHUNK=128
  columns). The tile's instance list is processed in chunks; each chunk
  computes a (P, C) alpha matrix on the VPU, turns the sequential
  front-to-back transmittance recurrence into a log-space exclusive cumsum
  along lanes (log-doubling scan), and accumulates color with native lane
  reductions. Instance chunks stream from HBM with double-buffered async DMA
  in a struct-of-arrays (FEAT, S) layout so every DMA slice is 128-lane
  aligned. Chunk-level early exit replaces the CUDA per-pixel T<1e-4 break:
  once every pixel of the tile is saturated the remaining chunks are skipped
  (color error bound: 1e-4 per channel).
- Backward (no atomics on TPU): chunks are replayed BACK-TO-FRONT per tile;
  transmittance is reconstructed by division from the saved final_T exactly
  like the CUDA backward (backward.cu:503), the suffix color accumulator
  `accum_rec` (backward.cu:515-519) becomes a suffix cumsum along lanes, and
  per-instance gradients (sublane reductions over pixels) are DMA'd to the
  instance's unique slot in a (FEAT, S) gradient array. The atomicAdd over
  duplicate instances (backward.cu:523-554) becomes jax.ops.segment_sum
  outside the kernel.

Feature rows in the SoA array: [x, y, conic_a, conic_b, conic_c, r, g, b,
opacity, <7 pad>] (FEAT=16 rows).

Instances live in a CHUNK-ALIGNED per-tile CSR layout (each tile's slice
starts at a multiple of CHUNK and is padded to one) so every DMA — including
gradient write-back — stays inside its own tile's slice regardless of grid
execution order, and lane alignment holds. On hardware, CHUNK must be a
multiple of 128 (DMA lane alignment); smaller chunks are allowed only in
interpret mode (CPU tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_MIN = 1e-4
LOG_T_MIN = math.log(1e-4)

FEAT = 16  # SoA rows (9 used, padded to a sublane-friendly 16)
OUTC = 8  # output columns per pixel: r, g, b, final_T, chunks_done, pad


def _shift_lanes_right(x, k):
    """Shift columns right by k (first k columns become zero). Static k."""
    return jnp.concatenate([jnp.zeros((x.shape[0], k), x.dtype), x[:, :-k]], axis=1)


def _shift_lanes_left(x, k):
    return jnp.concatenate([x[:, k:], jnp.zeros((x.shape[0], k), x.dtype)], axis=1)


def _shift_lanes_right_ones(x, k):
    """Shift columns right by k, filling with ones (multiplicative scans)."""
    return jnp.concatenate([jnp.ones((x.shape[0], k), x.dtype), x[:, :-k]], axis=1)


def _shift_lanes_left_ones(x, k):
    return jnp.concatenate([x[:, k:], jnp.ones((x.shape[0], k), x.dtype)], axis=1)


def _cumprod_lanes_incl(x, chunk):
    """Inclusive cumprod along axis 1 via log-doubling (multiplicative)."""
    s = x
    k = 1
    while k < chunk:
        s = s * _shift_lanes_right_ones(s, k)
        k *= 2
    return s


def _suffix_prod_lanes_incl(x, chunk):
    s = x
    k = 1
    while k < chunk:
        s = s * _shift_lanes_left_ones(s, k)
        k *= 2
    return s


def _cumsum_lanes_incl(x, chunk):
    """Inclusive cumsum along axis 1 (instance axis) via log-doubling."""
    s = x
    k = 1
    while k < chunk:
        s = s + _shift_lanes_right(s, k)
        k *= 2
    return s


def _suffix_sum_lanes_incl(x, chunk):
    s = x
    k = 1
    while k < chunk:
        s = s + _shift_lanes_left(s, k)
        k *= 2
    return s


def _alpha_terms(f, px, py, lane_ids, n):
    """Shared recompute: SoA chunk (FEAT, C) -> alpha (P, C) and friends.
    Same math as the CUDA forward inner loop (forward.cu:330-343)."""
    ca = f[2:3, :]
    cb = f[3:4, :]
    cc = f[4:5, :]
    op = f[8:9, :]
    dx = f[0:1, :] - px  # (P, C)
    dy = f[1:2, :] - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * g
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    valid = lane_ids < n  # (1, C)
    keep = valid & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, alpha_raw, g, power, dx, dy, keep


def _pixel_coords(t, grid_x, pixels, tile, stride=1, offx=0, offy=0):
    """Pixel centers of this tile's (sub)grid. stride/offx/offy implement the
    AMR round pixel pattern (amr/forward.cu:294-305: pix = pix_0*R + offset);
    stride=1 is the full-resolution tile. Tile origin is derived from the
    program id (keeps the SMEM scalar-prefetch footprint small: at 1080p
    there are 2040 tiles and SMEM holds only ~16KB of prefetch)."""
    ox = (t % grid_x) * tile
    oy = (t // grid_x) * tile
    pw = tile // stride
    pix = jax.lax.broadcasted_iota(jnp.int32, (pixels, 1), 0)
    px = (ox + (pix % pw) * stride + offx).astype(jnp.float32)
    py = (oy + (pix // pw) * stride + offy).astype(jnp.float32)
    return px, py


def _fwd_kernel(
    aoff_ref,  # scalar prefetch: (num_tiles+1,) int32, chunk-aligned offsets
    counts_ref,  # scalar prefetch: (num_tiles,) int32, true instance counts
    feat_hbm,  # (FEAT, S) f32, ANY/HBM, chunk-aligned SoA layout
    out_ref,  # (1, P, OUTC) f32 VMEM: cols 0-2 rgb, 3 final_T, 4 chunks done
    fbuf,  # scratch VMEM (2, FEAT, CHUNK)
    sem,  # DMA sems (2,)
    *, chunk: int, pixels: int, tile: int, grid_x: int, stride: int = 1,
    offx: int = 0, offy: int = 0,
):
    t = pl.program_id(0)
    start = aoff_ref[t]
    n = counts_ref[t]
    n_chunks = pl.cdiv(n, chunk)
    px, py = _pixel_coords(t, grid_x, pixels, tile, stride, offx, offy)

    def dma(slot, ci):
        off = pl.multiple_of(start + ci * chunk, chunk)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, chunk)],
            fbuf.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(carry):
        ci, T, cr, cg, cb_, done = carry

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma((ci + 1) % 2, ci + 1).start()

        dma(ci % 2, ci).wait()
        f = fbuf[ci % 2]
        ids = ci * chunk + lane_ids
        alpha, _, _, _, _, _, _ = _alpha_terms(f, px, py, ids, n)

        om = 1.0 - alpha  # (P, C)
        cp = _cumprod_lanes_incl(om, chunk)  # inclusive products
        excl = jnp.concatenate([jnp.ones((pixels, 1), jnp.float32), cp[:, :-1]], axis=1)
        w = alpha * (T * excl)  # (P, C); multiplicative scan, no exp/log
        cr = cr + jnp.sum(w * f[5:6, :], axis=1, keepdims=True)
        cg = cg + jnp.sum(w * f[6:7, :], axis=1, keepdims=True)
        cb_ = cb_ + jnp.sum(w * f[7:8, :], axis=1, keepdims=True)
        T = T * cp[:, chunk - 1:chunk]
        done = jnp.max(T) < T_MIN
        return ci + 1, T, cr, cg, cb_, done

    def cond(carry):
        ci, _, _, _, _, done = carry
        return (ci < n_chunks) & jnp.logical_not(done)

    zero = jnp.zeros((pixels, 1), jnp.float32)
    one = jnp.ones((pixels, 1), jnp.float32)
    ci, T, cr, cg, cb_, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), one, zero, zero, zero, jnp.bool_(False))
    )

    # early exit leaves the prefetched next chunk's DMA in flight: drain it
    @pl.when(ci < n_chunks)
    def _():
        dma(ci % 2, ci).wait()

    out_ref[0, :, 0:1] = cr
    out_ref[0, :, 1:2] = cg
    out_ref[0, :, 2:3] = cb_
    out_ref[0, :, 3:4] = T
    out_ref[0, :, 4:5] = jnp.broadcast_to(ci.astype(jnp.float32), (pixels, 1))
    out_ref[0, :, 5:OUTC] = jnp.zeros((pixels, OUTC - 5), jnp.float32)


def _bwd_kernel(
    aoff_ref,
    counts_ref,
    feat_hbm,  # (FEAT, S), chunk-aligned SoA layout
    gimg_ref,  # (1, P, OUTC): cols 0-2 dL/dcolor, 3 dL/dfinalT
    fwdout_ref,  # (1, P, OUTC): forward output (col 3 final_T, col 4 chunks)
    dfeat_hbm,  # out: (FEAT, S) per-instance grads, ANY/HBM
    fbuf,  # scratch (2, FEAT, CHUNK)
    dbuf,  # scratch (FEAT, CHUNK) staging for grads
    sem,  # DMA sems (2,)
    outsem,  # DMA sem for grad write-back
    *, chunk: int, pixels: int, tile: int, grid_x: int,
):
    t = pl.program_id(0)
    start = aoff_ref[t]
    n = counts_ref[t]
    px, py = _pixel_coords(t, grid_x, pixels, tile)

    gr = gimg_ref[0, :, 0:1]  # (P, 1)
    gg = gimg_ref[0, :, 1:2]
    gb = gimg_ref[0, :, 2:3]
    gT_ext = gimg_ref[0, :, 3:4]
    final_t = fwdout_ref[0, :, 3:4]
    n_chunks_done = fwdout_ref[0, 0, 4].astype(jnp.int32)

    def dma_in(slot, ci):
        off = pl.multiple_of(start + ci * chunk, chunk)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, chunk)],
            fbuf.at[slot],
            sem.at[slot],
        )

    def grad_dma(slot, ci):
        off = pl.multiple_of(start + ci * chunk, chunk)
        return pltpu.make_async_copy(
            dbuf.at[slot], dfeat_hbm.at[:, pl.ds(off, chunk)], outsem.at[slot]
        )

    @pl.when(n_chunks_done > 0)
    def _():
        dma_in((n_chunks_done - 1) % 2, n_chunks_done - 1).start()

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(i, carry):
        T_after, S = carry
        ci = n_chunks_done - 1 - i  # back-to-front (backward.cu:441-556)
        slot = i % 2

        @pl.when(ci > 0)
        def _():
            dma_in((ci - 1) % 2, ci - 1).start()

        # the staging buffer is written below; wait out the grad DMA that was
        # issued from this slot two iterations ago before overwriting it
        @pl.when(i >= 2)
        def _():
            grad_dma(slot, ci + 2).wait()

        dma_in(ci % 2, ci).wait()
        f = fbuf[ci % 2]
        ids = ci * chunk + lane_ids
        alpha, alpha_raw, g, power, dx, dy, keep = _alpha_terms(f, px, py, ids, n)

        om = 1.0 - alpha
        suf = _suffix_prod_lanes_incl(om, chunk)  # prod_{j>=i} (1-a_j)
        # division reconstruction (backward.cu:503); T <= 1 physically, so a
        # clamp kills the 0/0 of fully-saturated pixels
        T_i = jnp.clip(T_after / jnp.maximum(suf, 1e-30), 0.0, 1.0)
        w = alpha * T_i  # (P, C)

        G_rgb = gr * f[5:6, :] + gg * f[6:7, :] + gb * f[7:8, :]  # (P, C)
        u = G_rgb * w
        S_i = S + _suffix_sum_lanes_incl(u, chunk) - u  # suffix-exclusive

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = T_i * G_rgb - S_i / one_m
        d_alpha = jnp.where(keep, d_alpha, 0.0)
        # clamp gate at 0.99 (matches jnp.minimum vjp of the jnp path)
        d_araw = jnp.where(alpha_raw < ALPHA_MAX, d_alpha, 0.0)

        d_op_px = d_araw * g
        d_power_px = d_araw * alpha_raw * jnp.where(power <= 0.0, 1.0, 0.0)

        def rsum(x):  # (P, C) -> (1, C) reduce over pixels
            return jnp.sum(x, axis=0, keepdims=True)

        dbuf[slot, 0:1, :] = rsum(d_power_px * (-(f[2:3, :] * dx + f[3:4, :] * dy)))
        dbuf[slot, 1:2, :] = rsum(d_power_px * (-(f[4:5, :] * dy + f[3:4, :] * dx)))
        dbuf[slot, 2:3, :] = rsum(d_power_px * (-0.5 * dx * dx))
        dbuf[slot, 3:4, :] = rsum(d_power_px * (-dx * dy))
        dbuf[slot, 4:5, :] = rsum(d_power_px * (-0.5 * dy * dy))
        dbuf[slot, 5:6, :] = rsum(gr * w)
        dbuf[slot, 6:7, :] = rsum(gg * w)
        dbuf[slot, 7:8, :] = rsum(gb * w)
        dbuf[slot, 8:9, :] = rsum(d_op_px)
        dbuf[slot, 9:FEAT, :] = jnp.zeros((FEAT - 9, chunk), jnp.float32)
        grad_dma(slot, ci).start()

        T_before_chunk = jnp.clip(
            T_after / jnp.maximum(suf[:, 0:1], 1e-30), 0.0, 1.0
        )
        S_new = S + jnp.sum(u, axis=1, keepdims=True)
        return T_before_chunk, S_new

    S0 = gT_ext * final_t  # dL/dT_final cotangent seeds the suffix accumulator
    jax.lax.fori_loop(0, n_chunks_done, body, (final_t, S0))
    # Chunks skipped by forward early-exit contributed nothing; their slots
    # are left UNWRITTEN here (garbage) and masked out by the caller via the
    # per-tile chunks_done count (avoids a serialized zero-fill DMA chain).

    # drain the last (up to two) in-flight grad write-backs
    @pl.when(n_chunks_done >= 1)
    def _():
        grad_dma((n_chunks_done - 1) % 2, 0).wait()

    @pl.when(n_chunks_done >= 2)
    def _():
        grad_dma((n_chunks_done - 2) % 2, 1).wait()


# ---------------------------------------------------------------------------
# Chunk-aligned CSR layout
# ---------------------------------------------------------------------------


def align_csr(offsets, chunk: int, total_slots: int, counts=None):
    """Chunk-aligned per-tile layout bookkeeping.

    Returns (dst_shift (K?,) unused externally, aligned_offsets (T+1,),
    counts (T,)). See aligned_instance_map for the slot mapping."""
    if counts is None:
        counts = offsets[1:] - offsets[:-1]
    aligned = ((counts + chunk - 1) // chunk) * chunk
    aoff = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned).astype(jnp.int32)]
    )
    return aoff, counts


def _tile_step_fn(values, offsets, k_ax):
    """Per-slot step function: out[k] = values[t] for k in tile t's CSR range,
    via boundary scatter + prefix sum (no per-slot search)."""
    delta = jnp.zeros(k_ax, values.dtype)
    delta = delta.at[offsets[0:1]].add(values[0:1], mode="drop")
    delta = delta.at[offsets[1:-1]].add(values[1:] - values[:-1], mode="drop")
    return jnp.cumsum(delta)


def aligned_instance_map(gauss_id, offsets, aoff, counts, n_gauss, total_slots, chunk):
    """Map the sorted CSR instance list into the chunk-aligned slot axis.

    dst[k] = k + (aoff[t] - offsets[t]) for k in tile t, keeping only the
    tile's first ``counts[t]`` instances (counts may be gated below the CSR
    length by AMR level masking). Returns gid_al (S,) int32 with sentinel
    ``n_gauss`` on padding slots.
    """
    k_ax = gauss_id.shape[0]
    kk = jnp.arange(k_ax, dtype=jnp.int32)
    shift = _tile_step_fn(aoff[:-1] - offsets[:-1], offsets, k_ax)
    allowed_end = _tile_step_fn(offsets[:-1] + counts, offsets, k_ax)
    keep = (kk < offsets[-1]) & (kk < allowed_end)
    dst = jnp.where(keep, kk + shift, total_slots)
    gid_al = jnp.full(total_slots, n_gauss, jnp.int32)
    gid_al = gid_al.at[dst].set(gauss_id, mode="drop")
    return gid_al


def pack_features_aos(xy, conic, rgb, op):
    """(N+1, FEAT) float32 feature rows; the sentinel last row is zero so
    padding slots gather zeros (invalid anyway by the kernel count mask)."""
    n = xy.shape[0]
    f = jnp.zeros((n + 1, FEAT), jnp.float32)
    f = f.at[:n, 0:2].set(xy)
    f = f.at[:n, 2:5].set(conic)
    f = f.at[:n, 5:8].set(rgb)
    f = f.at[:n, 8].set(op)
    return f


def _tile_origins(grid_x: int, grid_y: int, tile: int):
    t = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    return jnp.stack([(t % grid_x) * tile, (t // grid_x) * tile], axis=-1)


def _fwd_call(feat_soa, aoff, counts, grid_x, grid_y, tile, chunk, interpret,
              stride=1, offx=0, offy=0):
    num_tiles = grid_x * grid_y
    pixels = (tile // stride) * (tile // stride)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, pixels, OUTC), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, pixels=pixels, tile=tile,
                          grid_x=grid_x, stride=stride, offx=offx, offy=offy),
        out_shape=jax.ShapeDtypeStruct((num_tiles, pixels, OUTC), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(aoff, counts, feat_soa)


def _bwd_call(feat_soa, aoff, counts, gimg_tiles, fwd_out, grid_x, grid_y, tile, chunk, interpret):
    num_tiles = grid_x * grid_y
    pixels = tile * tile
    s = feat_soa.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, pixels, OUTC), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pixels, OUTC), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, chunk), jnp.float32),
            pltpu.VMEM((2, FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, pixels=pixels, tile=tile,
                          grid_x=grid_x),
        out_shape=jax.ShapeDtypeStruct((FEAT, s), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(aoff, counts, feat_soa, gimg_tiles, fwd_out)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def blend_pallas(
    xy, conic, rgb, op, gauss_id, offsets,
    grid_x: int, grid_y: int, tile: int, chunk: int, interpret: bool,
):
    """Differentiable tile compositing. Returns tiles (num_tiles, P, OUTC):
    cols 0-2 color (no background), col 3 final transmittance."""
    out, _ = _blend_fwd(
        xy, conic, rgb, op, gauss_id, offsets, grid_x, grid_y, tile, chunk, interpret
    )
    return out


def _aligned_features(xy, conic, rgb, op, gauss_id, offsets, grid_x, grid_y, chunk,
                      counts_override=None):
    k = gauss_id.shape[0]
    n = xy.shape[0]
    num_tiles = grid_x * grid_y
    total_slots = k + num_tiles * chunk  # static bound on the aligned length
    aoff, counts = align_csr(offsets, chunk, total_slots, counts_override)
    gid_al = aligned_instance_map(
        gauss_id, offsets, aoff, counts, n, total_slots, chunk
    )
    feat_al = pack_features_aos(xy, conic, rgb, op)[gid_al]  # (S, FEAT) row gather
    feat_soa = feat_al.T  # (FEAT, S)
    return feat_soa, gid_al, aoff, counts


def _blend_fwd(xy, conic, rgb, op, gauss_id, offsets, grid_x, grid_y, tile, chunk, interpret):
    feat_soa, gid_al, aoff, counts = _aligned_features(
        xy, conic, rgb, op, gauss_id, offsets, grid_x, grid_y, chunk
    )
    out = _fwd_call(feat_soa, aoff, counts, grid_x, grid_y, tile, chunk, interpret)
    return out, (feat_soa, gid_al, aoff, counts, out, xy.shape[0])


def _blend_bwd(grid_x, grid_y, tile, chunk, interpret, res, g_out):
    feat_soa, gid_al, aoff, counts, fwd_out, n = res
    dfeat_soa = _bwd_call(
        feat_soa, aoff, counts, g_out, fwd_out, grid_x, grid_y, tile, chunk, interpret
    )
    # Slots in chunks the forward early-exited (and the backward therefore
    # never wrote) hold garbage: mask them by the per-tile chunks-done count
    # saved in forward-output column 4.
    s_ax = feat_soa.shape[1]
    chunks_done = fwd_out[:, 0, 4].astype(jnp.int32)  # (T,)
    kk = jnp.arange(s_ax, dtype=jnp.int32)
    valid_end = _tile_step_fn(aoff[:-1] + chunks_done * chunk, aoff, s_ax)
    valid = kk < valid_end
    # Per-gaussian reduction (the CUDA atomicAdd, backward.cu:523-554) as 9
    # independent 1D scatter-adds on the SoA rows — ~9x faster on TPU than a
    # row-wise segment_sum. Sentinel id n collects padding; dropped by [:n].
    def seg(row):
        return (
            jnp.zeros(n + 1, jnp.float32)
            .at[gid_al]
            .add(jnp.where(valid, row, 0.0))[:n]
        )

    return (
        jnp.stack([seg(dfeat_soa[0]), seg(dfeat_soa[1])], axis=1),  # d xy
        jnp.stack([seg(dfeat_soa[2]), seg(dfeat_soa[3]), seg(dfeat_soa[4])], axis=1),
        jnp.stack([seg(dfeat_soa[5]), seg(dfeat_soa[6]), seg(dfeat_soa[7])], axis=1),
        seg(dfeat_soa[8]),  # d opacity
        None,  # gauss_id
        None,  # offsets
    )


blend_pallas.defvjp(_blend_fwd, _blend_bwd)


def render_tiles_pallas(
    xy, conic, rgb, op, gauss_id, offsets, grid_x, grid_y, tile, bg,
    chunk: int = 128, interpret: bool | None = None,
):
    """Full-image Pallas renderer; same contract as
    tile_blend.render_tiles_jnp. Background compositing and image assembly
    happen in XLA (autodiff covers their gradients, including d/d bg)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiles = blend_pallas(
        xy, conic, rgb, op, gauss_id, offsets, grid_x, grid_y, tile, chunk, interpret
    )
    color = tiles[:, :, 0:3]  # (T, P, 3)
    final_t = tiles[:, :, 3]  # (T, P)
    color = color + final_t[:, :, None] * bg[None, None, :]
    color = color.reshape(grid_y, grid_x, tile, tile, 3)
    color = jnp.transpose(color, (4, 0, 2, 1, 3)).reshape(3, grid_y * tile, grid_x * tile)
    final_t = final_t.reshape(grid_y, grid_x, tile, tile)
    final_t = jnp.transpose(final_t, (0, 2, 1, 3)).reshape(grid_y * tile, grid_x * tile)
    return color, final_t


def blend_round_pallas(
    xy, conic, rgb, op, gauss_id, offsets, grid_x, grid_y, tile,
    *, stride=1, offx=0, offy=0, chunk: int = 128, interpret: bool | None = None,
    counts_override=None,
):
    """Forward-only strided-subgrid compositing for AMR rounds
    (amr/forward.cu renderCUDA pixel pattern). Returns tiles
    (num_tiles, (tile/stride)^2, OUTC); no custom_vjp (the reference AMR
    path is forward-only: its autograd backward is broken and unused,
    SURVEY.md section 2.2)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    feat_soa, gid_al, aoff, counts = _aligned_features(
        xy, conic, rgb, op, gauss_id, offsets, grid_x, grid_y, chunk,
        counts_override=counts_override,
    )
    return _fwd_call(
        feat_soa, aoff, counts, grid_x, grid_y, tile, chunk, interpret,
        stride=stride, offx=offx, offy=offy,
    )
