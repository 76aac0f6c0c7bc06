"""Tile binning: duplicate gaussians per overlapped tile, depth-sort, ranges.

TPU-native replacement of the CUDA pipeline in rasterizer_impl.cu:198-336
(cub::InclusiveSum over tiles_touched -> duplicateWithKeys scatter ->
cub::DeviceRadixSort on 64-bit tile|depth keys -> identifyTileRanges).

Design: instead of a scatter (which XLA handles poorly and which needs
atomics/prefix-sum bookkeeping), the duplicate list is built with a pure
GATHER — slot k binary-searches the cumulative tiles_touched to find its
source gaussian, then derives which tile of the gaussian's rect it covers.
Sorting uses `jax.lax.sort` with two lexicographic keys (tile id, depth),
avoiding 64-bit key packing (TPUs have no fast u64). Per-tile ranges come
from `searchsorted` on the sorted tile ids. Everything is static-shape with a
``max_instances`` capacity; overflow is reported, never UB.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatting_with_eye_tracking_tpu.ops.projection import Preprocessed


class Binning(NamedTuple):
    """Sorted duplicate-instance list (reference BinningState + ImageState.ranges,
    rasterizer_impl.h:172-194)."""

    gauss_id: jnp.ndarray  # (K,) int32, gaussian index per instance (sorted)
    tile_id: jnp.ndarray  # (K,) int32, sentinel num_tiles for padding
    offsets: jnp.ndarray  # (num_tiles+1,) int32 CSR offsets into the K axis
    num_instances: jnp.ndarray  # () int32, live (culled) duplicate count
    num_enumerated: jnp.ndarray  # () int32, rect pairs before the ellipse cull
    overflow: jnp.ndarray  # () bool, either capacity exceeded
    gauss_start: jnp.ndarray  # (N,) int32 pre-sort start of gaussian's instances
    gauss_count: jnp.ndarray  # (N,) int32 instances emitted per gaussian


def bin_gaussians(
    prep: Preprocessed, grid_x: int, grid_y: int, max_instances: int,
    tile_px: int = 32, max_live: int | None = None,
) -> Binning:
    """``max_instances`` bounds the rect ENUMERATION (every gaussian x
    tile-in-rect pair, the reference's num_rendered before any culling);
    ``max_live`` bounds the ellipse-culled instances that survive into the
    sorted list every downstream stage (feature gather, blend kernels,
    gradient reduction) operates on. Culled slots sort past the live prefix
    (sentinel tile id), so truncating the sorted list to max_live is exact;
    sizing max_live to the workload shrinks all downstream costs."""
    if max_live is None:
        max_live = max_instances
    max_live = min(max_live, max_instances)
    num_tiles = grid_x * grid_y
    tiles = prep.tiles_touched.astype(jnp.int32)

    # Cumulative counts; slot k belongs to gaussian g iff cum[g-1] <= k < cum[g].
    cum = jnp.cumsum(tiles)  # (N,) inclusive
    total = cum[-1]
    overflow = total > max_instances

    k = jnp.arange(max_instances, dtype=jnp.int32)
    excl = cum - tiles  # exclusive cumsum
    # slot k belongs to gaussian g iff excl[g] <= k < cum[g]. Instead of a
    # searchsorted (which XLA lowers to an expensive co-sort at this size),
    # scatter a +1 at every gaussian's start slot and prefix-sum: zero-count
    # gaussians collapse onto the next start and the cumsum skips them.
    mark = jnp.zeros(max_instances, jnp.int32).at[excl].add(1, mode="drop")
    g = jnp.cumsum(mark) - 1
    valid = k < total
    g = jnp.clip(jnp.where(valid, g, 0), 0, tiles.shape[0] - 1)

    # Per-gaussian attributes consumed per slot, packed so the slot axis does
    # ONE row gather (TPU: row gathers are ~6x faster than repeated 1D ones).
    n = tiles.shape[0]
    rank_bits = max(1, (n - 1).bit_length())
    tile_bits = max(1, (num_tiles + 1).bit_length())
    use_packed = rank_bits + tile_bits <= 31
    if use_packed:
        # depth RANK replaces the depth sort key: exact, since ranks preserve
        # depth order and (tile, gaussian) pairs are unique.
        order = jnp.argsort(prep.depths)  # (N,) cheap: N << K
        rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    else:
        rank = jnp.zeros(n, jnp.int32)
    # (rect_min_x, rect_min_y, width) packed in one int32 (10 bits each
    # covers grids up to 1024 tiles = 32k px per axis) so the hot row
    # gather below stays 8 columns — gather cost scales with row bytes.
    width_r = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1)
    packed_rect = (
        (prep.rect_min[:, 0] << 20) | (prep.rect_min[:, 1] << 10) | width_r
    )
    cols = [excl, packed_rect, rank]
    if prep.cull_thr is not None:
        # float columns ride the SAME int32 row gather via bitcast; the
        # conic is pre-divided by the cull threshold so the per-slot test
        # is qmin' <= 1 (saves a threshold column)
        bits = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.float32), jnp.int32
        )
        thr_safe = jnp.maximum(prep.cull_thr, 1e-20)
        cols += [bits(prep.means2d[:, 0]), bits(prep.means2d[:, 1]),
                 bits(prep.conics[:, 0] / thr_safe),
                 bits(prep.conics[:, 1] / thr_safe),
                 bits(prep.conics[:, 2] / thr_safe)]
    attrs = jnp.stack(cols, axis=1)  # (N, 3|8)
    a = attrs[g]  # (K, 3|8) single row gather
    r = k - a[:, 0]  # rank within the gaussian's rect, row-major
    w_r = a[:, 1] & 1023
    tx = (a[:, 1] >> 20) + r % w_r
    ty = ((a[:, 1] >> 10) & 1023) + r // w_r
    kept = valid
    if prep.cull_thr is not None:
        # Per-tile ellipse culling, EXACT w.r.t. the blend output: the blend
        # gates on alpha = op*exp(-q) >= 1/255 (forward.cu:344-346) with
        # q = 0.5*(ca dx^2 + cc dy^2) + cb dx dy, so a tile whose whole
        # pixel rect has q > cull_thr = ln(255 op) contributes zero color
        # AND zero gradient. q is convex, so its minimum over the rect is
        # either 0 (center inside) or attained on one of the 4 edges, each
        # a clamped 1D quadratic minimization. The reference bins the full
        # bounding RECT of the 3-sigma box (auxiliary.h getRect) and pays
        # blend cost for tiles the alpha-ellipse never touches; vs the
        # previous circumscribed-circle test this is strictly tighter for
        # anisotropic or translucent gaussians.
        unbits = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        cx = unbits(a[:, 3])
        cy = unbits(a[:, 4])
        ca = unbits(a[:, 5])  # conic pre-divided by cull_thr
        cb = unbits(a[:, 6])
        cc = unbits(a[:, 7])
        thr = 1.0  # normalized out
        x0 = (tx * tile_px).astype(jnp.float32) - cx  # rect in center frame
        y0 = (ty * tile_px).astype(jnp.float32) - cy
        x1 = x0 + (tile_px - 1)
        y1 = y0 + (tile_px - 1)

        def q_at(dx, dy):
            return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

        # edge dx = e: dq/ddy = cc dy + cb e = 0 -> dy* = -cb e / cc
        cc_s = jnp.where(cc > 1e-12, cc, 1e-12)
        ca_s = jnp.where(ca > 1e-12, ca, 1e-12)
        dy_l = jnp.clip(-cb * x0 / cc_s, y0, y1)
        dy_r = jnp.clip(-cb * x1 / cc_s, y0, y1)
        dx_b = jnp.clip(-cb * y0 / ca_s, x0, x1)
        dx_t = jnp.clip(-cb * y1 / ca_s, x0, x1)
        q_edges = jnp.minimum(
            jnp.minimum(q_at(x0, dy_l), q_at(x1, dy_r)),
            jnp.minimum(q_at(dx_b, y0), q_at(dx_t, y1)),
        )
        # corners guard the (numerically impossible, but cheap to cover)
        # non-PSD case where a 1D edge restriction is concave and the
        # clamped stationary point is its max rather than min
        q_corners = jnp.minimum(
            jnp.minimum(q_at(x0, y0), q_at(x1, y0)),
            jnp.minimum(q_at(x0, y1), q_at(x1, y1)),
        )
        inside = (x0 <= 0.0) & (x1 >= 0.0) & (y0 <= 0.0) & (y1 >= 0.0)
        qmin = jnp.where(inside, 0.0, jnp.minimum(q_edges, q_corners))
        # 1e-4 slack absorbs f32 rounding of the edge minimizers so a
        # borderline pixel can never be culled while the blend keeps it
        kept = valid & (qmin <= thr + 1e-4)
    tile_id = jnp.where(kept, ty * grid_x + tx, num_tiles)

    # Lexicographic (tile, depth) ordering == the reference's 64-bit
    # tile<<32|depth radix sort (rasterizer_impl.cu:70-111, 300-308), as a
    # single-int32-key sort when tile+rank bits fit (fast path).
    if use_packed:
        key = (tile_id << rank_bits) | jnp.where(valid, a[:, 2], 0)
        key_sorted, gauss_sorted = jax.lax.sort((key, g), num_keys=1)
        tile_sorted = key_sorted >> rank_bits
    else:
        depth = jnp.where(valid, prep.depths[g], jnp.inf)
        tile_sorted, _, gauss_sorted = jax.lax.sort(
            (tile_id, depth, g), num_keys=2, is_stable=True
        )
    # culled + capacity-dropped slots carry the sentinel tile and sorted to
    # the back: everything past max_live is provably dead, truncate it away
    n_live_total = jnp.sum(kept.astype(jnp.int32))
    overflow = overflow | (n_live_total > max_live)
    tile_sorted = tile_sorted[:max_live]
    gauss_sorted = gauss_sorted[:max_live]

    # Per-tile [start, end) ranges (identifyTileRanges,
    # rasterizer_impl.cu:116-138) as CSR offsets: O(T log K) binary search
    # (the instance list is sorted by tile).
    offsets = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # Per-gaussian LIVE instance counts (distance-culled and capacity-dropped
    # slots excluded): gaussian g's slots are the contiguous pre-sort range
    # [excl_g, cum_g) ∩ [0, capacity), so counts come from a cumsum of the
    # kept mask plus one small (N, 2) gather. These locate each gaussian's
    # segment boundaries in the backward's sorted-by-id gradient reduction.
    kc = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(kept.astype(jnp.int32))]
    )
    idx = jnp.stack(
        [jnp.minimum(excl, max_instances), jnp.minimum(cum, max_instances)],
        axis=1,
    )
    bounds = kc[idx]  # (N, 2)
    live_count = bounds[:, 1] - bounds[:, 0]
    live_start = jnp.cumsum(live_count) - live_count

    return Binning(
        gauss_id=gauss_sorted,
        tile_id=tile_sorted,
        offsets=offsets,
        num_instances=kc[-1],
        num_enumerated=total,
        overflow=overflow,
        gauss_start=live_start,
        gauss_count=live_count,
    )
