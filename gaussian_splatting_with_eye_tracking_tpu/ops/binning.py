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
    num_instances: jnp.ndarray  # () int32, true duplicate count
    overflow: jnp.ndarray  # () bool, true count exceeded capacity
    gauss_start: jnp.ndarray  # (N,) int32 pre-sort start of gaussian's instances
    gauss_count: jnp.ndarray  # (N,) int32 instances emitted per gaussian


def bin_gaussians(
    prep: Preprocessed, grid_x: int, grid_y: int, max_instances: int,
    tile_px: int = 32,
) -> Binning:
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
    cols = [
        excl,
        prep.rect_min[:, 0],
        prep.rect_min[:, 1],
        jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1),
        rank,
    ]
    if prep.r_bin is not None:
        # float columns ride the SAME int32 row gather via bitcast
        bits = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.float32), jnp.int32
        )
        cols += [bits(prep.means2d[:, 0]), bits(prep.means2d[:, 1]),
                 bits(prep.r_bin * prep.r_bin)]
    attrs = jnp.stack(cols, axis=1)  # (N, 5|8)
    a = attrs[g]  # (K, 5|8) single row gather
    r = k - a[:, 0]  # rank within the gaussian's rect, row-major
    tx = a[:, 1] + r % a[:, 3]
    ty = a[:, 2] + r // a[:, 3]
    kept = valid
    if prep.r_bin is not None:
        # Tile-distance culling, EXACT w.r.t. the blend output: alpha <
        # 1/255 everywhere in a tile whose pixel rect lies farther than
        # r_bin from the center (see projection.py r_alpha derivation), and
        # such instances are skipped by the blend's alpha gate anyway. The
        # reference bins the full bounding RECT of the 3-sigma circle
        # (auxiliary.h getRect) and pays blend cost for corner tiles the
        # circle never touches; a circle-vs-rect test drops ~20-50% of
        # instances (pi/4 of big rects, much more for low-opacity or
        # anisotropic gaussians).
        unbits = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        cx = unbits(a[:, 5])
        cy = unbits(a[:, 6])
        r2 = unbits(a[:, 7])
        x0 = (tx * tile_px).astype(jnp.float32)
        y0 = (ty * tile_px).astype(jnp.float32)
        ddx = jnp.maximum(jnp.maximum(x0 - cx, cx - (x0 + tile_px - 1)), 0.0)
        ddy = jnp.maximum(jnp.maximum(y0 - cy, cy - (y0 + tile_px - 1)), 0.0)
        kept = valid & (ddx * ddx + ddy * ddy <= r2)
    tile_id = jnp.where(kept, ty * grid_x + tx, num_tiles)

    # Lexicographic (tile, depth) ordering == the reference's 64-bit
    # tile<<32|depth radix sort (rasterizer_impl.cu:70-111, 300-308), as a
    # single-int32-key sort when tile+rank bits fit (fast path).
    if use_packed:
        key = (tile_id << rank_bits) | jnp.where(valid, a[:, 4], 0)
        key_sorted, gauss_sorted = jax.lax.sort((key, g), num_keys=1)
        tile_sorted = key_sorted >> rank_bits
    else:
        depth = jnp.where(valid, prep.depths[g], jnp.inf)
        tile_sorted, _, gauss_sorted = jax.lax.sort(
            (tile_id, depth, g), num_keys=2, is_stable=True
        )

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
        overflow=overflow,
        gauss_start=live_start,
        gauss_count=live_count,
    )
