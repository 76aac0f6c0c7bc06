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


def bin_gaussians(prep: Preprocessed, grid_x: int, grid_y: int, max_instances: int) -> Binning:
    num_tiles = grid_x * grid_y
    tiles = prep.tiles_touched.astype(jnp.int32)

    # Cumulative counts; slot k belongs to gaussian g iff cum[g-1] <= k < cum[g].
    cum = jnp.cumsum(tiles)  # (N,) inclusive
    total = cum[-1]
    overflow = total > max_instances

    k = jnp.arange(max_instances, dtype=jnp.int32)
    # method='sort' lowers to a co-sort instead of per-query binary search —
    # much friendlier to the TPU than K*log(N) gathers.
    g = jnp.searchsorted(cum, k, side="right", method="sort").astype(jnp.int32)  # (K,)
    valid = k < total
    g = jnp.where(valid, g, 0)

    excl = cum - tiles  # exclusive cumsum
    r = k - excl[g]  # rank within the gaussian's rect, row-major
    rect_w = jnp.maximum(prep.rect_max[g, 0] - prep.rect_min[g, 0], 1)
    tx = prep.rect_min[g, 0] + r % rect_w
    ty = prep.rect_min[g, 1] + r // rect_w
    tile_id = jnp.where(valid, ty * grid_x + tx, num_tiles)

    # Lexicographic (tile, depth) sort == the reference's 64-bit
    # tile<<32|depth radix sort (rasterizer_impl.cu:70-111, 300-308).
    depth = jnp.where(valid, prep.depths[g], jnp.inf)
    tile_sorted, _, gauss_sorted = jax.lax.sort(
        (tile_id, depth, g), num_keys=2, is_stable=True
    )

    # Per-tile [start, end) ranges (identifyTileRanges,
    # rasterizer_impl.cu:116-138) as CSR offsets via binary search.
    offsets = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left",
        method="sort",
    ).astype(jnp.int32)

    return Binning(
        gauss_id=gauss_sorted,
        tile_id=tile_sorted,
        offsets=offsets,
        num_instances=jnp.minimum(total, max_instances),
        overflow=overflow,
    )
