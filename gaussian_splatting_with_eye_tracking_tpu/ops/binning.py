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
    g = _cumsum_i32_blocked(mark) - 1
    valid = k < total
    g = jnp.clip(jnp.where(valid, g, 0), 0, tiles.shape[0] - 1)

    # Per-gaussian attributes consumed per slot, packed so the slot axis does
    # ONE row gather (TPU: row gathers are ~6x faster than repeated 1D ones).
    n = tiles.shape[0]
    rank_bits = max(1, (n - 1).bit_length())
    tile_bits = max(1, (num_tiles + 1).bit_length())
    # 32 bits fit via the unsigned-order trick: XOR the sign bit before an
    # int32 sort compares packed keys in unsigned order (tile<<rank | rank
    # as a uint32). Covers 1080p/16px tiles (13 bits) x 512k gaussians.
    use_packed = rank_bits + tile_bits <= 32
    if use_packed:
        # depth RANK replaces the depth sort key: exact, since ranks preserve
        # depth order and (tile, gaussian) pairs are unique.
        order = jnp.argsort(prep.depths)  # (N,) cheap: N << K
        rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    else:
        order = None
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
        # float columns ride the SAME int32 row gather via bitcast
        bits = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.float32), jnp.int32
        )
        cols += [bits(prep.means2d[:, 0]), bits(prep.means2d[:, 1]),
                 bits(prep.conics[:, 0]), bits(prep.conics[:, 1]),
                 bits(prep.conics[:, 2]), bits(prep.cull_thr)]
    attrs = jnp.stack(cols, axis=1)  # (N, 3|9)
    a = attrs[g]  # (K, 3|9) single row gather
    r = k - a[:, 0]  # rank within the gaussian's rect, row-major
    w_r = a[:, 1] & 1023
    tx = (a[:, 1] >> 20) + r % w_r
    ty = ((a[:, 1] >> 10) & 1023) + r // w_r
    kept = valid
    if prep.cull_thr is not None:
        # Per-tile ellipse culling via the SAME function the fused pallas
        # path uses (_tile_ellipse_kept below) — identical formulation so
        # the two paths can never disagree on a knife-edge tile.
        unbits = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        kept = valid & _tile_ellipse_kept(
            tx, ty, unbits(a[:, 3]), unbits(a[:, 4]), unbits(a[:, 5]),
            unbits(a[:, 6]), unbits(a[:, 7]), unbits(a[:, 8]), tile_px,
        )
    tile_id = jnp.where(kept, ty * grid_x + tx, num_tiles)

    # Lexicographic (tile, depth) ordering == the reference's 64-bit
    # tile<<32|depth radix sort (rasterizer_impl.cu:70-111, 300-308), as a
    # single-int32-KEY-ONLY sort when tile+rank bits fit in 32 (fast path):
    # the gaussian id rides inside the key's rank bits and is recovered
    # after the sort through the depth-order table — no sort payload at all.
    n_live_total = jnp.sum(kept.astype(jnp.int32))
    overflow = overflow | (n_live_total > max_live)
    if use_packed:
        sign = jnp.int32(-(1 << 31))
        key = ((tile_id << rank_bits) | jnp.where(valid, a[:, 2], 0)) ^ sign
        (key_sorted,) = jax.lax.sort((key,), num_keys=1)
        # culled + capacity-dropped slots carry the sentinel tile and sort to
        # the back: everything past max_live is provably dead — truncate
        # BEFORE decoding so the gather below runs at max_live, not capacity
        key_sorted = key_sorted[:max_live] ^ sign
        tile_sorted = jax.lax.shift_right_logical(key_sorted, rank_bits)
        rank_sorted = key_sorted & ((1 << rank_bits) - 1)
        gauss_sorted = order[rank_sorted]
    else:
        depth = jnp.where(valid, prep.depths[g], jnp.inf)
        tile_sorted, _, gauss_sorted = jax.lax.sort(
            (tile_id, depth, g), num_keys=2, is_stable=True
        )
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
    # kept mask plus one small (N,) gather. These locate each gaussian's
    # segment boundaries in the backward's sorted-by-id gradient reduction.
    kc = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), _cumsum_i32_blocked(kept.astype(jnp.int32))]
    )
    # one (N,) gather: cum_g == excl_{g+1} (contiguous segments), so the
    # start bounds double as the end bounds shifted (see the fused builder)
    live_start = kc[jnp.minimum(excl, max_instances)]
    kc_end = kc[jnp.minimum(cum[-1], max_instances)]
    live_count = jnp.concatenate([live_start[1:], kc_end[None]]) - live_start

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


# ---------------------------------------------------------------------------
# Fused instance builder (expand kernel + payload sort): the production TPU
# path. Replaces both XLA gathers of bin_gaussians + _sorted_features — XLA's
# general gather runs at ~2.8 GB/s effective on TPU (measured), two orders
# of magnitude under the sort/expand path built here.
# ---------------------------------------------------------------------------


class SortedInstances(NamedTuple):
    binning: Binning
    # (10, max_live) f32 depth-sorted instance feature rows in the blend
    # kernels' SoA order: [x, y, conic_a, conic_b, conic_c, r, g, b,
    # opacity, gauss_id] — produced directly by the binning sort's payloads,
    # no per-instance gather anywhere.
    feat_rows: jnp.ndarray


def _tile_ellipse_kept(tx, ty, cx, cy, ca, cb, cc, thr, tile_px):
    """Exact ellipse-vs-tile-rect cull, shared by BOTH binning paths (the
    legacy bin_gaussians and the fused build_sorted_instances) so they can
    never disagree on a knife-edge tile (f32 rounding of two different
    formulations used to make test_matches_bin_gaussians seed-dependent).

    True iff min over the tile's pixel rect of the Mahalanobis quadratic
    q = 0.5(ca dx^2 + cc dy^2) + cb dx dy is <= thr = ln(255 op), i.e. some
    pixel of the tile can pass the blend's alpha >= 1/255 gate
    (forward.cu:344-346). q is convex, so its minimum over the rect is
    either 0 (center inside) or attained on one of the 4 edges, each a
    clamped 1D quadratic minimization; the conic is pre-divided by thr so
    the comparison is the thr-NORMALIZED qmin' <= 1 + 1e-4 (absolute slack
    absorbs f32 rounding of the edge minimizers — a borderline pixel can
    never be culled while the blend keeps it)."""
    inv_thr = 1.0 / jnp.maximum(thr, 1e-20)
    ca = ca * inv_thr
    cb = cb * inv_thr
    cc = cc * inv_thr
    x0 = (tx * tile_px).astype(jnp.float32) - cx
    y0 = (ty * tile_px).astype(jnp.float32) - cy
    x1 = x0 + (tile_px - 1)
    y1 = y0 + (tile_px - 1)

    def q_at(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

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
    # non-PSD case where a 1D edge restriction is concave and the clamped
    # stationary point is its max rather than min
    q_corners = jnp.minimum(
        jnp.minimum(q_at(x0, y0), q_at(x1, y0)),
        jnp.minimum(q_at(x0, y1), q_at(x1, y1)),
    )
    inside = (x0 <= 0.0) & (x1 >= 0.0) & (y0 <= 0.0) & (y1 >= 0.0)
    qmin = jnp.where(inside, 0.0, jnp.minimum(q_edges, q_corners))
    return qmin <= 1.0 + 1e-4


def _cumsum_i32_blocked(col, blk=512):
    """Inclusive cumsum of a 1-D i32 count column via blocked triangular
    MXU matmul. XLA's native 1-D cumsum at K~1.6M lowers to a slow
    log-depth loop (~2 ms measured in the stage table, ~60x off roofline);
    the same reduction as (K/blk, blk)@(blk, blk) f32 matmuls runs in
    ~0.1 ms. Counts are 0/1 flags whose prefix sums stay < 2^24, so f32
    accumulation at HIGHEST precision is exact."""
    s = col.shape[0]
    # exactness precondition: every prefix sum must stay < 2^24 (f32
    # integer range). Callers sum 0/1 flags over K = max_instances slots,
    # so bounding the column LENGTH bounds every prefix. Fail loudly
    # rather than silently corrupting segment boundaries (ADVICE r3).
    assert s < (1 << 24), (
        f"_cumsum_i32_blocked: column length {s} >= 2^24 breaks f32 "
        "exactness; shard the column or use jnp.cumsum")
    pad = (-s) % blk
    x = jnp.pad(col, (0, pad)).astype(jnp.float32).reshape(-1, blk)
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    tri = (ii <= jj).astype(jnp.float32)
    inner = jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    tot = inner[:, -1]
    offs = jnp.cumsum(tot) - tot
    return (inner + offs[:, None]).reshape(-1)[:s].astype(jnp.int32)


def gaze_decimation_keep(tx, ty, gid, gaze_xy, radii, steps, tile_px):
    """Binning-time foveated instance decimation: keep an instance of
    gaussian ``gid`` in tile (tx, ty) iff gid falls in the tile's stratum
    of its gaze-ring level's decimation step. The level formula MATCHES
    ops/amr.gaze_levels (tile-center distance vs the three ring radii) so
    the blend kernel's per-tile compensation exponent (scale_only path,
    pallas_blend._blend_stream_loop) always equals the survival ratio
    applied here. Strata rotate per tile (gid % step == tile_hash % step)
    so neighboring tiles keep DIFFERENT subsets — decimation error decor-
    relates across the tile grid instead of dropping the same gaussians
    everywhere. Dropped instances never enter the megasort: at 1080p gaze
    rings (h/8, h/4, h/2) with steps (4, 2, 1, 1), ~58% of peripheral
    instances vanish from every downstream stage."""
    cx = tx.astype(jnp.float32) * tile_px + tile_px / 2.0 - gaze_xy[0]
    cy = ty.astype(jnp.float32) * tile_px + tile_px / 2.0 - gaze_xy[1]
    d2 = cx * cx + cy * cy
    lvl = 4 - ((d2 > radii[0] * radii[0]).astype(jnp.int32)
               + (d2 > radii[1] * radii[1]).astype(jnp.int32)
               + (d2 > radii[2] * radii[2]).astype(jnp.int32))
    st = jnp.ones_like(lvl)
    for level in (1, 2, 3, 4):
        if steps[level - 1] > 1:
            st = jnp.where(lvl == level, steps[level - 1], st)
    tile_hash = ty * 797 + tx  # odd multiplier decorrelates rows
    return (gid % st) == (tile_hash % st)


def build_sorted_instances(
    means2d, conics, rgb, opacities, tiles_touched, rect_min, rect_max,
    cull_thr, depths, grid_x: int, grid_y: int, max_instances: int,
    tile_px: int, max_live: int | None = None, interpret: bool = False,
    gaze_decim=None,
) -> SortedInstances:
    """Depth-sorted CSR instance list AND its feature rows, gather-free.

    The reference pipeline (rasterizer_impl.cu:277-318) scatters per-overlap
    keys then radix-sorts 64-bit keys; per-instance attributes are re-read
    per gaussian inside the kernels. The TPU shape of that:

      1. compact live gaussians' 16 attribute+feature columns with ONE
         stable N-sized sort (order-preserving; all columns exact f32
         VALUES so step 2 can split them into bf16 limbs);
      2. run-length EXPAND the compact rows to the enumeration's K slots
         with the one-hot-matmul Pallas kernel (ops/expand.py) — each slot's
         gaussian attributes with zero gathers;
      3. per-slot rect decode + exact ellipse cull + packed (tile, depth
         rank) key, then ONE K-sized sort whose PAYLOADS are the 10 feature
         rows: the sort output IS the kernels' SoA feature array.
    """
    from gaussian_splatting_with_eye_tracking_tpu.ops import expand as expand_ops

    if max_live is None:
        max_live = max_instances
    max_live = min(max_live, max_instances)
    num_tiles = grid_x * grid_y
    n = tiles_touched.shape[0]
    tiles = tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(tiles)
    total = cum[-1]
    excl = cum - tiles
    overflow = total > max_instances
    live = tiles > 0

    rank_bits = max(1, (n - 1).bit_length())
    tile_bits = max(1, (num_tiles + 1).bit_length())
    use_packed = rank_bits + tile_bits <= 32
    order = jnp.argsort(depths)
    rank = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))

    # 16 per-gaussian columns, all exact f32 VALUES (exp < 2^24): the int
    # fields ride the same bf16-limb expand as the float features. Row 0
    # doubles as the SEGMENT-START row (+inf on dead gaussians — live
    # segments tile the enumeration contiguously since dead gaussians emit
    # zero slots, so excl IS the start) that the expand kernel resolves
    # in-kernel: no slot->column map is ever materialized (the
    # scatter-mark + K-length cumsum it replaces traced at 2.6 ms/step;
    # Mosaic caps the row count at multiples of 8, so the seg row must
    # REPLACE excl rather than ride as a 17th row).
    width_r = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    cols = [
        jnp.where(live, excl.astype(jnp.float32), jnp.inf),  # excl + seg
        (rect_min[:, 0] * 1024 + width_r).astype(jnp.float32),
        rect_min[:, 1].astype(jnp.float32),
        rank.astype(jnp.float32),
        means2d[:, 0], means2d[:, 1],
        conics[:, 0], conics[:, 1], conics[:, 2],
        jnp.maximum(cull_thr, 0.0),
        rgb[:, 0], rgb[:, 1], rgb[:, 2],
        opacities,
        jnp.arange(n, dtype=jnp.float32),  # gaussian id (exact < 2^24)
        depths,
    ]

    # Order-preserving live compaction as ONE stable small sort (gathers
    # banned): key = dead-flag << idx_bits | idx keeps live gaussians in
    # original order at the front.
    ckey = (jnp.where(live, 0, 1) << rank_bits) | jnp.arange(n, dtype=jnp.int32)
    csorted = jax.lax.sort((ckey,) + tuple(cols), num_keys=1)
    table = jnp.stack(csorted[1:], axis=0)  # (16, N) compact-first columns

    k_iota = jnp.arange(max_instances, dtype=jnp.int32)
    valid = k_iota < total
    x16 = expand_ops.expand_rows_by_segments(
        table, seg_row=0, k=max_instances, interpret=interpret)  # (16, K)

    e = x16[0].astype(jnp.int32)
    rectp = x16[1].astype(jnp.int32)
    miny = x16[2].astype(jnp.int32)
    rank_k = x16[3].astype(jnp.int32)
    cx, cy = x16[4], x16[5]
    ca, cb, cc = x16[6], x16[7], x16[8]
    thr = x16[9]
    gid_k = x16[14].astype(jnp.int32)
    depth_k = x16[15]

    r = k_iota - e
    w_r = jnp.maximum(rectp & 1023, 1)
    tx = (rectp >> 10) + r % w_r
    ty = miny + r // w_r
    kept = valid & _tile_ellipse_kept(tx, ty, cx, cy, ca, cb, cc, thr, tile_px)
    if gaze_decim is not None:
        gxy, g_radii, g_steps = gaze_decim
        kept = kept & gaze_decimation_keep(
            tx, ty, gid_k, gxy, g_radii, tuple(g_steps), tile_px)
    tile_id = jnp.where(kept, ty * grid_x + tx, num_tiles)

    n_live_total = jnp.sum(kept.astype(jnp.int32))
    overflow = overflow | (n_live_total > max_live)

    feats = (x16[4], x16[5], x16[6], x16[7], x16[8],
             x16[10], x16[11], x16[12], x16[13], x16[14])
    if use_packed:
        sign = jnp.int32(-(1 << 31))
        key = ((tile_id << rank_bits) | jnp.where(valid, rank_k, 0)) ^ sign
        srt = jax.lax.sort((key,) + feats, num_keys=1)
        key_sorted = srt[0][:max_live] ^ sign
        tile_sorted = jax.lax.shift_right_logical(key_sorted, rank_bits)
    else:
        dkey = jnp.where(valid, depth_k, jnp.inf)
        srt = jax.lax.sort((tile_id, dkey) + feats, num_keys=2,
                           is_stable=True)
        tile_sorted = srt[0][:max_live]
    feat_rows = jnp.stack([s[:max_live] for s in srt[-10:]], axis=0)
    gauss_sorted = feat_rows[9].astype(jnp.int32)

    offsets = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # Per-gaussian live bounds from ONE (N,) sorted-index gather instead of
    # the (N, 2) one (trace r4: that gather fused at 4.3 ms/step): segments
    # are contiguous, so cum_g == excl_{g+1} and
    #   live_start[g] = kc[excl_g]  (kept instances before g's segment)
    #   live_count[g] = kc[excl_{g+1}] - kc[excl_g]
    # with the final boundary kc[min(total, capacity)] a scalar slice.
    kc = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), _cumsum_i32_blocked(kept.astype(jnp.int32))]
    )
    live_start = kc[jnp.minimum(excl, max_instances)]  # (N,) gather
    kc_end = kc[jnp.minimum(total, max_instances)]
    live_count = jnp.concatenate([live_start[1:], kc_end[None]]) - live_start

    b = Binning(
        gauss_id=gauss_sorted,
        tile_id=tile_sorted,
        offsets=offsets,
        num_instances=kc[-1],
        num_enumerated=total,
        overflow=overflow,
        gauss_start=live_start,
        gauss_count=live_count,
    )
    return SortedInstances(binning=b, feat_rows=feat_rows)
