"""Pallas TPU kernels for per-tile alpha compositing, forward + backward.

TPU-native re-design of the CUDA render kernels
(cuda_rasterizer/forward.cu:261-374 and backward.cu:399-557):

- CUDA: 1 threadblock per 16x16 tile, 1 thread per pixel, sequential walk of
  the tile's depth-sorted gaussian list with shared-memory staging and
  atomicAdd in backward.
- TPU: grid = tile list, one program per 32x32 tile. Layout (validated on
  hardware): PIXELS on sublanes (P=1024 rows), INSTANCES on lanes (CHUNK=128
  columns; 256 measured WORSE on both kernels — coarser early-exit wastes
  instances in saturated tiles, and the backward's doubled VMEM buffers
  blow the 16MB scoped limit). The tile's instance list is processed in
  chunks; each chunk computes a (P, C) alpha matrix on the VPU and carries
  transmittance in LOG space: the sequential front-to-back recurrence
  becomes exclusive prefix sums of log(1-alpha) computed on the MXU in
  <=128-wide blocks with a running carry (_prefix_scan; a 0/1 triangular
  matrix per block — measured faster than a 7-step log-doubling shift
  chain on the VPU, since exp/log ride the near-free special-function
  pipeline while lane shifts are full-rate VPU passes).
  Color accumulates with (P,C)@(C,3) lane contractions. Instance chunks
  stream from HBM with double-buffered async DMA in a struct-of-arrays
  (FEAT, K) layout. Chunk-level early exit replaces the CUDA per-pixel
  T<1e-4 break: once every pixel of the tile is saturated the remaining
  chunks are skipped (color error bound: 1e-4 per channel).

- Instance layout: the kernels read the depth-sorted CSR instance list
  DIRECTLY (no chunk-aligned relayout). Each tile's range [o, o+n) is read
  as an ALIGNED SUPERSET of chunks starting at floor(o/CHUNK)*CHUNK; lanes
  outside [o, o+n) are masked. Overlapping boundary chunks are safe for
  reads; gradient WRITES go to a private chunk-aligned per-tile region
  (see grad_region_offsets) so no two programs ever DMA the same slots.

- Backward (no atomics on TPU): chunks are replayed BACK-TO-FRONT per tile;
  transmittance is reconstructed by division from the saved final_T exactly
  like the CUDA backward (backward.cu:503), the suffix color accumulator
  `accum_rec` (backward.cu:515-519) becomes a suffix scan along lanes, and
  per-instance gradients (reductions over pixels) are DMA'd to the tile's
  region of a (FEAT, S) gradient array. The atomicAdd over duplicate
  instances (backward.cu:523-554) becomes, OUTSIDE the kernel, a single
  key+payload sort: the kernel tags every gradient column with its
  GAUSSIAN ID (grad row 9, +inf for dead lanes), so one
  `lax.sort(id, 9 grad rows)` groups each gaussian's instance gradients
  contiguously, and a cumsum + boundary difference finishes the segment
  reduction (see _blend_bwd for measured alternatives).

Feature rows in the SoA array: [x, y, conic_a, conic_b, conic_c, r, g, b,
opacity, gauss_id, <6 pad>] (FEAT=16 rows). On hardware, CHUNK must be a
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

# Static kernel-tuning knobs, read at TRACE time (rebuild jits after
# changing; profile_tune.py measures the combos on hardware). Values pick
# the MXU precision strategy per matmul: "highest" = f32 6-pass,
# "dot3" = 3-limb split-bf16 (~2^-22), "bf16" = single bf16 pass (~2^-8).
# Defaults = the measured r4 production configuration.
TUNE = {
    "color": "dot3",  # fwd rgb accumulation (P,C)@(C,3)
    "grgb": "dot3",  # bwd G_rgb (P,3)@(3,C)
    "mom": "highest",  # bwd pixel-moment reduction (6,P)@(P,C)
    "wmom": "dot3",  # bwd cotangent-weight sums (3,P)@(P,C)
    "nbuf": 2,  # fwd DMA pipeline depth
    # fwd color-matmul deferral (bwd-geom-style softpipe): measured WORSE
    # in the fwd (15.2 -> 16.7 ms) — the (P,C) weight stash round-trip
    # costs more than the smaller color bubble it recovers; the bwd keeps
    # its deferral (33.1 -> 26.0 ms) where the moment-matmul bubble is 8.8
    "defer_color": False,
    # per-gaussian gradient reduction after the id-sort: "segsum" = one-pass
    # MXU range-test segment sums (ops/segsum.py, reads the sorted grads
    # once); "cumsum" = blocked-matmul prefix sums + boundary-row gather
    # (the r3/r4 path). profile_reduce_r05.py measures both on hardware.
    "segreduce": "cumsum",
    # alpha-evaluation precision (the dominant VPU pass block in BOTH
    # kernels): "f32" = the reference-matching direct quadratic;
    # "bf16" = Cholesky-form -(u^2+v^2)/2 with the (P,C) chain in bf16
    # after an f32 dx/dy subtraction; "bf16x" = fully-bf16 chain including
    # the tile-local subtraction (cheapest, loosest). The Cholesky form has
    # no cancellation — its error scales with |power|, i.e. it is most
    # accurate exactly where blend weights are large. Parity tests pin
    # "f32"; bf16 modes are quality-gated by PSNR-vs-f32 tests instead.
    "alpha": "f32",
}


def _dot_tuned(mode, a, b, dn):
    if mode == "highest":
        return jax.lax.dot_general(
            a, b, dn, precision=_EXACT, preferred_element_type=jnp.float32)
    if mode == "bf16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32)
    return _dot3(a, b, dn)

FEAT = 16  # SoA rows (10 used; Mosaic requires HBM-slice sublane dims to be
# multiples of 8, so 12 is not expressible as a DMA block)
GID_ROW = 9  # feature/grad row carrying the gaussian id (f32-exact < 2^24)
OUTC = 8  # output columns per pixel: r, g, b, final_T, chunks_done, pad

# Full-f32 matmul accuracy on the MXU (plain bf16 would lose ~0.4% on the
# pixel-coordinate moment matrices, breaking gradient parity with the jnp
# path); still far cheaper than the VPU reduction trees they replace.
_EXACT = jax.lax.Precision.HIGHEST


def _split_bf16(a):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~ a to ~2^-17 relative."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_exactrhs(a, m_bf):
    """a @ m for f32 ``a`` and a bf16-EXACT ``m`` (0/1 scan matrices): a
    2-pass hi/lo bf16 split. Versus Precision.HIGHEST (6 MXU passes) this
    runs the dominant (P,C)@(C,C) scan matmuls ~1.6x faster end-to-end
    (measured: fwd kernel 22.0 -> 13.7 ms at 1080p/1.5M instances) while
    keeping ~2^-17 relative accuracy (plain 1-pass bf16 loses 4e-3,
    visibly off parity)."""
    hi, lo = _split_bf16(a)
    kw = dict(preferred_element_type=jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    return (jax.lax.dot_general(hi, m_bf, dn, **kw)
            + jax.lax.dot_general(lo, m_bf, dn, **kw))


def _dot3(a, b, dn):
    """3-pass split-bf16 matmul for two INEXACT f32 operands: hh + hl + lh
    (the dropped lo*lo term is ~2^-34 relative). ~2^-22 accuracy at half the
    MXU passes of Precision.HIGHEST's 6; used where there is no catastrophic
    cancellation downstream (color accumulation, cotangent-weighted sums —
    NOT the pixel-coordinate moment matrix, see _bwd_kernel)."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    kw = dict(preferred_element_type=jnp.float32)
    return (jax.lax.dot_general(ah, bh, dn, **kw)
            + jax.lax.dot_general(ah, bl, dn, **kw)
            + jax.lax.dot_general(al, bh, dn, **kw))


def _dot3_lanes(a, b):
    """3-limb version of _dot_lanes: contract lane axes, (P,C)x(Q,C)->(P,Q)."""
    return _dot3(a, b, (((1,), (1,)), ((), ())))


def _dot3_sub(a, b):
    """3-limb version of _dot_sub: contract sublane axes, (P,Q)x(P,C)->(Q,C)."""
    return _dot3(a, b, (((0,), (0,)), ((), ())))




def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=_EXACT,
        preferred_element_type=jnp.float32,
    )


def _dot_lanes(a, b):
    """Contract the lane (last) axis of both operands: (P, C) x (Q, C) ->
    (P, Q) without materializing a transpose."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), precision=_EXACT,
        preferred_element_type=jnp.float32,
    )


def _dot_sub(a, b):
    """Contract the sublane (first) axis of both operands: (P, Q) x (P, C)
    -> (Q, C) without materializing a transpose."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), precision=_EXACT,
        preferred_element_type=jnp.float32,
    )


_SCAN_BLK = 128  # lane width of one MXU scan matmul


def _prefix_scan(x, m128, blk, carry0=None):
    """Per-lane EXCLUSIVE prefix sums of x (P, C) plus the full-row total
    (P, 1). For C > blk the scan runs hierarchically in blk-wide MXU blocks
    with a running carry: per-instance matmul cost stays P*blk instead of
    P*C, which is what makes 256-wide DMA chunks (half the loop/DMA-wait
    overhead) affordable. ``carry0`` (P, 1) seeds the scan (the cross-chunk
    log-transmittance in the blend kernels — folding it here saves a full
    (P, C) add per chunk); the returned total EXCLUDES the seed."""
    c = x.shape[1]
    p = x.shape[0]
    zero = jnp.zeros((p, 1), jnp.float32)
    if carry0 is None:
        carry0 = zero
    if c <= blk:
        s = _dot_exactrhs(x, m128)
        return s + carry0, s[:, -1:] + x[:, -1:]
    parts = []
    carry = zero
    for i in range(c // blk):
        xb = x[:, i * blk:(i + 1) * blk]
        s = _dot_exactrhs(xb, m128)
        parts.append(s + (carry + carry0))
        carry = carry + (s[:, -1:] + xb[:, -1:])
    return jnp.concatenate(parts, axis=1), carry


def _suffix_scan(x, m128, blk):
    """Per-lane EXCLUSIVE suffix sums of x (P, C) plus the full-row total,
    hierarchical like _prefix_scan but right-to-left."""
    c = x.shape[1]
    if c <= blk:
        s = _dot_exactrhs(x, m128)
        return s, s[:, 0:1] + x[:, 0:1]
    parts = [None] * (c // blk)
    carry = jnp.zeros((x.shape[0], 1), jnp.float32)
    for i in reversed(range(c // blk)):
        xb = x[:, i * blk:(i + 1) * blk]
        s = _dot_exactrhs(xb, m128)
        parts[i] = s + carry
        carry = carry + (s[:, 0:1] + xb[:, 0:1])
    return jnp.concatenate(parts, axis=1), carry


def _alpha_terms(f, px, py, ids, lo, hi):
    """Shared recompute: SoA chunk (FEAT, C) -> alpha (P, C) and friends.
    Same math as the CUDA forward inner loop (forward.cu:330-343). Measured
    on hardware (twice — re-validated with split-bf16 precision and
    tile-local coefficients): the direct VPU evaluation beats an MXU
    moment-expansion of the quadratic (fwd kernel 33 -> 38 ms with a 5-pass
    (P,6)@(6,C) expansion; the skinny K=6 matmuls pay Mosaic layout/latency
    costs that swamp the ~10 saved VPU passes, and 2-limb coefficient
    splits additionally lose 2e-3 of color accuracy near tile edges).
    ``ids`` are global instance slots; only [lo, hi) belongs
    to this tile (superset chunks overlap neighboring tiles' slots).

    VPU pass budget (stage attribution showed both kernels VPU-bound at
    ~1% of HBM peak): the lane-validity mask and the opacity multiply are
    folded into ONE (1, C) log-opacity row — alpha_raw =
    exp(power + log(op)), with log(op) = -inf on lanes outside [lo, hi) so
    invalid lanes yield alpha_raw = 0 and fail the >= 1/255 gate for free.
    This trims 3 of the ~17 (P, C) passes (the op multiply, the valid
    broadcast-AND, and one gate AND) without changing any kept value:
    exp(power + log(op)) rounds differently from op * exp(power) by <= 1
    ulp of each, within the 1e-3 cross-impl tolerance every parity test
    uses (the jnp path keeps the reference's literal op * exp(power))."""
    valid = (ids >= lo) & (ids < hi)  # (1, C)
    # log(op): op rows are padded with zeros for dead lanes -> log(0) =
    # -inf does the masking; explicitly force invalid (neighbor-tile) lanes
    logop = jnp.where(valid, jnp.log(f[8:9, :]), -jnp.inf)  # (1, C)
    mode = TUNE["alpha"]
    if mode in ("bf16", "bf16x"):
        # Cholesky factorization of the conic, per-instance (1, C) rows in
        # f32 (narrow — cost amortizes over P pixels): power =
        # -0.5*(u^2 + v^2) with u = l11*dx, v = l21*dx + l22*dy. Unlike the
        # direct quadratic, the sum-of-squares form has NO cancellation, so
        # the wide (P, C) chain can run in bf16: abs(power error) ~
        # |u|*|du| + |v|*|dv| ~ |power| * 2^-8 — error vanishes where the
        # blend weight is large. power <= 0 holds by construction, so the
        # reference's power>0 skip (forward.cu:337-340) is free.
        ca, cb, cc = f[2:3, :], f[3:4, :], f[4:5, :]
        # PIVOTED factorization (factor on the larger diagonal): for PSD
        # conics |cb| <= sqrt(ca*cc) <= max diag, so pivoting bounds the
        # off-diagonal factor |l21| <= l11 — without it, an elongated
        # near-axis-aligned gaussian gives l21 = cb/sqrt(tiny) and the
        # v = l21*dx + l22*dy cancellation amplifies bf16 rounding to an
        # O(1) power error (measured 31.5 dB vs f32; pivoted: ~50 dB).
        # u = p*dx + q*dy, v = r*dx + s*dy with per-instance narrow rows.
        piv = ca >= cc
        d1 = jnp.where(piv, ca, cc)
        l11 = jnp.sqrt(d1)
        inv = jnp.where(d1 > 0, 1.0 / jnp.maximum(l11, 1e-30), 0.0)
        l21 = cb * inv
        l22 = jnp.sqrt(jnp.maximum(jnp.where(piv, cc, ca) - l21 * l21, 0.0))
        zero = jnp.zeros_like(l11)
        p_c = jnp.where(piv, l11, zero)
        q_c = jnp.where(piv, zero, l11)
        r_c = jnp.where(piv, l21, l22)
        s_c = jnp.where(piv, l22, l21)
        if mode == "bf16x":
            # fully-bf16 subtraction: px/py and the center rows are GLOBAL
            # coordinates (bf16-rounding them directly would cost up to
            # |x|*2^-9 ~ 2px at 1080p), so shift both operands to the
            # tile-local frame on their cheap NARROW axes first — the wide
            # (P, C) subtraction is then the only full pass, in bf16.
            x0, y0 = px[0:1, 0:1], py[0:1, 0:1]
            dxb = (f[0:1, :] - x0).astype(jnp.bfloat16) - (
                px - x0).astype(jnp.bfloat16)
            dyb = (f[1:2, :] - y0).astype(jnp.bfloat16) - (
                py - y0).astype(jnp.bfloat16)
        else:
            dxb = (f[0:1, :] - px).astype(jnp.bfloat16)  # (P, C)
            dyb = (f[1:2, :] - py).astype(jnp.bfloat16)
        u = p_c.astype(jnp.bfloat16) * dxb + q_c.astype(jnp.bfloat16) * dyb
        v = r_c.astype(jnp.bfloat16) * dxb + s_c.astype(jnp.bfloat16) * dyb
        q = (u * u + v * v).astype(jnp.float32)  # (P, C) = -2*power
        power = -0.5 * q
        alpha_raw = jnp.exp(power + logop)
        alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
        keep = alpha_raw >= ALPHA_MIN
        alpha = jnp.where(keep, alpha, 0.0)
        return alpha, alpha_raw, power, keep
    hca = -0.5 * f[2:3, :]
    ncb = -f[3:4, :]
    hcc = -0.5 * f[4:5, :]
    dx = f[0:1, :] - px  # (P, C)
    dy = f[1:2, :] - py
    # power = -0.5 ca dx^2 - cb dx dy - 0.5 cc dy^2, FMA-chained
    power = (hca * dx + ncb * dy) * dx + (hcc * dy) * dy
    alpha_raw = jnp.exp(power + logop)
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    # the reference skips pixels with power > 0 (forward.cu:337-340) and
    # alpha < 1/255 (:344-346)
    keep = (power <= 0.0) & (alpha_raw >= ALPHA_MIN)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, alpha_raw, power, keep


def _prefix_excl_matrix(chunk):
    """(C, C) bf16 (exact 0/1) with M[j, i] = [j < i]: lom @ M gives each
    lane the EXCLUSIVE prefix sum of log-transmittances on the MXU (measured
    ~1.5x faster than the 7-step log-doubling shift chain it replaces; the
    bf16-split _dot_exactrhs halves it again vs Precision.HIGHEST)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (ii < jj).astype(jnp.bfloat16)


def _suffix_excl_matrix(chunk):
    """(C, C) bf16 (exact 0/1) with M[j, i] = [j > i]: u @ M gives exclusive
    suffix sums."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (ii > jj).astype(jnp.bfloat16)


def _moment_matrix_T(pxl, pyl, pixels):
    """(6, P) pixel-coordinate moment ROWS [1, x, y, x^2, x*y, y^2] in the
    TILE-LOCAL frame, built directly in transposed layout from (1, P) lane
    iotas so the backward's moment reduction runs as a NATIVE
    (6,P)@(P,C) matmul — the previous (P,6)-sublane-contraction form cost
    ~13 ms/frame in layout shuffling (kernel ablation r3)."""
    ones_p = jnp.ones((1, pixels), jnp.float32)
    return jnp.concatenate(
        [ones_p, pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl], axis=0
    )


def _pixel_coords_T(t, grid_x, pixels, tile):
    """(1, P) lane-layout pixel centers of this tile (transposed twin of
    _pixel_coords, stride 1), in the TILE-LOCAL frame."""
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, pixels), 1)
    px = (pix % tile).astype(jnp.float32)
    py = (pix // tile).astype(jnp.float32)
    return px, py


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


# AMR round order -> subpixel offset within each 2x2 cell
# (amr/forward.cu:313-338 Z-pattern: round 1 (0,0), 2 (1,1), 3 (1,0), 4 (0,1))
_ROUND_OFFX = (0, 1, 1, 0)
_ROUND_OFFY = (0, 1, 0, 1)


def _pixel_coords_rounds(t, grid_x, tile, n_rounds):
    """Pixel centers for the FUSED AMR kernel: the pixel axis stacks
    ``n_rounds`` stride-2 subgrids of (tile/2)^2 pixels each, so one kernel
    pass computes rounds 1..n_rounds while streaming the tile's instance
    list ONCE (the per-round re-stream was measured 2.5x SLOWER than a
    plain full-res forward — VERDICT r2 weak #2)."""
    ox = (t % grid_x) * tile
    oy = (t // grid_x) * tile
    pw = tile // 2
    sub = pw * pw
    pix = jax.lax.broadcasted_iota(jnp.int32, (n_rounds * sub, 1), 0)
    rnd = pix // sub
    sp = pix % sub
    # offx by round index: (0,1,1,0) = [rnd in {1,2}]; offy: (0,1,0,1) = rnd&1
    offx = ((rnd == 1) | (rnd == 2)).astype(jnp.int32)
    offy = rnd & 1
    px = (ox + (sp % pw) * 2 + offx).astype(jnp.float32)
    py = (oy + (sp // pw) * 2 + offy).astype(jnp.float32)
    return px, py


def _blend_stream_loop(feat_hbm, fbuf, sem, o, n, start, n_chunks,
                       px, py, chunk, pixels, blk, prefix_m,
                       cwstash=None, cfstash=None, step: int = 1,
                       scale_only: bool = False):
    """The shared double-buffered chunk-stream + log-space compositing loop
    (see _fwd_kernel header notes). Returns (chunks_done, logT (P, 1),
    rgb_acc (P, 3)). Row-independent: ``px``/``py`` may stack any pixel
    sets (full tiles, strided subgrids, multiple AMR rounds) on the P axis.

    When ``cwstash``/``cfstash`` scratch refs are passed, the color matmul
    is SOFTWARE-PIPELINED one chunk behind the alpha/scan chain: its lhs
    ``w`` is the END of the VPU dependency chain, so issuing it in-line
    serializes the MXU behind the VPU every chunk (the same bubble the bwd
    kernel's moment matmul had — see _bwd_kernel geom_step). The deferred
    matmul reads last chunk's stash while this chunk's VPU chain runs.

    ``step`` > 1 DECIMATES the instance stream: only every step-th chunk is
    fetched and composited, with exact aggregate-opacity compensation
    alpha' = 1 - (1-alpha)^step (the skipped neighbors are modeled as
    repeats of the kept instance; in log space this is just lom * step, so
    the scan structure is unchanged). Foveated peripheral tiles use this
    to cut the per-tile instance WORK, not just the pixel rows — cutting
    pixel rows alone leaves coarse tiles paying the full per-chunk stream
    cost (VERDICT r3 weak #2: fused foveation saved nothing because the
    kernels are instance-stream-bound).

    ``scale_only`` (with step > 1): the stream was ALREADY decimated
    upstream (binning-time gaze decimation, ops/binning gaze_decim — the
    dropped instances never entered the megasort), so every chunk is
    fetched (stride 1) and only the aggregate-opacity compensation
    lom * step applies, to every instance uniformly (each survivor stands
    in for ``step`` originals; there is no exact tail count here, unlike
    the chunk-stride path whose tail rep is known)."""

    nbuf = fbuf.shape[0]
    n_chunks_full = n_chunks
    dma_step = 1 if scale_only else step
    if step > 1 and not scale_only:
        n_chunks = pl.cdiv(n_chunks, step)

    def dma(slot, ci):
        off = pl.multiple_of(start + ci * dma_step * chunk, chunk)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, chunk)],
            fbuf.at[slot],
            sem.at[slot],
        )

    for j in range(nbuf - 1):
        @pl.when(j < n_chunks)
        def _(j=j):
            dma(j, j).start()

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    defer_color = cwstash is not None and TUNE["defer_color"]

    def color_term(ci_prev):
        """Deferred color contribution of chunk ``ci_prev`` from the stash;
        garbage on ci_prev < 0 (bootstrap) — caller gates with a select.
        Accumulation on the MXU in NATIVE (M,K)@(K,N) form; 3-limb split
        (no cancellation in a positive-weighted color sum) halves the
        HIGHEST-precision passes."""
        sl = ci_prev % 2
        return _dot_tuned(
            TUNE["color"], cwstash[sl, 0:pixels, :], cfstash[sl, 0:3, :].T,
            (((1,), (0,)), ((), ())))

    def body(carry):
        ci, logT, rgb_acc, done = carry

        @pl.when(ci + nbuf - 1 < n_chunks)
        def _():
            dma((ci + nbuf - 1) % nbuf, ci + nbuf - 1).start()

        dma(ci % nbuf, ci).wait()
        f = fbuf[ci % nbuf]
        ids = start + ci * dma_step * chunk + lane_ids

        if defer_color:
            # previous chunk's color matmul overlaps this chunk's VPU chain
            # (on ci == 0 the stash is stale: select drops it, and
            # where() also blocks stale NaNs from propagating)
            rgb_acc = rgb_acc + jnp.where(ci > 0, color_term(ci - 1), 0.0)

        alpha, _, _, _ = _alpha_terms(f, px, py, ids, o, o + n)

        # Transmittance entirely in log space: per-lane exclusive prefix
        # sums of log(1 - alpha) ride the MXU (prefix_m), and exp is
        # near-free on the VPU's special-function pipeline (measured). Log
        # space is also exact where a raw f32 product underflows in
        # saturated tiles (which would zero the backward reconstruction).
        om = 1.0 - alpha  # (P, C)
        lom = jnp.log(om)  # alpha <= 0.99 keeps this finite
        if step > 1 and scale_only:
            # pre-decimated stream: uniform compensation, every survivor
            # stands in for ``step`` originals (masked lanes: lom = 0)
            lom = lom * float(step)
            alpha = 1.0 - jnp.exp(lom)
        elif step > 1:
            # aggregate-opacity compensation: this chunk stands in for
            # ``rep`` original chunks (< step on the tail so partially
            # filled tiles aren't over-weighted): alpha' = 1-(1-alpha)^rep,
            # i.e. lom *= rep in log space and alpha from -expm1 (finite:
            # _alpha_terms clamps alpha at 0.99 so lom >= step*log(0.01))
            rep = jnp.minimum(step, n_chunks_full - ci * step)
            lom = lom * rep.astype(jnp.float32)
            # rep == 1 chunks (tails / single-chunk tiles) stay EXACTLY the
            # undecimated values — don't round-trip them through exp.
            # (1 - exp, not expm1: Mosaic has no expm1 lowering; the lost
            # low bits only matter for alpha ~< 1e-6, far below the 1/255
            # blend gate this path feeds.)
            alpha = jnp.where(rep > 1, 1.0 - jnp.exp(lom), alpha)
        # excl prefix log-sums, seeded with the cross-chunk carry
        s, tot = _prefix_scan(lom, prefix_m, blk, carry0=logT)
        w = alpha * jnp.exp(s)  # (P, C) blend weights
        if defer_color:
            cwstash[ci % 2, 0:pixels, :] = w
            cfstash[ci % 2, 0:3, :] = f[5:8, :]
        else:
            rgb_acc = rgb_acc + _dot_tuned(
                TUNE["color"], w, f[5:8, :].T, (((1,), (0,)), ((), ())))
        logT = logT + tot  # full-chunk log-product (same grouping as bwd)
        done = jnp.max(logT) < LOG_T_MIN
        return ci + 1, logT, rgb_acc, done

    def cond(carry):
        ci, _, _, done = carry
        return (ci < n_chunks) & jnp.logical_not(done)

    zero = jnp.zeros((pixels, 1), jnp.float32)
    ci, logT, rgb_acc, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), zero, jnp.zeros((pixels, 3), jnp.float32),
                     jnp.bool_(False))
    )

    if defer_color:
        # the last processed chunk's color term is still pending
        rgb_acc = rgb_acc + jnp.where(ci > 0, color_term(ci - 1), 0.0)

    # early exit leaves up to nbuf-1 prefetched DMAs in flight: drain them
    for j in range(nbuf - 1):
        @pl.when(ci + j < n_chunks)
        def _(j=j):
            dma((ci + j) % nbuf, ci + j).wait()

    return ci, logT, rgb_acc


def _fwd_kernel(
    off_ref,  # scalar prefetch: (num_tiles+1,) int32, raw CSR offsets
    counts_ref,  # scalar prefetch: (num_tiles,) int32, instance counts (gated ok)
    feat_hbm,  # (FEAT, K) f32, ANY/HBM, depth-sorted CSR SoA layout
    out_ref,  # (1, P, OUTC) f32 VMEM: cols 0-2 rgb, 3 final_T, 4 chunks done
    fbuf,  # scratch VMEM (2, FEAT, CHUNK)
    sem,  # DMA sems (2,)
    cwstash,  # scratch (2, P, CHUNK): deferred-color weight handoff
    cfstash,  # scratch (2, 8, CHUNK): deferred-color rgb-row handoff
    *, chunk: int, pixels: int, tile: int, grid_x: int, stride: int = 1,
    offx: int = 0, offy: int = 0, n_rounds: int = 0, step: int = 1,
    scale_only: bool = False,
):
    t = pl.program_id(0)
    o = off_ref[t]
    n = counts_ref[t]
    start = (o // chunk) * chunk  # aligned superset start
    n_chunks = jnp.where(n > 0, pl.cdiv(o + n - start, chunk), 0)
    if n_rounds > 0:
        px, py = _pixel_coords_rounds(t, grid_x, tile, n_rounds)
    else:
        px, py = _pixel_coords(t, grid_x, pixels, tile, stride, offx, offy)
    blk = min(chunk, _SCAN_BLK)
    prefix_m = _prefix_excl_matrix(blk)  # loop-invariant, hoisted

    ci, logT, rgb_acc = _blend_stream_loop(
        feat_hbm, fbuf, sem, o, n, start, n_chunks, px, py, chunk, pixels,
        blk, prefix_m, cwstash=cwstash, cfstash=cfstash, step=step,
        scale_only=scale_only)

    out_ref[0, :, 0:3] = rgb_acc
    out_ref[0, :, 3:4] = jnp.exp(logT)
    out_ref[0, :, 4:5] = jnp.broadcast_to(ci.astype(jnp.float32), (pixels, 1))
    out_ref[0, :, 5:6] = logT
    out_ref[0, :, 6:OUTC] = jnp.zeros((pixels, OUTC - 6), jnp.float32)


def _bwd_kernel(
    off_ref,  # scalar prefetch: (num_tiles+1,) int32, raw CSR offsets
    counts_ref,  # scalar prefetch: (num_tiles,) int32
    gaoff_ref,  # scalar prefetch: (num_tiles+1,) int32, grad-region offsets
    feat_hbm,  # (FEAT, K), depth-sorted CSR SoA layout
    gimg_ref,  # (1, P, OUTC): cols 0-2 dL/dcolor, 3 dL/dfinalT
    gimgT_ref,  # (1, OUTC, P): the same, pre-transposed by XLA (native-form
    #             lhs for the wmom matmul; in-kernel transposes are slow)
    fwdout_ref,  # (1, P, OUTC): forward output (col 3 final_T, col 4 chunks)
    dfeat_hbm,  # out: (FEAT, S) per-instance grads in per-tile regions, HBM
    fbuf,  # scratch (2, FEAT, CHUNK)
    dbuf,  # scratch (3, FEAT, CHUNK) grad staging; slot 2 = bootstrap dummy
    sem,  # DMA sems (2,)
    outsem,  # DMA sems for grad write-back (2,)
    dstash,  # scratch (2, P, CHUNK): d_power_px handoff to the deferred geom
    gstash,  # scratch (2, 16, CHUNK): coefficient-row + wmom handoff
    *, chunk: int, pixels: int, tile: int, grid_x: int,
):
    t = pl.program_id(0)
    o = off_ref[t]
    n = counts_ref[t]
    start = (o // chunk) * chunk
    n_chunks = jnp.where(n > 0, pl.cdiv(o + n - start, chunk), 0)
    gbase = gaoff_ref[t]
    px, py = _pixel_coords(t, grid_x, pixels, tile)

    gr = gimg_ref[0, :, 0:1]  # (P, 1)
    gg = gimg_ref[0, :, 1:2]
    gb = gimg_ref[0, :, 2:3]
    gT_ext = gimg_ref[0, :, 3:4]
    final_t = fwdout_ref[0, :, 3:4]
    n_chunks_done = fwdout_ref[0, 0, 4].astype(jnp.int32)
    log_final_t = fwdout_ref[0, :, 5:6]

    def dma_in(slot, ci):
        off = pl.multiple_of(start + ci * chunk, chunk)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, chunk)],
            fbuf.at[slot],
            sem.at[slot],
        )

    def grad_dma(slot, ci):
        off = pl.multiple_of(gbase + ci * chunk, chunk)
        return pltpu.make_async_copy(
            dbuf.at[slot], dfeat_hbm.at[:, pl.ds(off, chunk)], outsem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        dma_in((n_chunks - 1) % 2, n_chunks - 1).start()

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    # loop-invariant matrices for the MXU reductions, both built/read
    # DIRECTLY in the transposed (rows, P) layout the native (M,K)@(K,N)
    # matmul form wants (ablation r3: the sublane-contraction forms cost
    # ~13 + 3 ms/frame of layout shuffling). The moments use TILE-LOCAL
    # coordinates: the dx/dy expansion below is frame-invariant, but with
    # global coordinates the cancellation x_c*y_c*m0 - x_c*my - y_c*mx +
    # mxy amplifies f32 rounding by ~coord^2 (4e6 at 1080p), visibly
    # corrupting conic gradients; local coords bound it at tile^2.
    ox = ((t % grid_x) * tile).astype(jnp.float32)
    oy = ((t // grid_x) * tile).astype(jnp.float32)
    pxl_t, pyl_t = _pixel_coords_T(t, grid_x, pixels, tile)
    moment_mT = _moment_matrix_T(pxl_t, pyl_t, pixels)  # (6, P)
    cot_mT = gimgT_ref[0, 0:3, :]  # (3, P)
    blk = min(chunk, _SCAN_BLK)
    prefix_m = _prefix_excl_matrix(blk)
    suffix_m = _suffix_excl_matrix(blk)

    def geom_step(dst, sslot):
        """Deferred geometric-gradient block: the moment matmul + e_*
        expansion + dbuf write for the chunk whose VPU chain ran LAST
        iteration (stashes at ``sslot``), written to dbuf[``dst``].

        Deferring by one iteration breaks the serialization of the moment
        matmul behind the END of the VPU dependency chain
        (alpha -> scans -> d_power): production ablation r4 measured the
        in-line form's bubble at 8.8 ms/frame (full 33.1 ms, no_geom 20.5,
        matmul-on-independent-operand +2.4, chain-without-matmul +1.4).
        The caller keeps this STRAIGHT-LINE (no lax.cond around it) —
        Mosaic schedules freely only within a branchless region."""
        d = dstash[sslot]
        mom = _dot_tuned(TUNE["mom"], moment_mT, d,
                         (((1,), (0,)), ((), ())))  # (6, C)
        m0, mx, my, mxx, mxy, myy = (mom[j: j + 1, :] for j in range(6))
        x_c = gstash[sslot, 0:1, :]  # tile-local, matching moment_mT
        y_c = gstash[sslot, 1:2, :]
        ca = gstash[sslot, 2:3, :]
        cb = gstash[sslot, 3:4, :]
        cc = gstash[sslot, 4:5, :]
        opv = gstash[sslot, 5:6, :]
        e_x = x_c * m0 - mx  # sum_p d_power * dx
        e_y = y_c * m0 - my
        e_xx = x_c * x_c * m0 - 2.0 * x_c * mx + mxx
        e_xy = x_c * y_c * m0 - x_c * my - y_c * mx + mxy
        e_yy = y_c * y_c * m0 - 2.0 * y_c * my + myy
        dbuf[dst, 0:1, :] = -(ca * e_x + cb * e_y)
        dbuf[dst, 1:2, :] = -(cc * e_y + cb * e_x)
        dbuf[dst, 2:3, :] = -0.5 * e_xx
        dbuf[dst, 3:4, :] = -e_xy
        dbuf[dst, 4:5, :] = -0.5 * e_yy
        dbuf[dst, 5:8, :] = gstash[sslot, 7:10, :]  # wmom (computed inline)
        dbuf[dst, 8:9, :] = m0 / jnp.maximum(opv, 1e-30)
        # gaussian-id sort key (stashed pre-masked: this tile's own lanes
        # carry their id, superset lanes +inf so they sort past every live
        # instance)
        dbuf[dst, GID_ROW:GID_ROW + 1, :] = gstash[sslot, 6:7, :]
        dbuf[dst, GID_ROW + 1:FEAT, :] = jnp.zeros(
            (FEAT - GID_ROW - 1, chunk), jnp.float32
        )

    # --- pass 1: chunks the forward early-exited (ci >= n_chunks_done,
    # processed FIRST in back-to-front order). Their instances contributed
    # nothing (T < 1e-4): gradients are exactly zero, but the sort key
    # still needs real gaussian ids, so each chunk is written (zero
    # payload) rather than left as garbage. Splitting these into their own
    # cheap loop keeps the compute loop below BRANCH-FREE — the previous
    # lax.cond(computed, skipped) walled the scheduler off from
    # overlapping MXU and VPU work across the branch.
    n_done = jnp.minimum(n_chunks_done, n_chunks)
    n_skip = n_chunks - n_done

    def zero_body(i, _):
        ci = n_chunks - 1 - i

        @pl.when(ci > 0)
        def _():
            dma_in((ci - 1) % 2, ci - 1).start()

        # dbuf slots are keyed by CHUNK parity throughout: wait out the
        # grad DMA issued for the chunk that used this slot last
        @pl.when(ci + 2 < n_chunks)
        def _():
            grad_dma(ci % 2, ci + 2).wait()

        dma_in(ci % 2, ci).wait()
        f = fbuf[ci % 2]
        ids = start + ci * chunk + lane_ids
        lane_valid = (ids >= o) & (ids < o + n)
        dbuf[ci % 2, 0:GID_ROW, :] = jnp.zeros(
            (GID_ROW, chunk), jnp.float32)
        dbuf[ci % 2, GID_ROW:GID_ROW + 1, :] = jnp.where(
            lane_valid, f[GID_ROW:GID_ROW + 1, :], jnp.float32(jnp.inf))
        dbuf[ci % 2, GID_ROW + 1:FEAT, :] = jnp.zeros(
            (FEAT - GID_ROW - 1, chunk), jnp.float32)
        grad_dma(ci % 2, ci).start()
        return 0

    jax.lax.fori_loop(0, n_skip, zero_body, 0)

    # --- pass 2: live chunks, back-to-front (backward.cu:441-556),
    # branch-free body with the geom block software-pipelined one chunk
    # behind the VPU chain
    def comp_body(i, carry):
        ci = n_done - 1 - i
        logT_after, S = carry

        @pl.when(ci > 0)
        def _():
            dma_in((ci - 1) % 2, ci - 1).start()

        # deferred geom for the previously processed chunk cp = ci+1.
        # Iteration 0 has no predecessor: the SAME straight-line block runs
        # on stale stash into a dummy dbuf slot (2) that is never DMA'd,
        # keeping the body branchless.
        cp = ci + 1
        dst = jnp.where(i == 0, 2, cp % 2)

        @pl.when((i >= 1) & (cp + 2 < n_chunks))
        def _():
            grad_dma(cp % 2, cp + 2).wait()

        geom_step(dst, (i - 1) % 2)

        @pl.when(i >= 1)
        def _():
            grad_dma(cp % 2, cp).start()

        dma_in(ci % 2, ci).wait()
        f = fbuf[ci % 2]
        ids = start + ci * chunk + lane_ids
        lane_valid = (ids >= o) & (ids < o + n)  # (1, C)
        sslot = i % 2

        # stash the coefficient rows the deferred geom step needs
        # (fbuf[ci % 2] is overwritten by the DMA started at the NEXT
        # iteration's top, so geom can't read them from there)
        gstash[sslot, 0:1, :] = f[0:1, :] - ox
        gstash[sslot, 1:2, :] = f[1:2, :] - oy
        gstash[sslot, 2:5, :] = f[2:5, :]
        gstash[sslot, 5:6, :] = f[8:9, :]
        gstash[sslot, 6:7, :] = jnp.where(
            lane_valid, f[GID_ROW:GID_ROW + 1, :], jnp.float32(jnp.inf))

        alpha, alpha_raw, power, keep = _alpha_terms(
            f, px, py, ids, o, o + n
        )
        # Log-space reconstruction that inverts the forward's carry to
        # ~1 ulp (the CUDA backward instead divides by the global final_T,
        # backward.cu:503, which 0/0s once T underflows f32): the forward
        # stepped logT by the full-chunk log-product and weighted each
        # instance by exp(logT + prefix); recompute the identical MXU
        # prefix sums and subtract the identical total.
        om = 1.0 - alpha
        lom = jnp.log(om)
        s, tot = _prefix_scan(lom, prefix_m, blk)  # (P, C) excl prefix
        logT_before = logT_after - tot
        T_i = jnp.exp(logT_before + s)  # (P, C)
        w = alpha * T_i  # (P, C)

        # G_rgb[p, c] = sum_ch g_ch[p] * rgb_ch[c] as a NATIVE (P,3)@(3,C)
        # MXU matmul (3-limb split): replaces a 5-pass (P,C) broadcast-FMA
        # chain on the pass-count-bound VPU
        G_rgb = _dot_tuned(TUNE["grgb"], gimg_ref[0, :, 0:3], f[5:8, :],
                           (((1,), (0,)), ((), ())))
        u = G_rgb * w
        # cotangent-weighted weight sums ride inline (w is available
        # mid-chain, so this matmul already overlaps the suffix scan);
        # stashed for the deferred geom write. Positive-weighted, no
        # cancellation -> 3-limb split (half of HIGHEST's passes).
        wmom = _dot_tuned(TUNE["wmom"], cot_mT, w,
                          (((1,), (0,)), ((), ())))  # (3, C)
        gstash[sslot, 7:10, :] = wmom
        # suffix-EXCLUSIVE sum along lanes on the MXU: u @ U with
        # U[j, c] = [j > c] replaces a 7-step log-doubling shift chain
        suf_ex, suf_tot = _suffix_scan(u, suffix_m, blk)  # (P, C)
        S_i = S + suf_ex

        # d_power in the u-reusing form: on every lane the gate keeps
        # (alpha_raw < 0.99 so alpha == alpha_raw, and keep), d_alpha *
        # alpha_raw == alpha*T_i*G - alpha*S_i/om == u - (alpha/om)*S_i
        # — reusing u drops the separate T_i*G and *alpha_raw passes.
        # om replaces max(1-alpha, 1e-6) since alpha <= 0.99 bounds it at
        # 0.01 (masked lanes have alpha = 0 -> ratio 0, u 0). The 0.99
        # clamp gate matches the jnp.minimum vjp of the jnp path.
        d_power_px = jnp.where(
            keep & (alpha_raw < ALPHA_MAX),
            u - (alpha / om) * S_i, 0.0,
        )
        # hand the moment reduction to the NEXT iteration's geom_step
        dstash[sslot] = d_power_px
        return logT_before, S + suf_tot

    S0 = gT_ext * final_t  # dL/dT_final cotangent seeds the suffix accum
    jax.lax.fori_loop(0, n_done, comp_body, (log_final_t, S0))

    # final deferred geom block (chunk 0), then drain the in-flight
    # write-backs (slots are chunk-parity-keyed: chunk c used slot c % 2)
    @pl.when(n_done >= 1)
    def _():
        @pl.when(2 < n_chunks)
        def _():
            grad_dma(0, 2).wait()

        geom_step(jnp.int32(0), (n_done - 1) % 2)
        grad_dma(0, 0).start()

    @pl.when(n_chunks >= 2)
    def _():
        grad_dma(1, 1).wait()

    @pl.when(n_chunks >= 1)
    def _():
        grad_dma(0, 0).wait()


# ---------------------------------------------------------------------------
# Instance-layout bookkeeping (sorted CSR, no relayout)
# ---------------------------------------------------------------------------


def grad_region_offsets(offsets, chunk: int):
    """Chunk-aligned PRIVATE gradient-region offsets per tile.

    Tile t's backward pass reads the aligned superset
    [floor(o_t/chunk)*chunk, o_t+n_t) and writes one grad chunk per read
    chunk; regions are disjoint so no two grid programs DMA the same slots
    regardless of execution order. Returns gaoff (T+1,) int32; total size is
    bounded by K + T*chunk."""
    counts = offsets[1:] - offsets[:-1]
    start_al = (offsets[:-1] // chunk) * chunk
    span = offsets[1:] - start_al
    n_chunks = jnp.where(counts > 0, (span + chunk - 1) // chunk, 0)
    return jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(n_chunks * chunk).astype(jnp.int32)]
    )


def pack_features(xy, conic, rgb, op):
    """(N, FEAT) float32 feature rows."""
    n = xy.shape[0]
    f = jnp.zeros((n, FEAT), jnp.float32)
    f = f.at[:, 0:2].set(xy)
    f = f.at[:, 2:5].set(conic)
    f = f.at[:, 5:8].set(rgb)
    f = f.at[:, 8].set(op)
    return f


def _sorted_features(xy, conic, rgb, op, gauss_id, chunk):
    """Gather features into the depth-sorted CSR order: (FEAT, K') SoA with
    K' padded up to a chunk multiple (superset reads may touch the pad).
    Row GID_ROW carries each instance's gaussian id (exact in f32 for
    id < 2^24) — the backward kernel copies it out as the segment-reduction
    sort key."""
    feat = pack_features(xy, conic, rgb, op)[gauss_id]  # (K, FEAT) row gather
    feat = feat.at[:, GID_ROW].set(gauss_id.astype(jnp.float32))
    k = feat.shape[0]
    pad = (-k) % chunk
    if pad:
        feat = jnp.concatenate([feat, jnp.zeros((pad, FEAT), jnp.float32)], axis=0)
    return feat.T  # (FEAT, K')


def _fwd_call(feat_soa, offsets, counts, grid_x, grid_y, tile, chunk, interpret,
              stride=1, offx=0, offy=0, n_rounds=0, step=1, scale_only=False):
    num_tiles = grid_x * grid_y
    if n_rounds > 0:
        pixels = n_rounds * (tile // 2) * (tile // 2)
    else:
        pixels = (tile // stride) * (tile // stride)
    assert feat_soa.shape[1] % chunk == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, pixels, OUTC), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TUNE["nbuf"], FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((TUNE["nbuf"],)),
            pltpu.VMEM((2, pixels if TUNE["defer_color"] else 8, chunk),
                       jnp.float32),
            pltpu.VMEM((2, 8, chunk), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, pixels=pixels, tile=tile,
                          grid_x=grid_x, stride=stride, offx=offx, offy=offy,
                          n_rounds=n_rounds, step=step,
                          scale_only=scale_only),
        out_shape=jax.ShapeDtypeStruct((num_tiles, pixels, OUTC), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, counts, feat_soa)


def _bwd_call(feat_soa, offsets, counts, gaoff, gimg_tiles, fwd_out,
              grid_x, grid_y, tile, chunk, interpret):
    num_tiles = grid_x * grid_y
    pixels = tile * tile
    s_grad = feat_soa.shape[1] + num_tiles * chunk  # static bound on regions
    # pre-transpose the cotangent tiles in XLA (cheap fused transpose) so
    # the kernel's wmom matmul gets a native-layout (OUTC, P) lhs
    gimg_t = jnp.swapaxes(gimg_tiles, 1, 2)  # (T, OUTC, P)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, pixels, OUTC), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OUTC, pixels), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pixels, OUTC), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, chunk), jnp.float32),
            pltpu.VMEM((3, FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, pixels, chunk), jnp.float32),
            pltpu.VMEM((2, 16, chunk), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk, pixels=pixels, tile=tile,
                          grid_x=grid_x),
        out_shape=jax.ShapeDtypeStruct((FEAT, s_grad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, counts, gaoff, feat_soa, gimg_tiles, gimg_t, fwd_out)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _feat_soa_from_rows(feat_rows, chunk):
    """(10, K) sorted feature rows (binning.build_sorted_instances payload
    order == the kernels' SoA order) -> (FEAT, K') with zero rows 10..15 and
    lanes padded to a chunk multiple (superset reads may touch the pad)."""
    k = feat_rows.shape[1]
    pad = (-k) % chunk
    return jnp.pad(feat_rows, ((0, FEAT - feat_rows.shape[0]), (0, pad)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14, 15))
def splat_pallas(
    xy, conic, rgb, op, tiles_touched, rect_min, rect_max, cull_thr, depths,
    grid_x: int, grid_y: int, tile: int, chunk: int,
    max_instances: int, max_live: int, interpret: bool,
):
    """Differentiable binning + tile compositing, fused so the whole
    instance path (compaction sort -> expand -> key sort -> kernels) sits
    inside one custom_vjp whose backward returns per-GAUSSIAN gradients —
    no XLA gather anywhere (measured ~2.8 GB/s effective; the sort/expand
    path replaces it).

    Returns (tiles, aux): tiles (num_tiles, P, OUTC) with cols 0-2 color
    (no background) and col 3 final transmittance; aux = (num_instances,
    num_enumerated, overflow) mirroring ops/binning.Binning.
    """
    out, _ = _blend_fwd(
        xy, conic, rgb, op, tiles_touched, rect_min, rect_max, cull_thr,
        depths, grid_x, grid_y, tile, chunk, max_instances, max_live,
        interpret,
    )
    return out


def _blend_fwd(xy, conic, rgb, op, tiles_touched, rect_min, rect_max,
               cull_thr, depths, grid_x, grid_y, tile, chunk,
               max_instances, max_live, interpret):
    from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops

    si = binning_ops.build_sorted_instances(
        xy, conic, rgb, op, tiles_touched, rect_min, rect_max, cull_thr,
        depths, grid_x, grid_y, max_instances, tile_px=tile,
        max_live=max_live, interpret=interpret,
    )
    b = si.binning
    feat_soa = _feat_soa_from_rows(si.feat_rows, chunk)
    offsets = b.offsets
    counts = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
    out = _fwd_call(feat_soa, offsets, counts, grid_x, grid_y, tile, chunk,
                    interpret)
    aux = (b.num_instances, b.num_enumerated, b.overflow)
    res = (feat_soa, offsets, counts, out, b.gauss_start, b.gauss_count)
    return (out, aux), res


def _cumsum_blocked(col, blk=512):
    """Inclusive cumsum of a 1-D f32 column via a blocked triangular
    matmul at HIGHEST precision: XLA's native 1-D cumsum at S~2M lowers to
    a slow loop (~2.5 ms for the 9-column segment-reduce sums); this runs
    the same reduction as (S/blk, blk)@(blk, blk) MXU passes (~0.1 ms),
    with per-prefix accuracy at least as good as the sequential form."""
    s = col.shape[0]
    pad = (-s) % blk
    x = jnp.pad(col, (0, pad)).reshape(-1, blk)
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    tri = (ii <= jj).astype(jnp.float32)
    inner = jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())), precision=_EXACT,
        preferred_element_type=jnp.float32)
    tot = inner[:, -1]
    offs = jnp.cumsum(tot) - tot
    return (inner + offs[:, None]).reshape(-1)[:s]


def _segment_reduce_grads(dfeat, gaoff, offsets, gauss_start, gauss_count):
    """Per-gaussian reduction (the CUDA atomicAdd, backward.cu:523-554)
    with ONE key+payload sort and no gather/scatter: the kernel tagged
    every written grad column with its gaussian id (GID_ROW; +inf on
    dead lanes with zero payloads), so sorting by that key groups every
    gaussian's instance gradients contiguously in id order. Region slots
    beyond the written area (gaoff[-1]) are unwritten garbage: mask their
    keys to +inf — their (garbage) payloads then land past every live
    instance where the boundary positions below never reach."""
    s_ax = dfeat.shape[1]
    live = jax.lax.broadcasted_iota(jnp.int32, (s_ax,), 0) < gaoff[-1]
    key = jnp.where(live, dfeat[GID_ROW], jnp.inf)
    # zero dead-region payloads (unwritten garbage can be NaN/inf): the
    # boundary positions never reach them, but the blocked-matmul cumsum
    # below multiplies every element by its 0/1 triangular weight and
    # 0 * NaN = NaN would poison whole blocks
    sorted_ = jax.lax.sort(
        (key,) + tuple(jnp.where(live, dfeat[j], 0.0) for j in range(9)),
        num_keys=1,
    )
    # Gaussian g's instances occupy positions [min(gauss_start[g], n_live),
    # min(gauss_start[g+1], n_live)) of the sorted order: gauss_start is the
    # exclusive cumsum of emitted counts, and capacity-dropped instances
    # (pre-sort slot >= max_instances) are exactly the tail beyond
    # n_live = offsets[-1], so the min() accounts for them.
    n = gauss_start.shape[0]
    last = gauss_start[n - 1: n] + gauss_count[n - 1: n]
    pos = jnp.minimum(jnp.concatenate([gauss_start, last]), offsets[-1])
    if TUNE["segreduce"] == "segsum":
        # one-pass MXU range-test segment sums over the sorted columns
        from gaussian_splatting_with_eye_tracking_tpu.ops import segsum
        rows = jnp.concatenate(
            [jnp.stack(sorted_[1:], axis=0),
             jnp.zeros((7, s_ax), jnp.float32)], axis=0)  # (16, S) sublane pad
        interpret = jax.default_backend() != "tpu"
        return segsum.segment_sum_bounds(rows, pos, interpret=interpret).T[:, :9]
    # blocked-matmul cumsums (see _cumsum_blocked), stacked (S+1, 9)
    # row-major for the boundary row gather below. N+1 boundary ROWS (a
    # lane-axis take of the (9, S) cumsum measured ~3x slower: XLA's lane
    # gathers transpose internally).
    csum = jnp.concatenate(
        [jnp.zeros((1, 9), jnp.float32),
         jnp.stack([_cumsum_blocked(c) for c in sorted_[1:]], axis=1)],
        axis=0,
    )
    at_bounds = csum[pos]  # (N+1, 9) boundary row gather
    seg = at_bounds[1:] - at_bounds[:-1]  # (N, 9)
    return seg


def _blend_bwd(grid_x, grid_y, tile, chunk, max_instances, max_live,
               interpret, res, g_all):
    g_out = g_all[0]  # aux cotangents (int outputs) are symbolic zeros
    feat_soa, offsets, counts, fwd_out, gauss_start, gauss_count = res
    gaoff = grad_region_offsets(offsets, chunk)
    dfeat = _bwd_call(
        feat_soa, offsets, counts, gaoff, g_out, fwd_out,
        grid_x, grid_y, tile, chunk, interpret,
    )
    seg = _segment_reduce_grads(dfeat, gaoff, offsets, gauss_start, gauss_count)
    return (
        seg[:, 0:2],  # d xy
        seg[:, 2:5],  # d conic
        seg[:, 5:8],  # d rgb
        seg[:, 8],  # d opacity
        None,  # tiles_touched
        None,  # rect_min
        None,  # rect_max
        None,  # cull_thr
        None,  # depths
    )


splat_pallas.defvjp(_blend_fwd, _blend_bwd)


# --- explicit-instance-list path (kernel-level reference; arbitrary lists,
# including hand-built ones in tests; the gather here is XLA's — slow on
# TPU, fine on CPU and for parity checks) -----------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def blend_pallas(
    xy, conic, rgb, op, gauss_id, offsets, gauss_start, gauss_count,
    grid_x: int, grid_y: int, tile: int, chunk: int, interpret: bool,
):
    """Differentiable tile compositing over an EXPLICIT depth-sorted CSR
    instance list (ops/binning.bin_gaussians). Returns tiles
    (num_tiles, P, OUTC): cols 0-2 color (no background), col 3 final
    transmittance. Production rendering uses splat_pallas (fused,
    gather-free); this entry is the kernels' list-level contract."""
    out, _ = _blend_list_fwd(
        xy, conic, rgb, op, gauss_id, offsets, gauss_start, gauss_count,
        grid_x, grid_y, tile, chunk, interpret,
    )
    return out


def _blend_list_fwd(xy, conic, rgb, op, gauss_id, offsets, gauss_start,
                    gauss_count, grid_x, grid_y, tile, chunk, interpret):
    feat_soa = _sorted_features(xy, conic, rgb, op, gauss_id, chunk)
    counts = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
    out = _fwd_call(feat_soa, offsets, counts, grid_x, grid_y, tile, chunk,
                    interpret)
    return out, (feat_soa, offsets, counts, out, gauss_start, gauss_count)


def _blend_list_bwd(grid_x, grid_y, tile, chunk, interpret, res, g_out):
    feat_soa, offsets, counts, fwd_out, gauss_start, gauss_count = res
    gaoff = grad_region_offsets(offsets, chunk)
    dfeat = _bwd_call(
        feat_soa, offsets, counts, gaoff, g_out, fwd_out,
        grid_x, grid_y, tile, chunk, interpret,
    )
    seg = _segment_reduce_grads(dfeat, gaoff, offsets, gauss_start, gauss_count)
    return (
        seg[:, 0:2], seg[:, 2:5], seg[:, 5:8], seg[:, 8],
        None, None, None, None,
    )


blend_pallas.defvjp(_blend_list_fwd, _blend_list_bwd)


def render_tiles_pallas_list(
    xy, conic, rgb, op, binning, grid_x, grid_y, tile, bg,
    chunk: int = 128, interpret: bool | None = None,
):
    """Full-image renderer over an explicit Binning (see blend_pallas)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiles = blend_pallas(
        xy, conic, rgb, op, binning.gauss_id, binning.offsets,
        binning.gauss_start, binning.gauss_count,
        grid_x, grid_y, tile, chunk, interpret,
    )
    return _assemble_tiles(tiles, grid_x, grid_y, tile, bg)


def _assemble_tiles(tiles, grid_x, grid_y, tile, bg):
    color = tiles[:, :, 0:3]  # (T, P, 3)
    final_t = tiles[:, :, 3]  # (T, P)
    color = color + final_t[:, :, None] * bg[None, None, :]
    color = color.reshape(grid_y, grid_x, tile, tile, 3)
    color = jnp.transpose(color, (4, 0, 2, 1, 3)).reshape(
        3, grid_y * tile, grid_x * tile)
    final_t = final_t.reshape(grid_y, grid_x, tile, tile)
    final_t = jnp.transpose(final_t, (0, 2, 1, 3)).reshape(
        grid_y * tile, grid_x * tile)
    return color, final_t


def render_tiles_pallas(
    prep, xy, grid_x, grid_y, tile, bg, max_instances, max_live,
    chunk: int = 128, interpret: bool | None = None,
):
    """Full-image Pallas renderer from a Preprocessed bundle (``xy`` passed
    separately so the caller can add the densification-stat offset).
    Returns (color, final_t, aux) with aux = (num_instances,
    num_enumerated, overflow). Background compositing and image assembly
    happen in XLA (autodiff covers their gradients, including d/d bg)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiles, aux = splat_pallas(
        xy, prep.conics, prep.rgb, prep.opacities, prep.tiles_touched,
        prep.rect_min, prep.rect_max, prep.cull_thr, prep.depths,
        grid_x, grid_y, tile, chunk, max_instances, max_live, interpret,
    )
    color, final_t = _assemble_tiles(tiles, grid_x, grid_y, tile, bg)
    return color, final_t, aux


def blend_round_pallas(
    feat_soa, offsets, grid_x, grid_y, tile,
    *, stride=1, offx=0, offy=0, chunk: int = 128, interpret: bool | None = None,
    counts_override=None,
):
    """Forward-only strided-subgrid compositing for AMR rounds
    (amr/forward.cu renderCUDA pixel pattern) over a prebuilt sorted SoA
    (``_feat_soa_from_rows`` of binning.build_sorted_instances feat_rows).
    Returns tiles (num_tiles, (tile/stride)^2, OUTC); no custom_vjp (the
    reference AMR path is forward-only: its autograd backward is broken and
    unused, SURVEY.md section 2.2)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if counts_override is None:
        counts = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
    else:
        counts = counts_override.astype(jnp.int32)
    return _fwd_call(
        feat_soa, offsets, counts, grid_x, grid_y, tile, chunk, interpret,
        stride=stride, offx=offx, offy=offy,
    )


def _fwd_levels_kernel(
    off_ref,  # scalar prefetch: (num_tiles+1,) int32 CSR offsets
    counts_ref,  # scalar prefetch: (num_tiles,) int32
    levels_ref,  # scalar prefetch: (num_tiles,) int32 AMR level 1..4
    feat_hbm,  # (FEAT, K) f32 depth-sorted CSR SoA
    out_ref,  # (1, 4*sub, OUTC): round r's subgrid in rows [r*sub,(r+1)*sub)
    fbuf, sem, cwstash, cfstash,
    *, chunk: int, tile: int, grid_x: int,
    decimation: tuple = (1, 1, 1, 1), scale_only: bool = False,
):
    """ONE kernel pass per tile computing AMR rounds 1..level_t stacked on
    the pixel-row axis of a SINGLE compositing pipeline (the chunk loop is
    row-independent, so stacking subgrids costs exactly their row count).
    The tile's level selects one of four statically-shaped loop variants
    via pl.when — a level-L tile runs the IDENTICAL pipeline as a
    full-resolution tile with P = L*(tile/2)^2 rows, so its cost is
    exactly the L/4 fraction the AMR scheme promises (a first draft
    branched per ROUND with lax.cond inside the chunk loop and lost the
    entire saving to 4x matmul/branch granularity). Versus the per-level
    4-call variant this also kills 3x the per-program floor; versus the
    reference's per-round launches (amr/rasterizer_impl.cu:334-460) each
    tile's instance list is streamed once. Output rows beyond the tile's
    level are left unwritten — callers mask by level."""
    t = pl.program_id(0)
    o = off_ref[t]
    n = counts_ref[t]
    lvl = levels_ref[t]
    start = (o // chunk) * chunk
    n_chunks = jnp.where(n > 0, pl.cdiv(o + n - start, chunk), 0)
    sub = (tile // 2) * (tile // 2)
    blk = min(chunk, _SCAN_BLK)
    prefix_m = _prefix_excl_matrix(blk)

    for level in (1, 2, 3, 4):
        @pl.when(lvl == level)
        def _(level=level):
            pixels = level * sub
            px, py = _pixel_coords_rounds(t, grid_x, tile, level)
            ci, logT, rgb_acc = _blend_stream_loop(
                feat_hbm, fbuf, sem, o, n, start, n_chunks, px, py, chunk,
                pixels, blk, prefix_m, cwstash=cwstash, cfstash=cfstash,
                step=decimation[level - 1], scale_only=scale_only)
            out_ref[0, 0:pixels, 0:3] = rgb_acc
            out_ref[0, 0:pixels, 3:4] = jnp.exp(logT)
            out_ref[0, 0:pixels, 4:OUTC] = jnp.zeros(
                (pixels, OUTC - 4), jnp.float32)


def blend_levels_fused_pallas(
    feat_soa, offsets, counts, levels, grid_x, grid_y, tile,
    *, chunk: int = 128, interpret: bool | None = None,
    decimation: tuple = (1, 1, 1, 1), scale_only: bool = False,
):
    """Single-call fused foveated compositing (see _fwd_levels_kernel).
    Returns (num_tiles, 4*(tile/2)^2, OUTC); rows [r*sub, (r+1)*sub) are
    round r+1's subgrid, VALID ONLY where levels > r (others unwritten).

    ``decimation[L-1]`` (power of two) additionally subsamples a level-L
    tile's instance stream with aggregate-opacity compensation (see
    _blend_stream_loop ``step``) — the lever that makes peripheral tiles
    CHEAPER to stream, not just smaller to shade. (1, 1, 1, 1) is
    output-identical to the reference's AMR protocol; the gaze-driven
    renderer defaults to (4, 2, 1, 1)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    num_tiles = grid_x * grid_y
    sub = (tile // 2) * (tile // 2)
    if interpret:
        # interpret mode: run the per-level gated variant (no uninitialized
        # out-block reads in the CPU emulator) and stitch the same layout
        parts = []
        for lvl in range(1, 5):
            gated = jnp.where(levels == lvl, counts, 0).astype(jnp.int32)
            parts.append(_fwd_call(
                feat_soa, offsets, gated, grid_x, grid_y, tile, chunk,
                True, n_rounds=lvl, step=decimation[lvl - 1],
                scale_only=scale_only))
        out = jnp.zeros((num_tiles, 4 * sub, OUTC), jnp.float32)
        for lvl, p in zip(range(1, 5), parts):
            m = (levels == lvl)[:, None, None]
            out = jnp.where(
                m, jnp.pad(p, ((0, 0), (0, (4 - lvl) * sub), (0, 0))), out)
        return out
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, 4 * sub, OUTC), lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TUNE["nbuf"], FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((TUNE["nbuf"],)),
            pltpu.VMEM((2, 4 * sub if TUNE["defer_color"] else 8, chunk),
                       jnp.float32),
            pltpu.VMEM((2, 8, chunk), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_levels_kernel, chunk=chunk, tile=tile,
                          grid_x=grid_x, decimation=tuple(decimation),
                          scale_only=scale_only),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 4 * sub, OUTC),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, counts.astype(jnp.int32), levels.astype(jnp.int32), feat_soa)


def blend_rounds_fused_pallas(
    feat_soa, offsets, counts, n_rounds: int, grid_x, grid_y, tile,
    *, chunk: int = 128, interpret: bool | None = None,
):
    """Forward-only FUSED AMR compositing: one kernel pass per tile computes
    rounds 1..n_rounds stacked along the pixel axis (each a stride-2
    subgrid), streaming the tile's instance chunks ONCE.

    The reference renders each AMR round in a separate kernel launch that
    re-reads the tile's whole [o, o+n) instance range
    (amr/rasterizer_impl.cu:334-460 per fovea step); on TPU that re-stream
    made the foveated path ~2.5x slower than a plain full-res forward
    (VERDICT r2, 119.8 ms vs ~45 ms at 1080p). Here a level-L tile's total
    work is one stream + L*(tile/2)^2 pixel rows — strictly less than the
    full-res tile for L < 4.

    ``counts`` gates which tiles render (0 = skip, typically
    where(tile_level == L, n_t, 0) so each tile is processed by exactly one
    of the 4 per-level calls). Returns (num_tiles, n_rounds*(tile/2)^2,
    OUTC); rows [r*(tile/2)^2, (r+1)*(tile/2)^2) are round r+1's subgrid in
    row-major (tile/2)x(tile/2) order."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fwd_call(
        feat_soa, offsets, counts.astype(jnp.int32), grid_x, grid_y, tile,
        chunk, interpret, n_rounds=n_rounds,
    )
