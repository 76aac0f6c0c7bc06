#!/usr/bin/env python
"""Honest per-stage timing of the 1080p fwd+bwd rasterization step.

Every probe is a separately-jitted function whose tensor inputs are passed
as ARGUMENTS (nothing closed over, so nothing is baked into the program as
a jit constant — the failure mode that made profile_stages.py unusable and
fps harnesses die with remote-compile HTTP 413 at 300k gaussians).

Timing protocol: K iterations chained inside ONE compiled program via
lax.fori_loop with a loop-variant perturbation on the stage input (defeats
loop-invariant hoisting), so the remote-dispatch round trip amortizes:
t = (T(1+K) - T(1)) / K.  Stage inputs are materialized EAGERLY by running
the pipeline prefix once outside the timed region.

Usage: python profile_stage_table.py [--json STAGES_r03.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import expand as expand_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend as pb
from gaussian_splatting_with_eye_tracking_tpu.ops import rasterize as rast
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import preprocess
from tests.helpers import make_camera, make_random_gaussians

# v5e single-chip peaks for roofline annotation
HBM_GBPS = 819.0
MXU_BF16_TFLOPS = 197.0

W, H, N = 1920, 1088, 300_000
TILE = 32
CHUNK = 128
MAXI = (1 << 20) + (1 << 19) + (1 << 16)   # bench.py capacities
MAXL = (1 << 20) + (1 << 18) + (1 << 17)
GX = -(-W // TILE)
GY = -(-H // TILE)
NT = GX * GY


def timeit(fn, *args, iters=8):
    """fn(*args, i) -> array pytree; args are jit ARGS, i is the
    loop-variant perturbation index."""

    @jax.jit
    def chained(k, *args):
        def body(i, acc):
            out = fn(*args, i)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., -1:].astype(jnp.float32)) if l.ndim
                    else l.astype(jnp.float32) for l in leaves)
            return acc + s

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    _ = float(chained(1, *args))  # compile + warm
    t1 = time.perf_counter(); _ = float(chained(1, *args)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, *args)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args_cli = ap.parse_args()

    cam = make_camera(W, H, cam_z=-5.0)
    means, scales, quats, op, sh = make_random_gaussians(
        N, seed=0, sh_degree=3, spread=2.5, scale_range=(-4.6, -3.0)
    )
    bg = jnp.zeros(3)
    rows = []

    def rec(name, ms, note=""):
        rows.append({"stage": name, "ms": round(ms * 1e3, 3), "note": note})
        print(f"{name:42s} {ms*1e3:9.3f} ms  {note}", flush=True)

    # ---- S1 preprocess ------------------------------------------------
    def s_prep(m, s, q, o, shc, i):
        p = preprocess(m * (1 + 1e-12 * i), s, q, o, shc, 3, cam, tile=TILE)
        return (p.means2d, p.rgb, p.conics, p.tiles_touched)

    t = timeit(s_prep, means, scales, quats, op, sh)
    rec("preprocess_fwd", t, f"N={N}")

    prep = jax.jit(lambda m: preprocess(m, scales, quats, op, sh, 3, cam,
                                        tile=TILE))(means)
    jax.block_until_ready(prep)

    # ---- S2 instance build, sub-staged -------------------------------
    p = prep
    tiles = p.tiles_touched.astype(jnp.int32)

    # 2a: enumeration prefix sums + the seg-expand window starts (the r4
    # pipeline's replacement for the old scatter-mark + K-cumsum slot map;
    # loop-variant perturbation that cannot constant-fold)
    def s_slotmap(tiles_t, i):
        pert = (jnp.float32(i) * 1e-30).astype(jnp.int32)
        cum = jnp.cumsum(tiles_t + pert)
        excl = cum - tiles_t
        live = tiles_t > 0
        seg = jnp.where(live, excl.astype(jnp.float32), jnp.inf)
        seg = jnp.sort(seg)  # stand-in for the compaction sort's seg row
        bounds = (jnp.arange(MAXI // 512, dtype=jnp.int32) * 512
                  ).astype(jnp.float32)
        c0 = jnp.searchsorted(seg, bounds, side="right").astype(jnp.int32)
        return (c0, cum)

    t = timeit(s_slotmap, tiles)
    rec("bin.enum_cumsum+seg_col0", t, f"K={MAXI} (incl stand-in N sort)")

    # 2b: compaction sort (17-tuple, N)
    rank_bits = max(1, (N - 1).bit_length())
    cum = jnp.cumsum(tiles)
    excl = cum - tiles
    live = tiles > 0
    order = jnp.argsort(p.depths)
    rank = jnp.zeros(N, jnp.int32).at[order].set(jnp.arange(N, dtype=jnp.int32))
    width_r = jnp.maximum(p.rect_max[:, 0] - p.rect_min[:, 0], 1)
    cols16 = [
        excl.astype(jnp.float32),
        (p.rect_min[:, 0] * 1024 + width_r).astype(jnp.float32),
        p.rect_min[:, 1].astype(jnp.float32),
        rank.astype(jnp.float32),
        p.means2d[:, 0], p.means2d[:, 1],
        p.conics[:, 0], p.conics[:, 1], p.conics[:, 2],
        jnp.maximum(p.cull_thr, 0.0),
        p.rgb[:, 0], p.rgb[:, 1], p.rgb[:, 2],
        p.opacities,
        jnp.arange(N, dtype=jnp.float32),
        p.depths,
    ]
    cols16 = jnp.stack(cols16, axis=0)  # (16, N)

    def s_compact(c16, live_f, i):
        livem = live_f > 0.5
        ckey = (jnp.where(livem, 0, 1) << rank_bits) | jnp.arange(N, dtype=jnp.int32)
        srt = jax.lax.sort((ckey + (i - i),) + tuple(c16[j] for j in range(16)),
                           num_keys=1)
        return srt[1:]

    t = timeit(s_compact, cols16, live.astype(jnp.float32))
    rec("bin.compaction_sort(N,17cols)", t, f"N={N}")

    table = jnp.stack(jax.jit(
        lambda c16, lf: s_compact(c16, lf, 0))(cols16, live.astype(jnp.float32)),
        axis=0)
    # r4 layout: row 0 doubles as the segment-start row (+inf on dead)
    table = table.at[0].set(
        jnp.sort(jnp.where(live, excl.astype(jnp.float32), jnp.inf)))
    jax.block_until_ready(table)

    # 2c: seg-expand kernel (in-kernel slot->column resolution)
    def s_expand(tb, i):
        return expand_ops.expand_rows_by_segments(
            tb * (1 + 1e-12 * i), seg_row=0, k=MAXI)

    t = timeit(s_expand, table)
    exp_bytes = (16 * MAXI * 4 * 2) / 1e9
    rec("bin.expand_by_segments(16,K)", t,
        f"~{exp_bytes:.2f} GB moved, {exp_bytes/ (t * HBM_GBPS) *100:.0f}% of HBM peak")

    x16 = jax.jit(lambda tb: expand_ops.expand_rows_by_segments(
        tb, seg_row=0, k=MAXI))(table)
    jax.block_until_ready(x16)

    # 2d: decode + cull + key build (K elementwise)
    k_iota = jnp.arange(MAXI, dtype=jnp.int32)
    total = cum[-1]

    def s_decode(x, i):
        e = x[0].astype(jnp.int32)
        rectp = x[1].astype(jnp.int32)
        miny = x[2].astype(jnp.int32)
        rank_k = x[3].astype(jnp.int32)
        cx, cy = x[4] * (1 + 1e-12 * i), x[5]
        ca, cb, cc = x[6], x[7], x[8]
        thr = x[9]
        r = k_iota - e
        w_r = jnp.maximum(rectp & 1023, 1)
        tx = (rectp >> 10) + r % w_r
        ty = miny + r // w_r
        valid = k_iota < total
        kept = valid & binning_ops._tile_ellipse_kept(
            tx, ty, cx, cy, ca, cb, cc, thr, TILE)
        tile_id = jnp.where(kept, ty * GX + tx, NT)
        sign = jnp.int32(-(1 << 31))
        key = ((tile_id << rank_bits) | jnp.where(valid, rank_k, 0)) ^ sign
        return (key, kept)

    t = timeit(s_decode, x16)
    rec("bin.decode+cull+key(K elemwise)", t, f"K={MAXI}")

    key, kept = jax.jit(lambda x: s_decode(x, 0))(x16)
    feats = tuple(x16[j] for j in (4, 5, 6, 7, 8, 10, 11, 12, 13, 14))
    jax.block_until_ready((key, kept))

    # 2e: THE MEGASORT (key + 10 f32 payloads at K). The perturbation must
    # be dynamic (i & 1): an earlier (i - i) probe constant-folded and XLA
    # hoisted the sort out of the timing loop, reporting 0.19 ms for what
    # is really ~8.7 ms.
    def s_megasort(k_, f_, i):
        srt = jax.lax.sort((k_ + (i & 1),) + f_, num_keys=1)
        return tuple(s[:MAXL] for s in srt)

    t_mega = timeit(s_megasort, key, feats)
    sort_bytes = 11 * MAXI * 4 / 1e9
    rec("bin.MEGASORT(key+10payload,K)", t_mega,
        f"{sort_bytes*1e3:.0f} MB live data")

    # sort scaling model at the same K
    for npay in (0, 1, 2, 4):
        t = timeit(lambda k_, f_, i, npay=npay: jax.lax.sort(
            (k_ + (i & 1),) + f_[:npay], num_keys=1)[0], key, feats)
        rec(f"sortmodel.key+{npay}f32(K)", t)

    srt = jax.jit(lambda k_, f_: s_megasort(k_, f_, 0))(key, feats)
    tile_sorted = jax.jit(
        lambda ks: jax.lax.shift_right_logical(
            ks ^ jnp.int32(-(1 << 31)), rank_bits))(srt[0])
    feat_rows = jnp.stack(srt[1:], axis=0)
    jax.block_until_ready((tile_sorted, feat_rows))

    # 2f: offsets + gauss_start/count bookkeeping
    def s_offsets(ts, kept_, i):
        offsets = jnp.searchsorted(
            ts + (i & 1), jnp.arange(NT + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        kc = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(kept_.astype(jnp.int32))])
        idx = jnp.stack([jnp.minimum(excl, MAXI), jnp.minimum(cum, MAXI)], axis=1)
        bounds = kc[idx]
        live_count = bounds[:, 1] - bounds[:, 0]
        return (offsets, live_count)

    t = timeit(s_offsets, tile_sorted, kept)
    rec("bin.offsets+counts", t)

    offsets, live_count = jax.jit(lambda ts, k_: s_offsets(ts, k_, 0))(
        tile_sorted, kept)
    live_start = jnp.cumsum(live_count) - live_count
    counts = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
    feat_soa = jax.jit(
        lambda fr: pb._feat_soa_from_rows(fr, CHUNK))(feat_rows)
    jax.block_until_ready((offsets, counts, feat_soa))
    n_inst = int(offsets[-1])

    # ---- S3 forward kernel -------------------------------------------
    def s_fwd(fs, off, cnt, i):
        return pb._fwd_call(fs * (1 + 1e-12 * i), off, cnt, GX, GY, TILE,
                            CHUNK, False)

    t_fwd = timeit(s_fwd, feat_soa, offsets, counts)
    fwd_bytes = 16 * n_inst * 4 / 1e9  # superset re-reads ignored
    rec("fwd_kernel", t_fwd,
        f"K_live={n_inst}, ~{fwd_bytes*1e3:.0f} MB DMA min, "
        f"{fwd_bytes/(t_fwd*HBM_GBPS)*100:.0f}% HBM peak")

    fwd_out = jax.jit(lambda fs, off, cnt: pb._fwd_call(
        fs, off, cnt, GX, GY, TILE, CHUNK, False))(feat_soa, offsets, counts)
    jax.block_until_ready(fwd_out)

    # ---- S4 assemble + loss + d/d tiles ------------------------------
    def s_loss(tiles_, i):
        def f(tl):
            color, _ = pb._assemble_tiles(tl, GX, GY, TILE, bg)
            return jnp.mean(color[:, :H, :W] ** 2)

        l, g = jax.value_and_grad(f)(tiles_ * (1 + 1e-12 * i))
        return (l, g)

    t = timeit(s_loss, fwd_out)
    rec("assemble+loss+grad_to_tiles", t)

    g_out = jax.jit(lambda tl: jax.grad(
        lambda x: jnp.mean(pb._assemble_tiles(x, GX, GY, TILE, bg)[0][:, :H, :W] ** 2)
    )(tl))(fwd_out)
    gaoff = jax.jit(lambda o: pb.grad_region_offsets(o, CHUNK))(offsets)
    jax.block_until_ready((g_out, gaoff))

    # ---- S5 backward kernel ------------------------------------------
    def s_bwd(fs, off, cnt, ga, go, fo, i):
        return pb._bwd_call(fs * (1 + 1e-12 * i), off, cnt, ga, go, fo,
                            GX, GY, TILE, CHUNK, False)

    t_bwd = timeit(s_bwd, feat_soa, offsets, counts, gaoff, g_out, fwd_out)
    s_grad = feat_soa.shape[1] + NT * CHUNK
    bwd_bytes = (16 * n_inst * 4 + 16 * s_grad * 4) / 1e9
    rec("bwd_kernel", t_bwd,
        f"S={s_grad}, ~{bwd_bytes*1e3:.0f} MB DMA min, "
        f"{bwd_bytes/(t_bwd*HBM_GBPS)*100:.0f}% HBM peak")

    dfeat = jax.jit(lambda fs, off, cnt, ga, go, fo: pb._bwd_call(
        fs, off, cnt, ga, go, fo, GX, GY, TILE, CHUNK, False))(
        feat_soa, offsets, counts, gaoff, g_out, fwd_out)
    jax.block_until_ready(dfeat)

    # ---- S6 segment reduce -------------------------------------------
    def s_segsort(df, ga, i):
        s_ax = df.shape[1]
        live_ = jax.lax.broadcasted_iota(jnp.int32, (s_ax,), 0) < ga[-1]
        key_ = jnp.where(live_, df[pb.GID_ROW] * (1 + 1e-12 * i), jnp.inf)
        return jax.lax.sort((key_,) + tuple(df[j] for j in range(9)),
                            num_keys=1)

    t_segsort = timeit(s_segsort, dfeat, gaoff)
    rec("segreduce.SORT(key+9payload,S)", t_segsort, f"S={s_grad}")

    def s_segsort_packed(df, ga, i):
        """ALT probe: bf16-pair packing, 9 f32 payloads -> 5 u32 rows (last
        carries one value + zero). Lossy (~2^-8 per element); measures the
        sort-cost headroom payload-width reduction could buy."""
        s_ax = df.shape[1]
        live_ = jax.lax.broadcasted_iota(jnp.int32, (s_ax,), 0) < ga[-1]
        key_ = jnp.where(live_, df[pb.GID_ROW] * (1 + 1e-12 * i), jnp.inf)

        def pack(a, b):
            ab = jax.lax.bitcast_convert_type(
                a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
            bb = jax.lax.bitcast_convert_type(
                b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
            return (ab << 16) | bb

        rows_ = [pack(df[0], df[1]), pack(df[2], df[3]), pack(df[4], df[5]),
                 pack(df[6], df[7]), pack(df[8], jnp.zeros_like(df[8]))]
        return jax.lax.sort((key_,) + tuple(rows_), num_keys=1)

    t = timeit(s_segsort_packed, dfeat, gaoff)
    rec("segreduce.SORT_bf16pack(alt)", t,
        "key + 5 u32 bf16-pair payloads (lossy alt to the 9-f32 row sort)")

    sorted_ = jax.jit(lambda df, ga: s_segsort(df, ga, 0))(dfeat, gaoff)
    jax.block_until_ready(sorted_)

    def s_segsum(st, off, ls, lc, i):
        cols = [pb._cumsum_blocked(c * (1 + 1e-12 * i)) for c in st[1:]]
        csum = jnp.concatenate(
            [jnp.zeros((1, 9), jnp.float32), jnp.stack(cols, axis=1)], axis=0)
        last = ls[N - 1:N] + lc[N - 1:N]
        pos = jnp.minimum(jnp.concatenate([ls, last]), off[-1])
        at_bounds = csum[pos]
        return at_bounds[1:] - at_bounds[:-1]

    t = timeit(s_segsum, tuple(sorted_), offsets, live_start, live_count)
    rec("segreduce.cumsum+boundary", t)

    def s_segsum_kernel(st, off, ls, lc, i):
        from gaussian_splatting_with_eye_tracking_tpu.ops import segsum
        s_ax = st[1].shape[0]
        rows_ = jnp.concatenate(
            [jnp.stack(st[1:], axis=0) * (1 + 1e-12 * i),
             jnp.zeros((7, s_ax), jnp.float32)], axis=0)
        last = ls[N - 1:N] + lc[N - 1:N]
        pos = jnp.minimum(jnp.concatenate([ls, last]), off[-1])
        return segsum.segment_sum_bounds(rows_, pos).T[:, :9]

    t = timeit(s_segsum_kernel, tuple(sorted_), offsets, live_start,
               live_count)
    rec("segreduce.SEGSUM_KERNEL(alt)", t,
        "ops/segsum.py one-pass MXU range-test sums; replaces cumsum row")

    # ---- S7 preprocess backward --------------------------------------
    seg = jax.jit(lambda st, off, ls, lc: s_segsum(st, off, ls, lc, 0))(
        tuple(sorted_), offsets, live_start, live_count)
    jax.block_until_ready(seg)

    def s_prepbwd(m, s, q, o, shc, ct, i):
        def f(m_, s_, q_, o_, sh_):
            pp = preprocess(m_ * (1 + 1e-12 * i), s_, q_, o_, sh_, 3, cam,
                            tile=TILE)
            return (jnp.sum(pp.means2d * ct[:, 0:2])
                    + jnp.sum(pp.conics * ct[:, 2:5])
                    + jnp.sum(pp.rgb * ct[:, 5:8])
                    + jnp.sum(pp.opacities * ct[:, 8]))

        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(m, s, q, o, shc)

    t = timeit(s_prepbwd, means, scales, quats, op, sh, seg)
    rec("preprocess_bwd(vjp)", t)

    # ---- end-to-end cross-check (bench.py protocol) ------------------
    kw = dict(sh_degree=3, max_instances=MAXI, max_live=MAXL,
              max_per_tile=2048, impl="pallas")

    def s_e2e_fwd(m, i):
        out = rast.rasterize(m * (1 + 1e-12 * i), scales, quats, op, sh,
                             cam, bg, **kw)
        return (out.color,)

    t = timeit(s_e2e_fwd, means, iters=4)
    rec("E2E_forward", t)

    def s_e2e(m, i):
        g = jax.grad(lambda mm: jnp.mean(rast.rasterize(
            mm, scales, quats, op, sh, cam, bg, **kw).color ** 2))(
            m * (1 + 1e-12 * i))
        return (g,)

    t_e2e = timeit(s_e2e, means, iters=4)
    rec("E2E_fwd+bwd_step", t_e2e,
        f"{W*H/t_e2e/1e6:.1f} Mpix/s vs 62.2 target")

    if args_cli.json:
        stage_sum = sum(r["ms"] for r in rows
                        if not r["stage"].startswith(("sortmodel", "E2E"))
                        and "(alt)" not in r["stage"])
        doc = {
            "workload": {"W": W, "H": H, "N": N, "tile": TILE,
                         "max_instances": MAXI, "max_live": MAXL,
                         "n_live_instances": n_inst},
            "chip": {"name": "TPU v5e (1 chip)", "hbm_GBps": HBM_GBPS,
                     "bf16_TFLOPs": MXU_BF16_TFLOPS},
            "stages": rows,
            "stage_sum_ms": round(stage_sum, 2),
        }
        with open(args_cli.json, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {args_cli.json}; stage sum {stage_sum:.1f} ms")


if __name__ == "__main__":
    main()
