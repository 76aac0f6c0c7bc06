#!/usr/bin/env python
"""Benchmark pieces + alternatives of the backward grad segment reduction.

Current: sort(gid key, 9 f32 payload rows) at S ~ 2.36M -> 9-row cumsum ->
boundary take. Candidates to beat it measured here.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

S = (1 << 21) + 2040 * 128
N = 300_000
rng = np.random.default_rng(0)
gid = jnp.asarray(np.sort(rng.integers(0, N, S)).astype(np.float32))
gid = jnp.asarray(rng.permutation(np.asarray(gid)))
gid_i = gid.astype(jnp.int32)
rows = jnp.asarray(rng.standard_normal((9, S)).astype(np.float32))
rows_t = rows.T.copy()  # (S, 9)
seg_sorted = jnp.sort(gid_i)


def timeit(name, fn, *args, iters=4):
    @jax.jit
    def chained(k, *a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, k, body, 0.0)

    _ = float(chained(1, *args))
    t1 = time.perf_counter(); float(chained(1, *args)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); float(chained(1 + iters, *args)); t2 = time.perf_counter() - t2
    dt = max((t2 - t1) / iters, 1e-9)
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)


def f_sort10(i, gid, rows):
    out = jax.lax.sort((gid + 1e-12 * i,) + tuple(rows[j] for j in range(9)), num_keys=1)
    return sum(jnp.sum(o[::1000]) for o in out[1:])


def f_sort2(i, gid, _):
    k, v = jax.lax.sort(
        (gid.astype(jnp.int32) + i, jnp.arange(S, dtype=jnp.int32)), num_keys=1
    )
    return jnp.sum(v[::1000].astype(jnp.float32))


def f_cumsum9(i, rows):
    c = jnp.cumsum(rows * (1.0 + 1e-12 * i), axis=1)
    return jnp.sum(c[:, ::1000])


def f_segsum_sorted(i, seg, rows):
    out = jax.ops.segment_sum(
        (rows * (1.0 + 1e-12 * i)).T, seg, num_segments=N, indices_are_sorted=True
    )
    return jnp.sum(out[::100])


def f_segsum_unsorted(i, gid_i, rows):
    out = jax.ops.segment_sum(
        (rows * (1.0 + 1e-12 * i)).T, gid_i, num_segments=N, indices_are_sorted=False
    )
    return jnp.sum(out[::100])


def f_rowgather(i, rows_t):
    idx = (jnp.arange(S, dtype=jnp.int32) * 7 + i) % S
    return jnp.sum(rows_t[idx][::1000])


timeit("sort 1key+9payload f32 (S)", f_sort10, gid, rows)
timeit("sort 2xint32 (S)", f_sort2, gid, rows)
timeit("cumsum (9, S)", f_cumsum9, rows)
timeit("segment_sum sorted (S, 9)", f_segsum_sorted, seg_sorted, rows)
timeit("segment_sum unsorted (S, 9)", f_segsum_unsorted, gid_i, rows)
timeit("row gather (S, 9)", f_rowgather, rows_t)


def f_sort_packed(i, gid, rows):
    # pack 8 f32 payload rows into 4 complex64 + 1 f32 leftover
    pk = [jax.lax.complex(rows[2 * j], rows[2 * j + 1]) for j in range(4)]
    out = jax.lax.sort((gid + 1e-12 * i,) + tuple(pk) + (rows[8],), num_keys=1)
    acc = jnp.sum(out[-1][::1000])
    for o in out[1:5]:
        acc = acc + jnp.sum(jnp.real(o[::1000])) + jnp.sum(jnp.imag(o[::1000]))
    return acc


def f_sort6(i, gid, rows):
    out = jax.lax.sort((gid + 1e-12 * i,) + tuple(rows[j] for j in range(5)), num_keys=1)
    return sum(jnp.sum(o[::1000]) for o in out[1:])


timeit("sort 1key+4complex+1f32 (S)", f_sort_packed, gid, rows)
timeit("sort 1key+5payload f32 (S)", f_sort6, gid, rows)
