#!/usr/bin/env python
"""Micro-benchmarks for the per-gaussian gradient reduction strategies at
K=2M instances: row-gather layouts, sort-with-payload, cumsum layouts."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

S = 2_400_000
K = 2_097_152
N = 300_000

rng = np.random.default_rng(0)
perm = rng.permutation(S)[:K].astype(np.int32)
inv_slot = jnp.asarray(perm)
rows16 = jnp.asarray(rng.standard_normal((S, 16)), jnp.float32)
rows9 = rows16[:, :9] + 0.0
cols9 = rows16.T[:9] + 0.0  # (9, S)
flat = rows16[:, 0] + 0.0  # (S,)
gid_sorted = jnp.sort(jnp.asarray(rng.integers(0, N, K), jnp.int32))
gid_rand = jnp.asarray(rng.integers(0, N, K), jnp.int32)
(inv_slot, rows16, rows9, cols9, flat, gid_sorted, gid_rand) = jax.block_until_ready(
    (inv_slot, rows16, rows9, cols9, flat, gid_sorted, gid_rand)
)


def timeit(name, fn, x, iters=4):
    @jax.jit
    def chained(k, x):
        def body(i, acc):
            return acc + fn(x * (1.0 + 1e-12 * i), i)

        return jax.lax.fori_loop(0, k, body, 0.0)

    try:
        _ = float(chained(1, x))
        t1 = time.perf_counter(); _ = float(chained(1, x)); t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); _ = float(chained(1 + iters, x)); t2 = time.perf_counter() - t2
        dt = max((t2 - t1) / iters, 1e-9)
        print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAILED {type(e).__name__}: {e}", flush=True)


timeit("take rows (S,9) 2M idx",
       lambda r, i: jnp.sum(jnp.abs(jnp.take(r, inv_slot, axis=0, mode="fill",
                                             fill_value=0.0))), rows9)
timeit("take rows (S,16) 2M idx",
       lambda r, i: jnp.sum(jnp.abs(jnp.take(r, inv_slot, axis=0, mode="fill",
                                             fill_value=0.0))), rows16)
timeit("take 1-D (S,) 2M idx x1",
       lambda r, i: jnp.sum(jnp.abs(jnp.take(r, inv_slot, mode="fill",
                                             fill_value=0.0))), flat)
timeit("take lanes (9,S) 2M idx",
       lambda r, i: jnp.sum(jnp.abs(jnp.take(r, inv_slot, axis=1, mode="fill",
                                             fill_value=0.0))), cols9)
timeit("sort key + 9xf32 payload",
       lambda r, i: jnp.sum(jax.lax.sort(
           (gid_rand,) + tuple(r[:K, j] for j in range(9)), num_keys=1
       )[3]), rows9)
timeit("segment_sum unsorted (K,9)",
       lambda r, i: jnp.sum(jax.ops.segment_sum(r[:K], gid_rand, N)), rows9)
timeit("segment_sum sorted-ids (K,9)",
       lambda r, i: jnp.sum(jax.ops.segment_sum(
           r[:K], gid_sorted, N, indices_are_sorted=True)), rows9)
timeit("cumsum (S,9) axis0",
       lambda r, i: jnp.sum(jnp.cumsum(r, axis=0)[-1]), rows9)
timeit("cumsum (9,S) axis1",
       lambda r, i: jnp.sum(jnp.cumsum(r, axis=1)[:, -1]), cols9)
timeit("transpose (9,S)->(S,9)",
       lambda r, i: jnp.sum(jnp.abs(r.T)), cols9)
timeit("boundary gather csum[pos] (N)",
       lambda r, i: jnp.sum(jnp.abs(r[jnp.asarray(
           np.sort(rng.integers(0, S, N + 1).astype(np.int32)))])), rows9)
