#!/usr/bin/env python
"""Grad-reduce redesign candidates vs production (sort of key + 9 f32 payload
rows costs ~30 ms at S=2.1M; a bitonic sort's cost scales with total payload
bytes, so sorting ONE int32 payload and moving the 9 grad rows with a single
row gather should cut most of it).

A. production: lax.sort(key + 9 rows) -> lane cumsum -> boundary take
B. lax.sort(key, iota) -> transpose dfeat (FEAT,S)->(S,FEAT) -> row gather ->
   cumsum over sublanes -> boundary row take
C. like B but cumsum-free: scatter-free segment sum via sorted-order
   boundary gather of the cumsum along axis 0 (same math, kept separate to
   see the cumsum's share)
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

S = (1 << 21) + 2040 * 128
N = 300_000

gids = jax.random.randint(jax.random.PRNGKey(1), (S,), 0, N).astype(jnp.float32)
live = jax.random.uniform(jax.random.PRNGKey(2), (S,)) < 0.64
key_prod = jnp.where(live, gids, jnp.inf)
dfeat = jax.random.normal(jax.random.PRNGKey(3), (16, S), jnp.float32)
dfeat = dfeat.at[9].set(key_prod)
# per-gaussian boundary positions (like gauss_start), N+1 monotone
bounds = jnp.sort(jax.random.randint(jax.random.PRNGKey(4), (N + 1,), 0, S))


def timeit(name, fn, x, iters=3):
    @jax.jit
    def chained(k, x):
        def body(i, acc):
            return acc + fn(x + 1e-9 * i, i)
        return jax.lax.fori_loop(0, k, body, 0.0)

    _ = float(chained(1, x))
    t1 = time.perf_counter(); _ = float(chained(1, x)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, x)); t2 = time.perf_counter() - t2
    dt = max((t2 - t1) / iters, 1e-9)
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def reduce_prod(df, i):
    key = df[9]
    sorted_ = jax.lax.sort((key,) + tuple(df[j] for j in range(9)), num_keys=1)
    rows = jnp.stack(sorted_[1:], axis=0)
    csum = jnp.concatenate(
        [jnp.zeros((9, 1), jnp.float32), jnp.cumsum(rows, axis=1)], axis=1
    )
    at_bounds = jnp.take(csum, bounds, axis=1)
    return jnp.sum(jnp.abs(at_bounds[:, 1:] - at_bounds[:, :-1]))


def reduce_rowgather(df, i):
    key = df[9]
    _, perm = jax.lax.sort((key, jnp.arange(S, dtype=jnp.int32)), num_keys=1)
    dT = df[:9].T  # (S, 9)
    rows = dT[perm]  # (S, 9) row gather in sorted order
    csum = jnp.concatenate(
        [jnp.zeros((1, 9), jnp.float32), jnp.cumsum(rows, axis=0)], axis=0
    )
    at_bounds = csum[bounds]  # (N+1, 9) row gather
    return jnp.sum(jnp.abs(at_bounds[1:] - at_bounds[:-1]))


def reduce_rowgather_lanecumsum(df, i):
    # row gather in sorted order, then transpose BACK and do the lane cumsum
    # (isolates gather vs cumsum-axis effects)
    key = df[9]
    _, perm = jax.lax.sort((key, jnp.arange(S, dtype=jnp.int32)), num_keys=1)
    dT = df[:9].T  # (S, 9)
    rows = dT[perm].T  # (9, S)
    csum = jnp.concatenate(
        [jnp.zeros((9, 1), jnp.float32), jnp.cumsum(rows, axis=1)], axis=1
    )
    at_bounds = jnp.take(csum, bounds, axis=1)
    return jnp.sum(jnp.abs(at_bounds[:, 1:] - at_bounds[:, :-1]))


def sort2_only(df, i):
    key = df[9]
    _, perm = jax.lax.sort((key, jnp.arange(S, dtype=jnp.int32)), num_keys=1)
    return jnp.sum(perm[::1023].astype(jnp.float32))


def transpose_gather_only(df, i):
    perm = (jnp.arange(S, dtype=jnp.int32) * 2654435761) % S
    dT = df[:9].T
    return jnp.sum(dT[perm][::511])


timeit("A  production 10-array sort reduce", reduce_prod, dfeat)
timeit("B  sort2 + row gather + sub cumsum", reduce_rowgather, dfeat)
timeit("B2 sort2 + row gather + lane cumsum", reduce_rowgather_lanecumsum, dfeat)
timeit("   sort2 alone", sort2_only, dfeat)
timeit("   transpose+row-gather alone", transpose_gather_only, dfeat)
