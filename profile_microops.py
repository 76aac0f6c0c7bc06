#!/usr/bin/env python
"""Microbenchmarks of the non-kernel hot ops at 1080p scale, to guide the
round-2 pipeline redesign: row-gather width scaling, sort payload scaling,
permutation inversion (scatter vs sort), lane- vs sublane-axis gathers for
the gradient segment reduction, and long cumsums.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

N = 300_000  # gaussians
K = 1_441_792  # live instances (bench max_live)
S = K + 2040 * 128  # grad columns incl. per-tile alignment pad


def timeit(fn, *args, iters=8):
    @jax.jit
    def chained(k, *a):
        def body(i, acc):
            r = fn(*jax.tree.map(lambda x: x, a))
            # loop-variant perturbation via acc to defeat hoisting
            r = jax.tree.map(lambda x: x + (acc * 0).astype(x.dtype), r)
            leaves = jax.tree.leaves(r)
            return acc + sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves)

        def outer(i, acc):
            return body(i, acc)

        return jax.lax.fori_loop(0, k, outer, 0.0)

    _ = float(chained(1, *args))
    t1 = time.perf_counter(); _ = float(chained(1, *args)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, *args)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    table16 = jax.random.normal(k1, (N, 16), jnp.float32)
    idx = jax.random.randint(k2, (K,), 0, N, jnp.int32)
    perm = jax.random.permutation(k3, jnp.arange(K, dtype=jnp.int32))
    rows9 = jax.random.normal(k1, (9, S), jnp.float32)
    rows9_t = rows9.T
    gidx = jax.random.randint(k2, (K,), 0, S, jnp.int32)

    print(f"N={N} K={K} S={S}", flush=True)

    for c in (4, 8, 10, 16):
        t = timeit(lambda tb, ix: tb[:, :c][ix], table16, idx)
        print(f"row gather (K,{c:2d}) f32      {t*1e3:8.2f} ms", flush=True)

    t = timeit(lambda tb, ix: tb[:, :8].astype(jnp.bfloat16)[ix], table16, idx)
    print(f"row gather (K, 8) bf16      {t*1e3:8.2f} ms", flush=True)

    keys = jax.random.randint(k1, (1 << 21,), 0, 1 << 30, jnp.int32)
    p1 = jnp.arange(1 << 21, dtype=jnp.int32)
    for npay in (1, 2, 3):
        pays = tuple(p1 + i for i in range(npay))
        t = timeit(lambda kk, *pp: jax.lax.sort((kk,) + pp, num_keys=1), keys, *pays)
        print(f"sort 2M key+{npay} payloads    {t*1e3:8.2f} ms", flush=True)

    # permutation inversion: scatter-set vs argsort
    t = timeit(
        lambda p: jnp.zeros(K, jnp.int32).at[p].set(jnp.arange(K, dtype=jnp.int32)),
        perm,
    )
    print(f"invert perm scatter (K)     {t*1e3:8.2f} ms", flush=True)
    t = timeit(lambda p: jax.lax.sort((p, jnp.arange(K, dtype=jnp.int32)), num_keys=1)[1], perm)
    print(f"invert perm sort (K)        {t*1e3:8.2f} ms", flush=True)

    # gradient segment-reduce building blocks
    t = timeit(lambda r, ix: jnp.take(r, ix, axis=1), rows9, gidx)
    print(f"col gather (9,S)[:,Kidx]    {t*1e3:8.2f} ms", flush=True)
    t = timeit(lambda r, ix: r[ix], rows9_t, gidx)
    print(f"row gather (S,9)[Kidx]      {t*1e3:8.2f} ms", flush=True)
    t = timeit(lambda r: jnp.cumsum(r, axis=1), rows9)
    print(f"cumsum (9,S) lanes          {t*1e3:8.2f} ms", flush=True)
    t = timeit(lambda r: jnp.cumsum(r, axis=0), rows9_t)
    print(f"cumsum (S,9) sublanes       {t*1e3:8.2f} ms", flush=True)

    # current reference point: the 10-array sort the backward runs today
    pays9 = tuple(rows9[j] for j in range(9))
    keyf = rows9[0]
    t = timeit(lambda kk, *pp: jax.lax.sort((kk,) + pp, num_keys=1), keyf, *pays9)
    print(f"sort S f32 key+9 payloads   {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
