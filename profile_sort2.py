#!/usr/bin/env python
"""Find why the production grad-reduce sort costs 30ms while a clean
9-payload sort costs 6.7ms: key distribution (inf tail, duplicate gids),
payload rows sliced from a (FEAT,S) array, or the cumsum/take tail."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

S = (1 << 21) + 2040 * 128
N = 300_000

key0 = jax.random.PRNGKey(0)
uniform_keys = jax.random.uniform(key0, (S,), jnp.float32)
# production-like: ~64% duplicate gids in [0, N), 36% +inf
gids = jax.random.randint(jax.random.PRNGKey(1), (S,), 0, N).astype(jnp.float32)
live = jax.random.uniform(jax.random.PRNGKey(2), (S,)) < 0.64
prod_keys = jnp.where(live, gids, jnp.inf)
big = jax.random.normal(jax.random.PRNGKey(3), (12, S), jnp.float32)
pf32 = [jnp.arange(S, dtype=jnp.float32) * (i + 1) for i in range(9)]


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


timeit("uniform key + 9 standalone f32", lambda k, i: jnp.sum(
    jax.lax.sort((k,) + tuple(pf32), num_keys=1)[1][::127]), uniform_keys)

timeit("prod-like key + 9 standalone f32", lambda k, i: jnp.sum(
    jax.lax.sort((k,) + tuple(pf32), num_keys=1)[1][::127]), prod_keys)

timeit("uniform key + 9 rows of (12,S)", lambda k, i: jnp.sum(
    jax.lax.sort((k,) + tuple(big[j] for j in range(9)), num_keys=1)[1][::127]),
    uniform_keys)

timeit("prod-like key + 9 rows of (12,S)", lambda k, i: jnp.sum(
    jax.lax.sort((k,) + tuple(big[j] for j in range(9)), num_keys=1)[1][::127]),
    prod_keys)

# sorted-ish key (gid duplicates, semi-ordered like real tile structure)
semi = jnp.sort(gids) + jax.random.uniform(jax.random.PRNGKey(4), (S,)) * 10.0
timeit("semi-sorted key + 9 rows", lambda k, i: jnp.sum(
    jax.lax.sort((k,) + tuple(big[j] for j in range(9)), num_keys=1)[1][::127]), semi)

# full production reduce replica
def reduce_like(k, i):
    sorted_ = jax.lax.sort((k,) + tuple(big[j] for j in range(9)), num_keys=1)
    rows = jnp.stack(sorted_[1:], axis=0)
    csum = jnp.concatenate([jnp.zeros((9, 1), jnp.float32), jnp.cumsum(rows, axis=1)], axis=1)
    pos = jnp.clip(jnp.arange(N + 1, dtype=jnp.int32) * 7, 0, S)
    at_bounds = jnp.take(csum, pos, axis=1)
    return jnp.sum(jnp.abs(at_bounds[:, 1:] - at_bounds[:, :-1]))

timeit("full reduce replica (sort+cumsum+take)", reduce_like, prod_keys)

# the take alone
csum_fixed = jnp.cumsum(big[:9], axis=1)
def take_only(k, i):
    pos = jnp.clip(jnp.arange(N + 1, dtype=jnp.int32) * 7 + k.astype(jnp.int32) % 2, 0, S - 1)
    at_bounds = jnp.take(csum_fixed, pos, axis=1)
    return jnp.sum(jnp.abs(at_bounds[:, 1:] - at_bounds[:, :-1]))

timeit("boundary take alone (9, N+1)", take_only, uniform_keys)
