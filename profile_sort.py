#!/usr/bin/env python
"""Sort cost model on TPU: payload count x dtype at the grad-reduce size."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

S = (1 << 21) + 2040 * 128

key0 = jax.random.PRNGKey(0)
keys = jax.random.uniform(key0, (S,), jnp.float32)
pf32 = [jnp.arange(S, dtype=jnp.float32) * (i + 1) for i in range(9)]
pbf16 = [p.astype(jnp.bfloat16) for p in pf32]
pi32 = [jnp.arange(S, dtype=jnp.int32) * (i + 1) for i in range(9)]


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
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return dt


for n in (1, 3, 5, 9):
    timeit(f"sort key + {n} f32", lambda k, i, n=n: jnp.sum(
        jax.lax.sort((k,) + tuple(pf32[:n]), num_keys=1)[1][::127]), keys)

for n in (5, 9):
    timeit(f"sort key + {n} bf16", lambda k, i, n=n: jnp.sum(
        jax.lax.sort((k,) + tuple(pbf16[:n]), num_keys=1)[1][::127].astype(jnp.float32)), keys)

timeit("sort ikey + 9 i32", lambda k, i: jnp.sum(
    jax.lax.sort(((keys + k * 0).astype(jnp.int32) + jnp.arange(S, dtype=jnp.int32) % 97,)
                 + tuple(pi32), num_keys=1)[1][::127].astype(jnp.float32)), keys)
