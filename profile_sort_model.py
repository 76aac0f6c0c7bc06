#!/usr/bin/env python
"""Honest sort cost model at the bench workload sizes (loop-variant keys —
the earlier probe's `k + (i-i)` perturbation constant-folded to zero and
XLA hoisted the whole sort out of the timing loop)."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

K = (1 << 20) + (1 << 19) + (1 << 16)  # 1.64M (instance-build sort)
S = K + 2040 * 128                     # 1.70M (backward segment-reduce sort)


def timeit(fn, *args, iters=8):
    @jax.jit
    def chained(k, *args):
        def body(i, acc):
            out = fn(*args, i)
            return acc + sum(jnp.sum(o[::4097].astype(jnp.float32)) for o in out)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    _ = float(chained(1, *args))
    t1 = time.perf_counter(); _ = float(chained(1, *args)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, *args)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


def main():
    key0 = jax.random.PRNGKey(0)
    ikeys = jax.random.randint(key0, (K,), 0, 1 << 30, jnp.int32)
    fkeys = jax.random.uniform(jax.random.PRNGKey(1), (S,), jnp.float32)
    pf32_k = [jax.random.uniform(jax.random.PRNGKey(10 + i), (K,), jnp.float32)
              for i in range(10)]
    pf32_s = [jax.random.uniform(jax.random.PRNGKey(30 + i), (S,), jnp.float32)
              for i in range(9)]

    for npay in (0, 1, 2, 4, 10):
        t = timeit(
            lambda k_, f_, i, npay=npay: jax.lax.sort(
                (k_ + (i & 1),) + tuple(f_[:npay]), num_keys=1),
            ikeys, tuple(pf32_k))
        print(f"int32 key + {npay:2d} f32 payloads @K={K}: {t*1e3:8.3f} ms",
              flush=True)

    for npay in (0, 9):
        t = timeit(
            lambda k_, f_, i, npay=npay: jax.lax.sort(
                (k_ + 1e-7 * (i & 1),) + tuple(f_[:npay]), num_keys=1),
            fkeys, tuple(pf32_s))
        print(f"f32   key + {npay:2d} f32 payloads @S={S}: {t*1e3:8.3f} ms",
              flush=True)

    # ascending-int key (the instance build's actual key distribution is
    # near-uniform over tiles; also check a pre-sorted input)
    asc = jnp.arange(K, dtype=jnp.int32)
    t = timeit(lambda k_, f_, i: jax.lax.sort(
        (k_ + (i & 1),) + tuple(f_[:10]), num_keys=1), asc, tuple(pf32_k))
    print(f"PRE-SORTED int32 key + 10 payloads @K={K}: {t*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
