#!/usr/bin/env python
"""Split-sort probe (STAGES_r05 follow-up): the sort model shows key+<=4
f32 payloads cost ~2.1 ms while key+9/10 payloads cost 8.9-10.1 ms — a
cliff, not a linear payload charge. Two sorts with the SAME key produce
the same permutation (keys unique for the megasort's packed tile|rank;
is_stable=True for the duplicated gauss-id segsort keys), so a wide sort
can be split into two narrow ones that each stay under the cliff.

Measures, at the bench workload sizes:
  megasort: key+10  vs  (key+5) + (key+5)
  segsort:  key+9   vs  stable (key+5) + (key+4)
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

K = 1_638_400
S = 1_702_912


def timeit(fn, *args, iters=8):
    @jax.jit
    def chained(k, *args):
        def body(i, acc):
            out = fn(*args, i)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l[-128:].astype(jnp.float32))
                             for l in leaves)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    _ = float(chained(1, *args))
    t1 = time.perf_counter(); _ = float(chained(1, *args)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); _ = float(chained(1 + iters, *args)); t2 = time.perf_counter() - t2
    return max((t2 - t1) / iters, 1e-9)


def main():
    kk = jax.random.randint(jax.random.PRNGKey(0), (K,), 0, 1 << 30, jnp.int32)
    fk = [jax.random.normal(jax.random.PRNGKey(i + 1), (K,), jnp.float32)
          for i in range(10)]
    ks = jax.random.randint(jax.random.PRNGKey(20), (S,), 0, 300_000, jnp.int32)
    fs = [jax.random.normal(jax.random.PRNGKey(i + 30), (S,), jnp.float32)
          for i in range(9)]

    t = timeit(lambda k_, f_, i: jax.lax.sort(
        (k_ + (i & 1),) + tuple(f_), num_keys=1), kk, fk)
    print(f"megasort key+10 (one sort):      {t*1e3:8.3f} ms", flush=True)

    def split_mega(k_, f_, i):
        a = jax.lax.sort((k_ + (i & 1),) + tuple(f_[:5]), num_keys=1)
        b = jax.lax.sort((k_ + (i & 1),) + tuple(f_[5:]), num_keys=1)
        return a + b[1:]
    t = timeit(split_mega, kk, fk)
    print(f"megasort (key+5)+(key+5) split:  {t*1e3:8.3f} ms", flush=True)

    def split_mega3(k_, f_, i):
        outs = []
        for j in range(0, 10, 4):
            outs += list(jax.lax.sort(
                (k_ + (i & 1),) + tuple(f_[j:j + 4]), num_keys=1)[1:])
        return tuple(outs)
    t = timeit(split_mega3, kk, fk)
    print(f"megasort 3x(key+<=4) split:      {t*1e3:8.3f} ms", flush=True)

    t = timeit(lambda k_, f_, i: jax.lax.sort(
        (k_ + (i & 1),) + tuple(f_), num_keys=1), ks, fs)
    print(f"segsort key+9 (one sort):        {t*1e3:8.3f} ms", flush=True)

    def split_seg(k_, f_, i):
        a = jax.lax.sort((k_ + (i & 1),) + tuple(f_[:5]), num_keys=1,
                         is_stable=True)
        b = jax.lax.sort((k_ + (i & 1),) + tuple(f_[5:]), num_keys=1,
                         is_stable=True)
        return a + b[1:]
    t = timeit(split_seg, ks, fs)
    print(f"segsort stable (key+5)+(key+4):  {t*1e3:8.3f} ms", flush=True)

    # sanity: identical permutation across the two stable sorts
    a = jax.lax.sort((ks, fs[0]), num_keys=1, is_stable=True)
    b = jax.lax.sort((ks, fs[0], fs[1]), num_keys=1, is_stable=True)
    import numpy as np
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1])), \
        "stable sorts disagree on tie order"
    print("stable-permutation sanity OK", flush=True)


if __name__ == "__main__":
    main()
