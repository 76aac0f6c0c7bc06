"""Timing helper for TPU microbenchmarks over the high-latency axon tunnel.

Protocol: the op is chained REPS times inside one jit by feeding its output
back as input (unrolled — fori_loop-with-sort compiles pathologically
slowly, and the first jit in a process pays ~4 min of backend warmup
regardless). Per-op time = (t_chain - t_single) / (REPS - 1); the ~27 ms
host round-trip cancels in the difference.
"""
from __future__ import annotations

import functools
import time

import numpy as np

import jax


def chain_time(op, x0, reps: int = 9, trials: int = 3, verbose: bool = False):
    """op: x -> y with y matching x's shape/dtype pytree. Returns seconds."""
    f1 = jax.jit(op)
    fr = jax.jit(lambda x: functools.reduce(lambda a, _: op(a), range(reps), x))

    def drain(y):
        leaf = jax.tree_util.tree_leaves(y)[0]
        np.asarray(leaf.ravel()[:1])

    drain(f1(x0))
    drain(fr(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        drain(f1(x0))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        drain(fr(x0))
        tr = time.perf_counter() - t0
        best = min(best, (tr - t1) / (reps - 1))
        if verbose:
            print(f"  t1={t1*1e3:.2f} tr={tr*1e3:.2f}")
    return max(best, 1e-9)
