#!/usr/bin/env python
"""Microbench the XLA glue ops around the blend kernels at production sizes.

Sizes mirror the 1080p bench workload (K live instances, S grad slots,
N gaussians). See profile_util.chain_time for the timing protocol.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from profile_util import chain_time

K = 1 << 21  # ~2.1M instances
S = K + (1 << 18)  # grad slots
N = 300_000
FEAT = 16


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    keys32 = jax.random.randint(k1, (K,), 0, 1 << 30, dtype=jnp.int32)
    keysS = jax.random.randint(k1, (S,), 0, N, dtype=jnp.int32)
    perm = jax.random.permutation(k3, jnp.arange(K, dtype=jnp.int32))
    rows_f = jax.random.normal(k1, (S, FEAT), jnp.float32)
    rows9 = jax.random.normal(k2, (9, S), jnp.float32)
    idx = jax.random.randint(k3, (K,), 0, S, dtype=jnp.int32)
    iota = jnp.arange(K, dtype=jnp.int32)
    gstart = jnp.sort(jax.random.randint(k1, (N,), 0, K, dtype=jnp.int32))
    payload = jax.random.randint(k2, (K,), 0, N, dtype=jnp.int32)
    f9 = tuple(rows9[j] for j in range(9))

    cases = {}
    cases["sort key-only int32 (K)"] = (
        lambda k: jax.lax.sort((k,), num_keys=1)[0] ^ 1, keys32)
    cases["sort key+1 payload (K)"] = (
        lambda k: jax.lax.sort((k, payload), num_keys=1)[0] ^ 1, keys32)
    cases["sort key+2 payloads (K)"] = (
        lambda k: jax.lax.sort((k, payload, perm), num_keys=1)[0] ^ 1, keys32)
    cases["sort i32key+9 f32 payloads (S)"] = (
        lambda k: jax.lax.sort((k,) + f9, num_keys=1)[0] ^ 1, keysS)
    cases["inverse perm via scatter (K)"] = (
        lambda p: jnp.zeros(K, jnp.int32).at[p].set(
            iota, unique_indices=True, mode="drop") ^ 1, perm)
    cases["row gather (K,16)f from (S,16)"] = (
        lambda i: (rows_f[jnp.clip(i, 0, S - 1)][:, 0] + i).astype(jnp.int32),
        idx)
    cases["1D gather (K,) from (K,) i32"] = (
        lambda i: payload[jnp.clip(i, 0, K - 1)] ^ 1, perm)
    cases["cumsum (K,16) ax0 -> col0"] = (
        lambda r: jnp.cumsum(rows_f[:K] + r[:, None], axis=0)[:, 0],
        jnp.zeros((K,), jnp.float32))
    cases["cumsum (9,S) ax1 -> row0"] = (
        lambda r: jnp.cumsum(rows9 + r[None, :], axis=1)[0],
        jnp.zeros((S,), jnp.float32))

    def reduce_sort(kk):
        srt = jax.lax.sort((kk,) + f9, num_keys=1)
        rows = jnp.stack(srt[1:], axis=0)
        csum = jnp.concatenate(
            [jnp.zeros((9, 1), jnp.float32), jnp.cumsum(rows, axis=1)], axis=1)
        at = jnp.take(csum, gstart, axis=1)  # (9, N)
        return jnp.zeros(S, jnp.int32).at[:N].set(at[0].astype(jnp.int32)) ^ kk

    cases["FULL reduce: 9-payload sort+cumsum"] = (reduce_sort, keysS)

    def reduce_perm(i):
        g = rows_f[jnp.clip(i, 0, S - 1)]  # (K,16) row gather
        csum = jnp.concatenate(
            [jnp.zeros((1, FEAT), jnp.float32), jnp.cumsum(g, axis=0)], axis=0)
        return jnp.zeros(K, jnp.int32).at[:N].set(
            csum[gstart][:, 0].astype(jnp.int32)) ^ i

    cases["FULL reduce: row-gather+cumsum(K,16)"] = (reduce_perm, idx)

    for name, (fn, x0) in cases.items():
        try:
            dt = chain_time(fn, x0)
            print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:40s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
