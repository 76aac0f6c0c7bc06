#!/usr/bin/env python
"""Compare MXU strategies for the blend kernels' (P,C)@(C,C) prefix-scan
matmul: HIGHEST (6-pass f32), DEFAULT (1-pass bf16), and a manual 2-pass
hi/lo bf16 split (exact 0/1 triangular RHS). Measures a Pallas kernel that
mimics the fwd blend inner loop's MXU traffic, plus accuracy vs f64."""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, C, STEPS = 1024, 128, 256


def make_kernel(mode):
    def kern(x_ref, o_ref):
        ii = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
        m = (ii < jj).astype(jnp.float32)
        m_bf = m.astype(jnp.bfloat16)

        def body(i, acc):
            a = x_ref[...] * (1.0 + 1e-6 * i)
            if mode == "highest":
                s = jax.lax.dot_general(
                    a, m, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            elif mode == "default":
                s = jax.lax.dot_general(
                    a.astype(jnp.bfloat16), m_bf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:  # split2
                hi = a.astype(jnp.bfloat16)
                lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    hi, m_bf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = s + jax.lax.dot_general(
                    lo, m_bf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return acc + s

        o_ref[...] = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((P, C), jnp.float32))

    return kern


def run(mode, x):
    f = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(f)
    r = jax.block_until_ready(jf(x))
    t = time.perf_counter()
    for _ in range(8):
        r = jf(x)
    r = jax.block_until_ready(r)
    dt = (time.perf_counter() - t) / 8
    flops = 2 * P * C * C * STEPS
    print(f"{mode:10s} {dt*1e3:8.3f} ms  {flops/dt/1e12:6.2f} TFLOP/s(eff)", flush=True)
    return np.asarray(r)


key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (P, C), jnp.float32, -4.6, 0.0)

# accuracy reference in float64 on host
xn = np.asarray(x, np.float64)
m = (np.arange(C)[:, None] < np.arange(C)[None, :]).astype(np.float64)
ref = np.zeros((P, C))
for i in range(STEPS):
    ref += (xn * (1.0 + 1e-6 * i)) @ m

for mode in ("highest", "default", "split2"):
    r = run(mode, x)
    err = np.abs(r - ref) / np.maximum(np.abs(ref), 1e-3)
    print(f"           rel err max={err.max():.3e} mean={err.mean():.3e}", flush=True)
