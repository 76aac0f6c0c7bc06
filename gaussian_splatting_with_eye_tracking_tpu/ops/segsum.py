"""Pallas contiguous-segment row sums: out[:, g] = sum over columns
[bounds[g], bounds[g+1]) of a (R, S) table.

TPU-native replacement for the cumsum + boundary-row-gather stage of the
per-gaussian gradient reduction (the CUDA reference accumulates the same
sums with atomicAdd, backward.cu:523-554; here the id-sorted grad columns
form one contiguous segment per gaussian — ops/pallas_blend.
_segment_reduce_grads). The blocked-matmul cumsum it replaces costs ~3.3 ms
at S~1.7M (9 columns) plus an (N+1)-row boundary gather; this kernel reads
the table ONCE (~0.3 ms of HBM) and reduces each block of 128 gaussians
with range-test one-hot matmuls on the MXU — the same in-kernel one-hot
construction as ops/expand.expand_rows_by_segments, contracted instead of
selected. Accuracy: each product is exact (0/1 one-hot in bf16, 3-limb
Dekker-split values), accumulation is f32 — strictly better than the
cumsum's difference-of-prefixes (no catastrophic cancellation on long
prefixes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 512  # window-start lane alignment (and the inner DMA chunk width)


def _segsum_kernel(w0_ref, nchunks_ref, starts_ref, ends_ref, table_hbm,
                   out_ref, tbuf, sem, *, g_blk: int, wc: int, rows: int):
    b = pl.program_id(0)
    w0 = w0_ref[b]
    n_chunks = nchunks_ref[b]

    def dma(slot, ci):
        c0 = pl.multiple_of(w0 + ci * wc, _ALIGN)
        return pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(c0, wc)], tbuf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    starts = starts_ref[0:1, :]  # (1, G) f32 exact-int segment starts
    ends = ends_ref[0:1, :]  # (1, G)

    def body(carry):
        ci, acc = carry

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma((ci + 1) % 2, ci + 1).start()

        dma(ci % 2, ci).wait()
        tbl = tbuf[ci % 2]  # (rows, wc) f32

        # global column ids of this window chunk, on sublanes
        k = (jax.lax.broadcasted_iota(jnp.int32, (wc, 1), 0)
             + (w0 + ci * wc)).astype(jnp.float32)  # (wc, 1)
        q = ((starts <= k) & (k < ends)).astype(jnp.bfloat16)  # (wc, G)

        hi = tbl.astype(jnp.bfloat16)
        r1 = tbl - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))  # (rows, wc) @ (wc, G)
        kw = dict(preferred_element_type=jnp.float32)
        acc = (acc
               + jax.lax.dot_general(hi, q, dn, **kw)
               + jax.lax.dot_general(mid, q, dn, **kw)
               + jax.lax.dot_general(lo, q, dn, **kw))
        return ci + 1, acc

    _, acc = jax.lax.while_loop(
        lambda c: c[0] < n_chunks, body,
        (jnp.int32(0), jnp.zeros((rows, g_blk), jnp.float32)))
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("g_blk", "interpret"))
def segment_sum_bounds(table, bounds, g_blk: int = 128,
                       interpret: bool = False):
    """out (R, N) f32 with out[:, g] = table[:, bounds[g]:bounds[g+1]].sum(1).

    table (R, S) f32 (R a multiple of 8; pad rows with zeros); bounds
    (N+1,) int32 NONDECREASING in [0, S]. N is padded internally to a
    multiple of ``g_blk``.
    """
    rows, s = table.shape
    n = bounds.shape[0] - 1
    if interpret or s == 0:
        csum = jnp.concatenate(
            [jnp.zeros((rows, 1), jnp.float64 if interpret else jnp.float32),
             jnp.cumsum(table.astype(jnp.float64), axis=1)], axis=1)
        at_b = csum[:, jnp.clip(bounds, 0, s)]
        return (at_b[:, 1:] - at_b[:, :-1]).astype(table.dtype)

    npad = -(-n // g_blk) * g_blk
    bpad = jnp.pad(bounds, (0, npad + 1 - bounds.shape[0]),
                   constant_values=bounds[-1] if n >= 0 else 0)
    starts = bpad[:-1].astype(jnp.float32).reshape(1, npad)
    ends = bpad[1:].astype(jnp.float32).reshape(1, npad)

    nb = npad // g_blk
    wc = _ALIGN
    # per-block window: [align_down(bounds[b*G]), bounds[(b+1)*G])
    first = bpad[: npad: g_blk]
    last = bpad[g_blk:: g_blk]
    w0 = (first // wc) * wc
    nchunks = jnp.maximum(-(-(last - w0) // wc), 0).astype(jnp.int32)
    # pad table columns so the final window's fixed-width DMA stays in bounds
    table_p = jnp.concatenate(
        [table, jnp.zeros((rows, wc + _ALIGN), table.dtype)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, g_blk), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_blk), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((rows, g_blk), lambda b, *_: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, wc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, g_blk=g_blk, wc=wc, rows=rows),
        out_shape=jax.ShapeDtypeStruct((rows, npad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(w0.astype(jnp.int32), nchunks, starts, ends, table_p)
    return out[:, :n]
