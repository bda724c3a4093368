"""Pallas TPU kernel: systematic-resampling run-length decode.

This is the planned native kernel #2 from SURVEY.md §2 ("systematic/stratified
resampling as a single-pass prefix-sum + binary-search kernel").  Profiling showed
that on TPU the decode step — turning per-particle offspring extents into the
ancestor-index vector — dominates resampling cost in XLA (scan-``searchsorted``
~139 ms, scatter+cummax ~15 ms per 1M-particle step).  This kernel streams the
extents once and produces each output block with dense VPU compares:

Given ``f[j] = ceil(n·cdf_j − u)`` (nondecreasing, in ``[0, n]`` — the number of
systematic positions below ``cdf_j``), the ancestors satisfy

    anc[k] = #{j : f_j ≤ k}.

The kernel walks a (sequential) grid over output blocks of size ``W`` keeping two
SMEM carries: ``jbase`` (ancestors consumed so far) and the current input chunk
pointer.  For each block it accumulates a block histogram with ``C×W`` vectorised
comparisons per input chunk — a staircase merge whose total work is
``O(N·(C + W) / lanes)`` with no scatter, no sort, and no per-lane gather.

The full extents array lives in VMEM (4 MB at 1M particles), so this kernel
supports ``n ≤ ~3M``; the engine falls back to the XLA scatter formulation above
that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_ancestors", "systematic_pallas"]

# Block sizes: W output slots per grid step, C extents per inner chunk.
# 1-D int32 arrays tile at 1024 on TPU (8x128); keep both block sizes aligned.
_W = 1024
_C = 1024


def _decode_kernel(f_ref, out_ref, carry_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry_ref[0] = 0  # jbase: #extents consumed by earlier blocks
        carry_ref[1] = 0  # chunk pointer (units of C)

    base = b * _W
    jbase = carry_ref[0]
    ptr0 = carry_ref[1]
    num_chunks = f_ref.shape[0] // _C

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (_C, _W), 1)

    def cond(c):
        _, _, stop = c
        return jnp.logical_not(stop)

    def body(c):
        ptr, h, _ = c
        chunk = f_ref[pl.ds(pl.multiple_of(ptr * _C, _C), _C)]
        # Broadcast as int32 before comparing: Mosaic only supports minor-dim
        # insertion for 32-bit types (no 1-bit broadcasts).
        chunk2 = chunk[:, None] + jnp.zeros((_C, _W), jnp.int32)
        valid = chunk2 >= base  # entries already consumed by earlier blocks
        contrib = valid & (chunk2 <= base + iota_w)
        h = h + jnp.sum(contrib.astype(jnp.int32), axis=0)
        last = chunk[_C - 1]
        stop = (last > base + _W - 1) | (ptr + 1 >= num_chunks)
        ptr = jnp.where(stop, ptr, ptr + 1)
        return ptr, h, stop

    ptr, h, _ = jax.lax.while_loop(
        cond, body, (ptr0, jnp.zeros((_W,), jnp.int32), jnp.asarray(False))
    )

    out_ref[:] = jbase + h
    carry_ref[0] = jbase + h[_W - 1]
    carry_ref[1] = ptr


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def decode_ancestors(f: jax.Array, n: int, interpret: bool = False) -> jax.Array:
    """``anc[k] = #{j: f_j ≤ k}`` for nondecreasing int32 ``f`` (length ``n``)."""
    n_pad = -(-n // _W) * _W  # output padded to a whole number of blocks
    pad = (-f.shape[0]) % _C
    # Sentinel 2·n_pad: larger than any block end, never counted, stops the walk.
    f_padded = jnp.concatenate(
        [f.astype(jnp.int32), jnp.full((pad,), 2 * n_pad, jnp.int32)]
    )
    anc = pl.pallas_call(
        _decode_kernel,
        grid=(n_pad // _W,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_W,), lambda b: (b,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(f_padded)
    return anc[:n]


def systematic_pallas(u, weights, n: int, interpret: bool = False) -> jax.Array:
    """Systematic resampling ancestors via the Pallas decode kernel."""
    cdf = jnp.cumsum(weights)
    f = jnp.clip(jnp.ceil(n * cdf - u), 0, n).astype(jnp.int32)
    anc = decode_ancestors(f, n, interpret=interpret)
    return jnp.clip(anc, 0, weights.shape[0] - 1)
