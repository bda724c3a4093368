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
import os

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "decode_ancestors",
    "systematic_pallas",
    "extents_from_logw",
    "resample_move",
    "resample_move_f",
    "resample_move_window",
    "resample_move_window_fext",
    "move_eligible",
]

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


# ---------------------------------------------------------------------------
# Extents prefix-scan: logw -> systematic-resampling extents in one pass
# ---------------------------------------------------------------------------
#
# The decode kernels below consume ``f_j = clip(ceil(n·cdf_j − u), 0, n)`` with
# ``cdf = cumsum(exp(logw − m)) / s1``.  XLA's 1M-element ``cumsum`` on TPU is
# a multi-pass log-depth decomposition (~1.5 ms per firing — nearly half the
# cost of the decode kernel itself); this kernel streams ``logw`` once and
# emits ``f`` directly: exp, block prefix-sum (log-step lane/sublane shifts),
# normalise, ceil — one 4 MB read + one 4 MB write.
#
# Precision: the block-internal prefix is log-step (pairwise-error class, like
# XLA's); the cross-block running sum is Kahan-compensated in SMEM, so the
# accumulated cdf error stays O(eps·log N) — occasional ±1 extent flips versus
# the XLA formula at exact stratum boundaries are expected and statistically
# immaterial (they shift one offspring between adjacent particles).

_EX_SUB = 128  # sublane rows per block tile
_EX_BLK = _EX_SUB * 128  # elements per grid step (grid-launch overhead bound)


def _make_extents_kernel(nr: int):
    def kernel(scal_ref, logw_ref, f_ref, carry_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = 0.0  # running sum of exp(logw - m)
            carry_ref[1] = 0.0  # Kahan compensation

        m = scal_ref[0]
        inv_s1 = scal_ref[1]
        u = scal_ref[2]

        e = jnp.exp(logw_ref[:].reshape(_EX_SUB, 128) - m)

        lane = jax.lax.broadcasted_iota(jnp.int32, (_EX_SUB, 128), 1)
        subl = jax.lax.broadcasted_iota(jnp.int32, (_EX_SUB, 1), 0)
        # Inclusive prefix along lanes (row-local), then carry row totals
        # down the sublanes: standard log-step scan, 7 + 7 masked shifts.
        p = e
        for k in (1, 2, 4, 8, 16, 32, 64):
            p = p + jnp.where(lane >= k, pltpu.roll(p, shift=k, axis=1), 0.0)
        row_tot = jax.lax.slice(p, (0, 127), (_EX_SUB, 128))  # (_EX_SUB, 1)
        rp = row_tot
        for k in (1, 2, 4, 8, 16, 32, 64):
            rp = rp + jnp.where(subl >= k, pltpu.roll(rp, shift=k, axis=0), 0.0)
        row_excl = jnp.where(subl == 0, 0.0, pltpu.roll(rp, shift=1, axis=0))
        prefix = p + row_excl  # inclusive over the whole block

        base = carry_ref[0]
        cdf = (base + prefix) * inv_s1
        f = jnp.clip(jnp.ceil(nr * cdf - u), 0.0, float(nr)).astype(jnp.int32)
        f_ref[:] = f.reshape(_EX_BLK)

        # Kahan-compensated running sum across blocks.
        total = rp[_EX_SUB - 1, 0]
        comp = carry_ref[1]
        y = total - comp
        t_new = base + y
        carry_ref[1] = (t_new - base) - y
        carry_ref[0] = t_new

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def extents_from_logw(logw, m, s1, u, n: int, interpret: bool = False):
    """Systematic-resampling extents straight from unnormalised log-weights.

    ``m`` = max(logw), ``s1`` = Σ exp(logw − m) (the engine's per-step fused
    reduction family already produces both); ``u`` the stratum offset; ``n``
    the number of positions drawn.  Returns nondecreasing int32 ``f`` with the
    same contract as ``clip(ceil(n·cumsum(exp(logw−m))/s1 − u), 0, n)`` up to
    cross-block summation-order ulps (±1 extent flips at exact boundaries).
    """
    mm = logw.shape[0]
    pad = (-mm) % _EX_BLK
    if pad:
        # -inf pads contribute exp = 0 to every prefix.
        logw = jnp.concatenate([logw, jnp.full((pad,), -jnp.inf, logw.dtype)])
    scal = jnp.stack(
        [m, 1.0 / s1, u]
    ).astype(jnp.float32)
    f = pl.pallas_call(
        _make_extents_kernel(n),
        grid=(logw.shape[0] // _EX_BLK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_EX_BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_EX_BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((logw.shape[0],), jnp.int32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(scal, logw)
    return f[:mm]


# ---------------------------------------------------------------------------
# Fused resample + state move
# ---------------------------------------------------------------------------
#
# Profiling on v5e showed the ancestor *gather* — ``state[anc]`` after decoding —
# costs ~8 ms per 1M-particle step in XLA (per-index overhead ≈ 8 ns, scalar
# rate), and the scatter formulation costs about the same.  The decode kernel
# above removes the scatter; this kernel removes the gather too by moving the
# state *inside* the same staircase merge.
#
# For output slot ``k`` the owner is the unique ``j`` with ``f_{j-1} ≤ k < f_j``
# (runs of a run-length decode).  Writing ``c_{j,k} = (f_j ≤ k)`` the owner mask
# telescopes: ``own_{j,k} = c_{j-1,k} − c_{j,k} ∈ {0,1}`` — so one compare per
# (row, slot) plus a one-row shift of the *1-D extents vector* (not the mask)
# builds the mask, and
#
#   anc[k]  = Σ_j c_{j,k}           (count of extents ≤ k — exact int sum)
#   out[k]  = Σ_j own_{j,k} · v_j   (exactly one nonzero term ⇒ exact f32 copy)
#
# Per (output block × input sub-slice) the VPU does 2 compares + 1 subtract +
# 2 multiply-adds per element — measured ~25% faster than the previous
# lo/hi-mask formulation, with the ``f_{j-1}`` input array eliminated (the
# shifted compare is rebuilt from the same ``f`` slice and a carried scalar).
# Block sizes tuned on v5e: [512 rows × 1024 slots] masks; smaller tiles lose
# to gating overhead, larger ones to vreg spills.  No scatter, sort, or
# dynamic gather anywhere.

_MC = 1024  # input extents per inner chunk (1-D i32 VMEM loads must be 1024-aligned)
_MS = 512  # rows per mask sub-slice (bounds temp VMEM to [_MS, _MW])
_MW = 1024  # output slots per grid step (f32/i32 1-D tile granularity)


def _make_move_kernel(
    n_cols: int,
    _MC: int = _MC,
    _MS: int = _MS,
    _MW: int = _MW,
):
    """Kernel over ``win, f, v_0 … v_{n_cols-1}`` → ``anc, out_0 … out_{n_cols-1}``.

    All value columns are separate 1-D f32 arrays (a single ``[M, D]`` array with
    small ``D`` would pad the minor dim to 128 lanes in VMEM — a 64× blowup).
    ``win`` (SMEM, int32[3]) = (output-window start, initial chunk pointer,
    initial consumed-row count) — zeros for a whole-population decode; a sharded
    caller passes its shard's global output offset plus the precomputed walk
    start (:func:`resample_move_window`).  Walk state carried in SMEM: the chunk
    pointer, the count of rows in chunks fully consumed by earlier blocks
    (``jbase``), and — inside one block's walk — the previous row's extent
    (``prev_f``, seeding the telescoped compare).
    """

    def kernel(*refs):
        win_ref = refs[0]
        f_ref = refs[1]
        v_refs = refs[2 : 2 + n_cols]
        anc_ref = refs[2 + n_cols]
        out_refs = refs[3 + n_cols : 3 + 2 * n_cols]
        carry_ref = refs[-1]

        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = win_ref[1]  # chunk pointer (units of _MC)
            carry_ref[1] = win_ref[2]  # jbase: rows in chunks below this block

        base = win_ref[0] + b * _MW
        ptr0 = carry_ref[0]
        jbase = carry_ref[1]
        num_chunks = f_ref.shape[0] // _MC
        block_end = base + _MW - 1

        pos = base + jax.lax.broadcasted_iota(jnp.int32, (_MS, _MW), 1)
        pos_row = base + jax.lax.broadcasted_iota(jnp.int32, (_MW,), 0)

        def cond(c):
            return jnp.logical_not(c[-1])

        def body(c):
            ptr, prev_f, accs, _ = c
            off = pl.multiple_of(ptr * _MC, _MC)
            chunk = f_ref[pl.ds(off, _MC)]
            vals = [v_ref[pl.ds(off, _MC)] for v_ref in v_refs]

            def sub_update(s, carry):
                prev_f, accs = carry
                sub = jax.lax.slice(chunk, (s * _MS,), ((s + 1) * _MS,))
                sub_last = sub[_MS - 1]

                def consumed(accs):
                    # Every row has f ≤ base ≤ every slot: counts only.
                    return (accs[0] + _MS,) + accs[1:]

                def live(accs):
                    # c_{j,k} = (f_j ≤ k): ONE compare family per element.
                    # (A direct (512,1)-vs-(512,1024) broadcast compare without
                    # the materialising add measured identical in-engine —
                    # Mosaic already folds the broadcast; round-4 A/B.)
                    subb = sub[:, None] + jnp.zeros((_MS, _MW), jnp.int32)
                    cle = (subb <= pos).astype(jnp.float32)
                    # Row −1 of the telescope: the carried previous extent.
                    prev_row = (prev_f <= pos_row).astype(jnp.float32)
                    prev_rows = jnp.concatenate(
                        [
                            prev_row[None],
                            jax.lax.slice(cle, (0, 0), (_MS - 1, _MW)),
                        ],
                        axis=0,
                    )
                    own = prev_rows - cle  # {0,1}, exactly one 1 per column
                    anc = accs[0] + jnp.sum(cle, axis=0).astype(jnp.int32)
                    outs = tuple(
                        acc
                        + jnp.sum(
                            own
                            * jax.lax.slice(
                                v, (s * _MS,), ((s + 1) * _MS,)
                            )[:, None],
                            axis=0,
                        )
                        for acc, v in zip(accs[1:], vals)
                    )
                    return (anc,) + outs

                def not_consumed(accs):
                    # Skip the fully-beyond sub-slices (prev_f > block_end ⇒
                    # every row of this sub-slice owns only later slots).
                    #
                    # [A "census" variant that additionally collapsed
                    # zero-extents-inside-the-block sub-slices to a broadcast
                    # (long offspring runs) was removed after v5e measurement:
                    # dense wins at EVERY degeneracy level — 4.79 vs 5.25 ms
                    # at ESS/N=0.5, and even at 20-survivor weights (50k-slot
                    # runs) 5.88 vs 6.49 ms — its per-sub-slice scalar census
                    # and extra cond nesting cost more than the compares
                    # saved; see profiling/autotune_move.py and git history.]
                    return jax.lax.cond(
                        prev_f <= block_end, live, lambda a: a, accs
                    )

                accs = jax.lax.cond(sub_last <= base, consumed, not_consumed, accs)
                return sub_last, accs

            for s in range(_MC // _MS):
                prev_f, accs = sub_update(s, (prev_f, accs))

            last = chunk[_MC - 1]
            stop = (last > block_end) | (ptr + 1 >= num_chunks)
            ptr = jnp.where(stop, ptr, ptr + 1)
            return ptr, prev_f, accs, stop

        # prev_f starts at 0: rows before the walk window were consumed by
        # earlier blocks (their extents ≤ previous block end < base), and the
        # telescope only needs ``prev_f ≤ k`` to hold for them, which 0 gives.
        accs0 = (jnp.full((_MW,), jbase, jnp.int32),) + tuple(
            jnp.zeros((_MW,), jnp.float32) for _ in range(n_cols)
        )
        ptr, prev_f, accs, _ = jax.lax.while_loop(
            cond, body, (ptr0, jnp.int32(0), accs0, jnp.asarray(False))
        )

        anc_ref[:] = accs[0]
        for out_ref, acc in zip(out_refs, accs[1:]):
            out_ref[:] = acc
        # The next block re-walks from ``ptr``; every row in chunks before it
        # has extent ≤ this block's end < the next block's first slot.
        carry_ref[0] = ptr
        carry_ref[1] = ptr * _MC

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n", "n_out", "interpret", "tiles")
)
def _resample_move_cols(
    f, cols, n, start=None, n_out=None, interpret=False, tiles=None,
):
    """Fused run-length decode + value move (optionally over an output window).

    ``f``: nondecreasing int32 extents ``[M]`` (``f_j`` = #outputs below
    ``cdf_j``, with ``f_{M-1}`` forced to ``n``); ``cols``: tuple of ``[M]``
    float32 value columns.  With ``start``/``n_out`` given, decodes only output
    slots ``[start, start + n_out)`` — the sharded per-chip window — starting
    the staircase walk at the first chunk containing an owner (one
    ``searchsorted`` of ``start``).  Returns ``(anc int32 [n_out], ys)`` —
    ``ys`` a tuple of ``[n_out]`` float32 with ``ys_c = cols_c[anc]`` exactly
    (the owner mask has one nonzero per output, so the f32 multiply-sum is a
    copy, not a sum).
    """
    mc, ms, mw = tiles if tiles is not None else (_MC, _MS, _MW)
    m = f.shape[0]
    windowed = n_out is not None
    if not windowed:
        n_out = n
    pad_in = (-m) % mc
    n_pad = -(-n_out // mw) * mw
    sentinel = jnp.int32(1 << 30)
    f = f.at[m - 1].set(n)  # guard float cumsum undershoot: last extent covers n
    f_p = jnp.concatenate([f, jnp.full((pad_in,), sentinel, jnp.int32)])
    vs = [c.astype(jnp.float32) for c in cols]
    if pad_in:
        zpad = jnp.zeros((pad_in,), jnp.float32)
        vs = [jnp.concatenate([v, zpad]) for v in vs]

    if windowed:
        start = jnp.asarray(start, jnp.int32)
        # First chunk holding a row with f > start: rows in earlier chunks are
        # consumed for every slot of the window (their extents ≤ start).
        j0 = jnp.searchsorted(f, start, side="right").astype(jnp.int32)
        ptr0 = j0 // mc
        win = jnp.stack([start, ptr0, ptr0 * mc])
    else:
        win = jnp.zeros((3,), jnp.int32)

    n_cols = len(vs)
    outs = pl.pallas_call(
        _make_move_kernel(n_cols, mc, ms, mw),
        grid=(n_pad // mw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_cols),
        out_specs=[
            pl.BlockSpec((mw,), lambda b: (b,), memory_space=pltpu.VMEM)
        ]
        * (1 + n_cols),
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.int32)]
        + [jax.ShapeDtypeStruct((n_pad,), jnp.float32)] * n_cols,
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(win, f_p, *vs)
    anc = outs[0][:n_out]
    return anc, tuple(o[:n_out] for o in outs[1:])


# ---------------------------------------------------------------------------
# v3: sublane-windowed owner-index decode + move
# ---------------------------------------------------------------------------
#
# The v1 kernel above compares every overlapping 512-row input sub-slice against
# ALL 1024 slots of the output block — O(N·(C+W)) dense work, ~3.6 ms per
# 1M-particle decode+move (D=1) on v5e, the dominant cost of a triggered
# resampling step.  But a 128-row sub-slice of the (sorted) extents owns only
# the slot range ``[f_prev, f_last)`` — about 128 slots when offspring counts
# are near 1 — so comparing it only against the 128-slot tiles it actually
# owns cuts the compare volume ~8×.
#
# A first attempt (v2, removed — see git history) implemented exactly that but
# lost to v1 (5.7 vs 3.6 ms): per-sub-slice ``(1,128)→(128,1)`` relayouts,
# traced ``fori_loop`` tile bounds and dynamic read-modify-write output stores
# cost more than the compares saved.  v3 keeps the windowing but fixes the
# lowering:
#
# * rows live in SUBLANES: each 1024-row chunk is transposed ONCE to
#   ``(128, 8)``, so a sub-slice is a static lane slice (no per-sub-slice
#   relayout) and the owner-sum is a cheap sublane reduction;
# * the 8 sub-slices × 8 slot tiles form a STATIC 8×8 grid of ``pl.when``
#   regions (scalar `need` test each) — no traced-bound loops;
# * outputs accumulate via static 128-slot slices of the 1-D output block
#   (slot ``k`` sits at ``(k//128, k%128)`` of the (8,128) tile, so
#   ``out[t*128:(t+1)*128]`` is one vreg row — no dynamic RMW).
#
# Owner-index formulation (vs v1's cumulative-count): with
# ``cle_{j,k} = (f_j ≤ k)`` the owner mask telescopes per row,
# ``own_{j,k} = cle_{j-1,k} − cle_{j,k} ∈ {0,1}``, and
#
#   anc[k] = Σ_j own_{j,k} · j        (the owner's row index — exact int sum)
#   out[k] = Σ_j own_{j,k} · v_j      (exactly one nonzero term ⇒ exact copy)
#
# Every term is local to the owning sub-slice, so windowed accumulation needs
# no cross-window bookkeeping.  Sentinel-padded rows (extent 2^30, ≥1
# guaranteed) own all output slots past the population: those decode to the
# first sentinel row id (clipped to m−1 by the caller) with moved value 0.
#
# Walk state (SMEM, sequential grid): the 1024-row chunk pointer and the last
# extent of fully-consumed chunks (seeds sub-slice 0's telescope).

_V3_SUB = 128  # rows per sub-slice == slots per tile (lane width)
_V3_BLK = 1024  # slots per grid step == rows per chunk


def _make_move_kernel_v3(n_cols: int):
    """Kernel over ``win, f, v_0 … v_{n_cols-1}`` → ``anc, out_0 …``.

    1-D layouts as v1 (``f``/``v_c`` are ``[M_pad]``, outputs ``[n_pad]``);
    ``win`` (SMEM int32[3]) = (output-window start, initial chunk pointer,
    extent of the last row before that chunk).
    """

    def kernel(*refs):
        win_ref = refs[0]
        f_ref = refs[1]
        v_refs = refs[2 : 2 + n_cols]
        anc_ref = refs[2 + n_cols]
        out_refs = refs[3 + n_cols : 3 + 2 * n_cols]
        carry_ref = refs[-1]

        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = win_ref[1]  # chunk pointer (units of _V3_BLK rows)
            carry_ref[1] = win_ref[2]  # last extent before that chunk

        base = win_ref[0] + b * _V3_BLK
        block_end = base + _V3_BLK - 1
        num_chunks = f_ref.shape[0] // _V3_BLK

        anc_ref[:] = jnp.zeros((_V3_BLK,), jnp.int32)
        for o in out_refs:
            o[:] = jnp.zeros((_V3_BLK,), jnp.float32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _V3_SUB), 1)
        subl = jax.lax.broadcasted_iota(jnp.int32, (_V3_SUB, 1), 0)
        nsub = _V3_BLK // _V3_SUB  # 8 sub-slices per chunk / tiles per block

        def cond(c):
            return jnp.logical_not(c[-1])

        def body(c):
            ptr, prev_chunk_last, _ = c
            off = pl.multiple_of(ptr * _V3_BLK, _V3_BLK)
            chunk = f_ref[pl.ds(off, _V3_BLK)]
            fT = jnp.transpose(chunk.reshape(nsub, _V3_SUB))  # (128, 8)
            vTs = [
                jnp.transpose(v_ref[pl.ds(off, _V3_BLK)].reshape(nsub, _V3_SUB))
                for v_ref in v_refs
            ]

            for s in range(nsub):
                col = jax.lax.slice(fT, (0, s), (_V3_SUB, s + 1))  # (128,1)
                prev_s = (
                    chunk[s * _V3_SUB - 1] if s > 0 else prev_chunk_last
                )
                sub_last = chunk[s * _V3_SUB + _V3_SUB - 1]
                rowbase = ptr * _V3_BLK + s * _V3_SUB
                vcols = [
                    jax.lax.slice(vT, (0, s), (_V3_SUB, s + 1)) for vT in vTs
                ]
                for t in range(nsub):
                    tbase = base + t * _V3_SUB
                    # This sub-slice owns slots [prev_s, sub_last); the tile
                    # covers [tbase, tbase + 127].
                    need = (sub_last > tbase) & (prev_s < tbase + _V3_SUB)

                    @pl.when(need)
                    def _(s=s, t=t, col=col, prev_s=prev_s, rowbase=rowbase,
                          vcols=vcols, tbase=tbase):
                        pos = tbase + lane  # (1, 128)
                        cle = (col <= pos).astype(jnp.int32)  # (128, 128)
                        shifted = pltpu.roll(cle, shift=1, axis=0)
                        prow = (prev_s <= pos).astype(jnp.int32)  # (1, 128)
                        prevrows = jnp.where(subl == 0, prow, shifted)
                        own = prevrows - cle  # {0,1}, ≤ one 1 per slot
                        rowid = rowbase + subl  # (128, 1)
                        sl = slice(t * _V3_SUB, (t + 1) * _V3_SUB)
                        anc_ref[sl] += jnp.sum(own * rowid, axis=0)
                        ownf = own.astype(jnp.float32)
                        for o, v in zip(out_refs, vcols):
                            o[sl] += jnp.sum(ownf * v, axis=0)

            chunk_last = chunk[_V3_BLK - 1]
            stop = (chunk_last > block_end) | (ptr + 1 >= num_chunks)
            adv = jnp.logical_not(stop)
            ptr_n = jnp.where(adv, ptr + 1, ptr)
            prev_n = jnp.where(adv, chunk_last, prev_chunk_last)
            return ptr_n, prev_n, stop

        ptr, prev_last, _ = jax.lax.while_loop(
            cond, body, (carry_ref[0], carry_ref[1], jnp.asarray(False))
        )
        carry_ref[0] = ptr
        carry_ref[1] = prev_last

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "n_out", "interpret"))
def _resample_move_cols_v3(f, cols, n, start=None, n_out=None, interpret=False):
    """v3 fused decode+move (see block comment above): same contract as
    :func:`_resample_move_cols` — identical ``anc``/moved values for identical
    inputs — at ~1/8 the compare volume."""
    m = f.shape[0]
    windowed = n_out is not None
    if not windowed:
        n_out = n
    # Pad to whole 1024-row chunks with ≥1 sentinel row: slots past the
    # population need a sentinel owner (id ≥ m → clipped to m−1, value 0).
    pad_in = (-m) % _V3_BLK or _V3_BLK
    n_pad = -(-n_out // _V3_BLK) * _V3_BLK
    sentinel = jnp.int32(1 << 30)
    f = f.at[m - 1].set(n)  # guard float cumsum undershoot (as v1)
    f_p = jnp.concatenate([f, jnp.full((pad_in,), sentinel, jnp.int32)])
    vs = []
    zpad = jnp.zeros((pad_in,), jnp.float32)
    for c in cols:
        vs.append(jnp.concatenate([c.astype(jnp.float32), zpad]))

    if windowed:
        start = jnp.asarray(start, jnp.int32)
        # First chunk holding a row with f > start (earlier rows own only
        # slots < start); its telescope seed is the extent just before it.
        j0 = jnp.searchsorted(f, start, side="right").astype(jnp.int32)
        ptr0 = j0 // _V3_BLK
        prev0 = jnp.where(
            ptr0 > 0, f_p[jnp.maximum(ptr0 * _V3_BLK - 1, 0)], jnp.int32(0)
        )
        win = jnp.stack([start, ptr0, prev0])
    else:
        win = jnp.zeros((3,), jnp.int32)

    n_cols = len(vs)
    outs = pl.pallas_call(
        _make_move_kernel_v3(n_cols),
        grid=(n_pad // _V3_BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_cols),
        out_specs=[
            pl.BlockSpec((_V3_BLK,), lambda b: (b,), memory_space=pltpu.VMEM)
        ]
        * (1 + n_cols),
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.int32)]
        + [jax.ShapeDtypeStruct((n_pad,), jnp.float32)] * n_cols,
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(win, f_p, *vs)
    anc = outs[0][:n_out]
    return anc, tuple(o[:n_out] for o in outs[1:])


# ---------------------------------------------------------------------------
# v4: per-tile merge walk + MXU move
# ---------------------------------------------------------------------------
#
# v1 (the round-3 default) compares every live 512-row input sub-slice against
# all 1024 slots of the output block — ~1.3k compares per output slot, 3.6 ms
# per 1M-particle firing on v5e, ~70x above the ~16 MB HBM roofline.  v3 cut
# the compare volume 8x by windowing but lost to its own lowering (per-chunk
# transposes, 64 scalar ``pl.when`` gates, VMEM read-modify-write).  v4 keeps
# the windowed O(N·128/lanes) compare volume and fixes the lowering:
#
# * the unit of work is a (128-row window x 128-slot tile) FIRE inside a
#   per-tile ``while_loop`` merge: windows and slots advance together (both
#   sorted), so the loop runs ~1-2 fires per tile instead of scanning an 8x8
#   grid of scalar gates;
# * the owner mask is built with TWO compares and no telescoping chain:
#   ``own[j, k] = (f_{j-1} <= k) & (k < f_j)``, with ``f_{j-1}`` a one-row
#   sublane roll of the window column seeded by the carried previous extent;
# * ancestor index and ALL moved value columns come out of ONE MXU matmul,
#   ``[rowid; v_0 ...] (1+C, 128) @ own (128, 128) -> (1+C, 128)``,
#   accumulated in registers (the while carry) and written once per tile.
#
# Exactness: ``own`` has at most one nonzero row per slot, so every output
# column of the matmul is ``0 + ... + v_j + ... + 0`` — an exact f32 copy
# under any accumulation order, including the MXU's f32 (bf16x3) path, whose
# splitting is exact for multiplicands 0.0/1.0.  The ancestor row accumulates
# integer row ids < 2^24 in f32, also exact (guarded in the wrapper).
# Value rows ride the same lane layout as the 1-D inputs (no transpose); only
# the 128-extent window is transposed to a sublane column per fire.

_V4_SUB = 128  # rows per window == slots per tile (lane width)
_V4_BLK = 1024  # slots per grid step (8 tiles)
_V4_CHUNK = 1024  # load granularity (1-D VMEM alignment requirement)


def _make_move_kernel_v4(n_cols: int, windowed: bool):
    """Kernel over ``[win,] f, v_0 … v_{n_cols-1}`` → ``anc, out_0 …``.

    1-D layouts as v1/v3; ``win`` (SMEM int32[3], windowed calls only) =
    (output-window start, initial window pointer in 128-row units, extent of
    the last row before that window).  SMEM carry: (window pointer, previous
    extent).

    CRITICAL (measured on v5e): the extents/value arrays are taken as
    ``pltpu.ANY`` (HBM) operands and DMA'd to VMEM scratch ONCE at grid step
    0.  With plain whole-array VMEM in_specs the pipeline re-copied both
    full arrays on EVERY grid step whenever the operands were produced by
    upstream XLA ops (the pad/concat prologue) or accompanied by an SMEM
    operand — 977 steps × 8 MB ≈ 10 ms of pure HBM traffic, 25× the
    kernel's real cost; bisected on hardware, mechanism in Mosaic's
    pipelining of grid-invariant operands.  Manual staging makes the
    once-only copy explicit and provenance-independent.
    """

    def kernel(*refs):
        off0 = 1 if windowed else 0
        win_ref = refs[0] if windowed else None
        f_hbm = refs[off0]
        v_hbms = refs[off0 + 1 : off0 + 1 + n_cols]
        anc_ref = refs[off0 + 1 + n_cols]
        out_refs = refs[off0 + 2 + n_cols : off0 + 2 + 2 * n_cols]
        f_ref = refs[off0 + 2 + 2 * n_cols]
        v_refs = refs[off0 + 3 + 2 * n_cols : off0 + 3 + 3 * n_cols]
        sem = refs[-2]
        carry_ref = refs[-1]

        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            cps = [pltpu.make_async_copy(f_hbm, f_ref, sem.at[0])]
            cps += [
                pltpu.make_async_copy(vh, vr, sem.at[1 + c])
                for c, (vh, vr) in enumerate(zip(v_hbms, v_refs))
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            # window pointer (units of _V4_SUB rows); extent of last row before
            carry_ref[0] = win_ref[1] if windowed else 0
            carry_ref[1] = win_ref[2] if windowed else 0

        base = (win_ref[0] if windowed else 0) + b * _V4_BLK
        nwin = f_ref.shape[0] // _V4_SUB
        nsub = _V4_CHUNK // _V4_SUB  # 128-row windows per 1024-row chunk

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _V4_SUB), 1)
        subl = jax.lax.broadcasted_iota(jnp.int32, (_V4_SUB, 1), 0)

        wptr = carry_ref[0]
        prev_f = carry_ref[1]

        def window(ref, wptr):
            # 1-D i32/f32 VMEM loads must be 1024-aligned: load the whole
            # chunk (4 vregs) and extract window ``wptr % 8`` with static
            # selects (a register op; dynamic sublane slices don't lower).
            off = pl.multiple_of((wptr // nsub) * _V4_CHUNK, _V4_CHUNK)
            chunk = ref[pl.ds(off, _V4_CHUNK)].reshape(nsub, _V4_SUB)
            s = wptr % nsub
            row = chunk[0:1]
            for i in range(1, nsub):
                row = jnp.where(s == i, chunk[i : i + 1], row)
            return row  # (1, _V4_SUB)

        for t in range(_V4_BLK // _V4_SUB):
            tbase = base + t * _V4_SUB
            tend = tbase + _V4_SUB - 1
            pos = tbase + lane  # (1, 128) slot ids on lanes

            def cond(c):
                return c[-1]

            def body(c, tbase=tbase, tend=tend, pos=pos):
                wptr, prev_f, acc, _ = c
                fwin = window(f_ref, wptr)  # (1, 128)
                last = fwin[0, _V4_SUB - 1]

                def fire(acc):
                    fcol = jnp.transpose(fwin)  # (128, 1)
                    fprev = jnp.where(
                        subl == 0, prev_f, pltpu.roll(fcol, shift=1, axis=0)
                    )
                    own = ((fprev <= pos) & (pos < fcol)).astype(jnp.float32)
                    rowid = (wptr * _V4_SUB + lane).astype(jnp.float32)
                    rows = [rowid] + [window(v_ref, wptr) for v_ref in v_refs]
                    lhs = rows[0] if n_cols == 0 else jnp.concatenate(rows, 0)
                    # Precision.HIGHEST: the MXU's default f32 path is a single
                    # bf16 pass, which truncates row ids > 255 and the moved
                    # values; the 6-pass f32 emulation is exact here (every
                    # product is 0·x or 1·x and each output sums one nonzero).
                    return acc + jax.lax.dot_general(
                        lhs,
                        own,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )

                # Fire only when the window owns slots in this tile (rows with
                # f <= tbase own only earlier slots).
                acc = jax.lax.cond(last > tbase, fire, lambda a: a, acc)
                adv = last <= tend  # window can own nothing beyond this tile
                more = adv & (wptr + 1 < nwin)
                wptr_n = jnp.where(more, wptr + 1, wptr)
                prev_n = jnp.where(more, last, prev_f)
                return wptr_n, prev_n, acc, more

            acc0 = jnp.zeros((1 + n_cols, _V4_SUB), jnp.float32)
            wptr, prev_f, acc, _ = jax.lax.while_loop(
                cond, body, (wptr, prev_f, acc0, jnp.asarray(True))
            )
            sl = slice(t * _V4_SUB, (t + 1) * _V4_SUB)
            anc_ref[sl] = acc[0].astype(jnp.int32)
            for o, r in zip(out_refs, range(1, 1 + n_cols)):
                o[sl] = acc[r]

        carry_ref[0] = wptr
        carry_ref[1] = prev_f

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "n_out", "interpret"))
def _resample_move_cols_v4(f, cols, n, start=None, n_out=None, interpret=False):
    """v4 fused decode+move (see block comment above): same contract as
    :func:`_resample_move_cols` — identical ancestors and bitwise-identical
    moved values for identical inputs."""
    m = f.shape[0]
    windowed = n_out is not None
    if not windowed:
        n_out = n
    # >= 1 sentinel row: slots past the population decode to the first
    # sentinel row (clipped to m-1 by the caller) with moved value 0, and the
    # merge can never run out of windows before the last tile.  Chunk-granular
    # padding: the kernel loads whole 1024-element chunks.
    pad_in = (-m) % _V4_CHUNK or _V4_CHUNK
    if m + pad_in >= (1 << 24):
        raise ValueError("v4 kernel requires m + pad < 2^24 for exact f32 row ids")
    n_pad = -(-n_out // _V4_BLK) * _V4_BLK
    sentinel = jnp.int32(1 << 30)
    f = f.at[m - 1].set(n)  # guard float cumsum undershoot (as v1)
    f_p = jnp.concatenate([f, jnp.full((pad_in,), sentinel, jnp.int32)])
    zpad = jnp.zeros((pad_in,), jnp.float32)
    vs = [jnp.concatenate([c.astype(jnp.float32), zpad]) for c in cols]

    args = []
    if windowed:
        start = jnp.asarray(start, jnp.int32)
        # First 128-row window holding a row with f > start; its merge seed is
        # the extent just before it (rows below own only slots < start).
        j0 = jnp.searchsorted(f, start, side="right").astype(jnp.int32)
        ptr0 = j0 // _V4_SUB
        prev0 = jnp.where(
            ptr0 > 0, f_p[jnp.maximum(ptr0 * _V4_SUB - 1, 0)], jnp.int32(0)
        )
        args.append(jnp.stack([start, ptr0, prev0]))

    n_cols = len(vs)
    m_pad = f_p.shape[0]
    outs = pl.pallas_call(
        _make_move_kernel_v4(n_cols, windowed),
        grid=(n_pad // _V4_BLK,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] if windowed else [])
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * (1 + n_cols),
        out_specs=[
            pl.BlockSpec((_V4_BLK,), lambda b: (b,), memory_space=pltpu.VMEM)
        ]
        * (1 + n_cols),
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.int32)]
        + [jax.ShapeDtypeStruct((n_pad,), jnp.float32)] * n_cols,
        scratch_shapes=[
            pltpu.VMEM((m_pad,), jnp.int32),
        ]
        + [pltpu.VMEM((m_pad,), jnp.float32)] * n_cols
        + [
            pltpu.SemaphoreType.DMA((1 + n_cols,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
        interpret=interpret,
    )(*args, f_p, *vs)
    anc = outs[0][:n_out]
    return anc, tuple(o[:n_out] for o in outs[1:])


# ---------------------------------------------------------------------------
# v5: v1's dense staircase with MXU accumulation (exact bf16 splits)
# ---------------------------------------------------------------------------
#
# Round-4 finding: the per-tile merge (v4) loses to its own scalar control —
# ~140 cycles of window-extract/branch bookkeeping per 128-row fire x ~16k
# fires ~ 2.4 ms before any compute (measured via an empty-fire ablation);
# total 10.1 ms vs v1's 3.4 (all varied-input timings — loop-invariant
# harnesses get hoisted by XLA and read ~25x too fast; see git history).
# The dense-block structure (v1) amortises scalar work over fat
# [512 x 1024] mask tiles and is compare-bound; v5 keeps that structure and
# attacks the per-element constant:
#
# * masks in bfloat16 (cle/own hold exactly 0.0/1.0 — exact in bf16, half
#   the vector registers of v1's f32 masks);
# * the anc/value accumulation moves from VPU multiply-adds to ONE bf16 MXU
#   matmul per sub-slice: ``lhs (3+3C, 512) @ own (512, 1024) -> f32``, with
#   lhs rows [ones; (loc>>7)<<7; loc&127; v_hi; v_mid; v_lo ...]:
#   - the local row id splits as loc = a' + b with a' in {0,128,256,384} and
#     b in [0,127], both exactly representable in bf16; the global ancestor
#     index assembles as jbase*r_ones + r_a + r_b in f32 (ints < 2^24, exact);
#   - each f32 value column splits exactly into three bf16 terms
#     (v == hi + mid + lo, Dekker-style); every matmul output sums at most
#     one nonzero product, so moved values are exact f32 copies of normal
#     inputs (TPU flushes denormals — same caveat as v1's VPU path).
# * the "consumed" sub-slice branch becomes a pure skip (owner-id semantics
#   need no cumulative count, unlike v1's).

_V5_MC = 1024  # input extents per chunk (1-D i32 VMEM alignment)
_V5_MS = 512  # rows per mask sub-slice
_V5_MW = 1024  # output slots per grid step


def _split3(v):
    """Exact 3-way bf16 split: ``v == hi + mid + lo`` as f32 sums (normal f32
    inputs; each residual holds <= 8 further mantissa bits)."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _make_move_kernel_v5(n_cols: int, windowed: bool):
    """Kernel over ``[win,] f, v_0 … v_{n_cols-1}`` → ``anc, out_0 …``.

    ``win`` (SMEM int32[2], windowed calls only) = (output-window start,
    initial chunk pointer).  SMEM carry: the chunk pointer.
    """

    def kernel(*refs):
        off0 = 1 if windowed else 0
        win_ref = refs[0] if windowed else None
        f_ref = refs[off0]
        v_refs = refs[off0 + 1 : off0 + 1 + n_cols]
        anc_ref = refs[off0 + 1 + n_cols]
        out_refs = refs[off0 + 2 + n_cols : off0 + 2 + 2 * n_cols]
        carry_ref = refs[-1]

        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = win_ref[1] if windowed else 0  # chunk pointer

        base = (win_ref[0] if windowed else 0) + b * _V5_MW
        ptr0 = carry_ref[0]
        num_chunks = f_ref.shape[0] // _V5_MC
        block_end = base + _V5_MW - 1

        pos = base + jax.lax.broadcasted_iota(jnp.int32, (_V5_MS, _V5_MW), 1)
        pos_row = base + jax.lax.broadcasted_iota(jnp.int32, (_V5_MW,), 0)
        loc = jax.lax.broadcasted_iota(jnp.int32, (1, _V5_MS), 1)
        ones_row = jnp.ones((1, _V5_MS), jnp.bfloat16)
        a_row = ((loc >> 7) << 7).astype(jnp.bfloat16)
        b_row = (loc & 127).astype(jnp.bfloat16)

        def cond(c):
            return jnp.logical_not(c[-1])

        def body(c):
            ptr, prev_f, accs, _ = c
            off = pl.multiple_of(ptr * _V5_MC, _V5_MC)
            chunk = f_ref[pl.ds(off, _V5_MC)]
            vals = [v_ref[pl.ds(off, _V5_MC)] for v_ref in v_refs]

            def sub_update(s, carry):
                prev_f, accs = carry
                sub = jax.lax.slice(chunk, (s * _V5_MS,), ((s + 1) * _V5_MS,))
                sub_last = sub[_V5_MS - 1]

                def live(accs):
                    subb = sub[:, None] + jnp.zeros((_V5_MS, _V5_MW), jnp.int32)
                    cle = (subb <= pos).astype(jnp.bfloat16)
                    prev_row = (prev_f <= pos_row).astype(jnp.bfloat16)
                    prev_rows = jnp.concatenate(
                        [
                            prev_row[None],
                            jax.lax.slice(cle, (0, 0), (_V5_MS - 1, _V5_MW)),
                        ],
                        axis=0,
                    )
                    own = prev_rows - cle  # bf16, exactly {0,1}
                    rows = [ones_row, a_row, b_row]
                    for v in vals:
                        vs_ = jax.lax.slice(
                            v, (s * _V5_MS,), ((s + 1) * _V5_MS,)
                        )
                        hi, mid, lo = _split3(vs_)
                        rows += [hi[None], mid[None], lo[None]]
                    lhs = jnp.concatenate(rows, axis=0)  # (3+3C, 512) bf16
                    out = jax.lax.dot_general(
                        lhs,
                        own,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    jbase = (off + s * _V5_MS).astype(jnp.float32)
                    new = [accs[0] + jbase * out[0] + out[1] + out[2]]
                    for ci in range(n_cols):
                        new.append(accs[1 + ci] + out[3 + 3 * ci]
                                   + out[4 + 3 * ci] + out[5 + 3 * ci])
                    return tuple(new)

                def not_consumed(accs):
                    return jax.lax.cond(
                        prev_f <= block_end, live, lambda a: a, accs
                    )

                # Fully-consumed sub-slices (sub_last <= base) are pure skips:
                # owner-id accumulation needs no count bookkeeping.
                accs = jax.lax.cond(
                    sub_last <= base, lambda a: a, not_consumed, accs
                )
                return sub_last, accs

            for s in range(_V5_MC // _V5_MS):
                prev_f, accs = sub_update(s, (prev_f, accs))

            last = chunk[_V5_MC - 1]
            stop = (last > block_end) | (ptr + 1 >= num_chunks)
            ptr = jnp.where(stop, ptr, ptr + 1)
            return ptr, prev_f, accs, stop

        # prev_f seeds 0 per block: rows before the walk window were consumed
        # by earlier blocks/windows, so ``prev_f <= k`` must hold — 0 gives it
        # (same telescope argument as v1).
        accs0 = tuple(
            jnp.zeros((_V5_MW,), jnp.float32) for _ in range(1 + n_cols)
        )
        ptr, prev_f, accs, _ = jax.lax.while_loop(
            cond, body, (ptr0, jnp.int32(0), accs0, jnp.asarray(False))
        )

        anc_ref[:] = accs[0].astype(jnp.int32)
        for o, acc in zip(out_refs, accs[1:]):
            o[:] = acc
        carry_ref[0] = ptr

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "n_out", "interpret"))
def _resample_move_cols_v5(f, cols, n, start=None, n_out=None, interpret=False):
    """v5 fused decode+move (see block comment above): same contract as
    :func:`_resample_move_cols` — identical ancestors and bitwise-identical
    moved values for identical (normal-f32) inputs."""
    m = f.shape[0]
    windowed = n_out is not None
    if not windowed:
        n_out = n
    pad_in = (-m) % _V5_MC or _V5_MC
    if m + pad_in >= (1 << 24):
        raise ValueError("v5 kernel requires m + pad < 2^24 for exact f32 row ids")
    n_pad = -(-n_out // _V5_MW) * _V5_MW
    sentinel = jnp.int32(1 << 30)
    f = f.at[m - 1].set(n)  # guard float cumsum undershoot (as v1)
    f_p = jnp.concatenate([f, jnp.full((pad_in,), sentinel, jnp.int32)])
    zpad = jnp.zeros((pad_in,), jnp.float32)
    vs = [jnp.concatenate([c.astype(jnp.float32), zpad]) for c in cols]

    args = []
    if windowed:
        start = jnp.asarray(start, jnp.int32)
        # First chunk holding a row with f > start (earlier rows own only
        # slots < start, which this window never decodes).
        j0 = jnp.searchsorted(f, start, side="right").astype(jnp.int32)
        args.append(jnp.stack([start, j0 // _V5_MC]))

    n_cols = len(vs)
    outs = pl.pallas_call(
        _make_move_kernel_v5(n_cols, windowed),
        grid=(n_pad // _V5_MW,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] if windowed else [])
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_cols),
        out_specs=[
            pl.BlockSpec((_V5_MW,), lambda b: (b,), memory_space=pltpu.VMEM)
        ]
        * (1 + n_cols),
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.int32)]
        + [jax.ShapeDtypeStruct((n_pad,), jnp.float32)] * n_cols,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(*args, f_p, *vs)
    anc = outs[0][:n_out]
    return anc, tuple(o[:n_out] for o in outs[1:])


# ---------------------------------------------------------------------------
# v7: full-chunk dense fused decode+move (decode_ancestors' lean style)
# ---------------------------------------------------------------------------
#
# Round-4 measurement: the count-only ``decode_ancestors`` kernel runs the
# SAME staircase walk at 1.37 ms per 1M firing vs fused v1's 3.30 — v1's
# extra cost is its per-sub-slice ``lax.cond`` gating and bookkeeping, not
# the value math.  v7 fuses the move into the decode kernel's structure:
# whole 1024-row chunks, no sub-slices, no conditional gating, one f32
# own-mask built from the compare + a one-row shift, and own-rowid
# accumulation (like v4/v5) so no count/valid bookkeeping is needed either:
#
#   own[j,k] = cle[j-1,k] − cle[j,k] ∈ {0,1}   (cle = (f_j ≤ k))
#   anc[k]   = Σ own·(rowbase + j)    — exact int sums in f32 (< 2^24)
#   out_c[k] = Σ own·v_j              — exactly one nonzero ⇒ exact copy

_V7_C = 1024  # rows per chunk
_V7_W = 1024  # output slots per grid step


def _make_move_kernel_v7(n_cols: int, windowed: bool):
    """Kernel over ``[win,] f, v_0 … v_{n_cols-1}`` → ``anc, out_0 …``.

    ``win`` (SMEM int32[2], windowed calls only) = (output-window start,
    initial chunk pointer).  SMEM carry: the chunk pointer.
    """

    def kernel(*refs):
        off0 = 1 if windowed else 0
        win_ref = refs[0] if windowed else None
        f_ref = refs[off0]
        v_refs = refs[off0 + 1 : off0 + 1 + n_cols]
        anc_ref = refs[off0 + 1 + n_cols]
        out_refs = refs[off0 + 2 + n_cols : off0 + 2 + 2 * n_cols]
        carry_ref = refs[-1]

        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = win_ref[1] if windowed else 0  # chunk pointer

        base = (win_ref[0] if windowed else 0) + b * _V7_W
        ptr0 = carry_ref[0]
        num_chunks = f_ref.shape[0] // _V7_C
        block_end = base + _V7_W - 1

        pos = base + jax.lax.broadcasted_iota(jnp.int32, (_V7_C, _V7_W), 1)
        pos_row = base + jax.lax.broadcasted_iota(jnp.int32, (_V7_W,), 0)

        def cond(c):
            return jnp.logical_not(c[-1])

        def body(c):
            ptr, prev_f, accs, _ = c
            off = pl.multiple_of(ptr * _V7_C, _V7_C)
            chunk = f_ref[pl.ds(off, _V7_C)]
            chunk2 = chunk[:, None] + jnp.zeros((_V7_C, _V7_W), jnp.int32)
            cle = (chunk2 <= pos).astype(jnp.float32)
            prev_row = (prev_f <= pos_row).astype(jnp.float32)
            prev_rows = jnp.concatenate(
                [prev_row[None], jax.lax.slice(cle, (0, 0), (_V7_C - 1, _V7_W))],
                axis=0,
            )
            own = prev_rows - cle  # {0,1}, exactly one 1 per owned column
            rowid = (
                off + jax.lax.broadcasted_iota(jnp.int32, (_V7_C, 1), 0)
            ).astype(jnp.float32)
            new = [accs[0] + jnp.sum(own * rowid, axis=0)]
            for ci, v_ref in enumerate(v_refs):
                v = v_ref[pl.ds(off, _V7_C)]
                new.append(accs[1 + ci] + jnp.sum(own * v[:, None], axis=0))

            last = chunk[_V7_C - 1]
            stop = (last > block_end) | (ptr + 1 >= num_chunks)
            ptr_n = jnp.where(stop, ptr, ptr + 1)
            prev_n = jnp.where(stop, prev_f, last)
            return ptr_n, prev_n, tuple(new), stop

        accs0 = tuple(
            jnp.zeros((_V7_W,), jnp.float32) for _ in range(1 + n_cols)
        )
        # prev_f seeds 0 per block: rows before the walk were consumed by
        # earlier blocks/windows (same telescope argument as v1/v5).
        ptr, prev_f, accs, _ = jax.lax.while_loop(
            cond, body, (ptr0, jnp.int32(0), accs0, jnp.asarray(False))
        )

        anc_ref[:] = accs[0].astype(jnp.int32)
        for o, acc in zip(out_refs, accs[1:]):
            o[:] = acc
        carry_ref[0] = ptr

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "n_out", "interpret"))
def _resample_move_cols_v7(f, cols, n, start=None, n_out=None, interpret=False):
    """v7 fused decode+move (see block comment above): same contract as
    :func:`_resample_move_cols` — identical ancestors and bitwise-identical
    moved values for identical inputs."""
    m = f.shape[0]
    windowed = n_out is not None
    if not windowed:
        n_out = n
    pad_in = (-m) % _V7_C or _V7_C
    if m + pad_in >= (1 << 24):
        raise ValueError("v7 kernel requires m + pad < 2^24 for exact f32 row ids")
    n_pad = -(-n_out // _V7_W) * _V7_W
    sentinel = jnp.int32(1 << 30)
    f = f.at[m - 1].set(n)  # guard float cumsum undershoot (as v1)
    f_p = jnp.concatenate([f, jnp.full((pad_in,), sentinel, jnp.int32)])
    zpad = jnp.zeros((pad_in,), jnp.float32)
    vs = [jnp.concatenate([c.astype(jnp.float32), zpad]) for c in cols]

    args = []
    if windowed:
        start = jnp.asarray(start, jnp.int32)
        j0 = jnp.searchsorted(f, start, side="right").astype(jnp.int32)
        args.append(jnp.stack([start, j0 // _V7_C]))

    n_cols = len(vs)
    outs = pl.pallas_call(
        _make_move_kernel_v7(n_cols, windowed),
        grid=(n_pad // _V7_W,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] if windowed else [])
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_cols),
        out_specs=[
            pl.BlockSpec((_V7_W,), lambda b: (b,), memory_space=pltpu.VMEM)
        ]
        * (1 + n_cols),
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.int32)]
        + [jax.ShapeDtypeStruct((n_pad,), jnp.float32)] * n_cols,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(*args, f_p, *vs)
    anc = outs[0][:n_out]
    return anc, tuple(o[:n_out] for o in outs[1:])


# VMEM budget: one launch holds f plus a GROUP of state columns on-chip; cap
# total per-launch input elements under the ~16 MB VMEM of a v5e core.  Wider
# states (round-3 verdict #3: Lévy D=2 at 1M sat exactly at the old 3M cap;
# 16-site generic programs fell off it) are handled by ``_move_cols_grouped``:
# up to two group launches, then the fused-decode + batched-gather hybrid —
# always at least as fast as the pure-XLA fallback whenever f fits in VMEM.
_MOVE_MAX_ELEMS = 3_000_000  # f32 elements per launch across f + column group
_MOVE_MAX_COLS = 64


def _move_group_size(m: int) -> int:
    """Columns per kernel launch at population ``m`` (≥1 iff f alone fits)."""
    return max(0, _MOVE_MAX_ELEMS // m - 1)


def move_ineligible_reason(state, m: int):
    """``None`` if the fused Pallas resample+move pipeline can handle this
    state, else a short human-readable reason for the XLA-gather fallback.

    Requirements: all leaves float32 with leading axis ``m`` (integer/f64
    leaves are excluded — the kernel moves values through f32 arithmetic, and
    bit-casting int payloads through multiplies is not exact on TPU, which
    flushes denormals), total width ≤ 64 columns, and the extents array must
    fit the per-launch VMEM budget with at least one value column.
    """
    if jax.default_backend() != "tpu":
        return "backend is not TPU"
    leaves = jax.tree_util.tree_leaves(state)
    if not leaves:
        return "empty state pytree"
    d = 0
    for leaf in leaves:
        if leaf.dtype != jnp.float32:
            return f"non-float32 leaf (dtype {leaf.dtype})"
        if leaf.ndim == 0 or leaf.shape[0] != m:
            return f"leaf leading axis {leaf.shape} != particle count {m}"
        d += int(leaf.size) // m
    if _move_group_size(m) < 1:
        return f"extents for m={m} exceed the per-launch VMEM budget"
    if d > _MOVE_MAX_COLS:
        return f"state width {d} > {_MOVE_MAX_COLS} columns"
    return None


def move_eligible(state, m: int) -> bool:
    """True if the fused Pallas resample+move pipeline can handle this state
    (see :func:`move_ineligible_reason` for the rules)."""
    return move_ineligible_reason(state, m) is None


def _flatten_cols(state, m):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    cols = []
    for leaf in leaves:
        flat = leaf.reshape(m, -1)
        cols.extend(flat[:, c] for c in range(flat.shape[1]))
    return leaves, treedef, tuple(cols)


def _unflatten_cols(leaves, treedef, ys, m, n_out):
    out, off = [], 0
    for leaf in leaves:
        w = int(leaf.size) // m
        stacked = jnp.stack(ys[off : off + w], axis=1) if w > 1 else ys[off][:, None]
        out.append(stacked.reshape((n_out,) + leaf.shape[1:]))
        off += w
    return jax.tree_util.tree_unflatten(treedef, out)


#: Which fused decode+move implementation the engine uses.  All are exact and
#: pinned against each other (tests/test_pallas_resample.py).  The ONLY
#: trustworthy comparison is an in-engine same-session A/B of the full sweep
#: (bench.py under APS_MOVE_VERSION): micro-harnesses mislead in BOTH
#: directions on this machine — loop-invariant operands get the kernel
#: hoisted out of timing scans (reads ~25x fast), while varied operands can
#: trigger per-grid-step operand re-copies for SOME kernels (reads ~1.5x
#: slow, and differently per version).  Round-4 in-engine A/B at 1M (17
#: firings per sweep, same hour, v1 ratchet-identical to round 3):
#:   v1 dense staircase (VPU f32)    76.1 ms sweep  ← production default
#:   v5 dense staircase + bf16 MXU   79.6 ms sweep (micro said 1.5x FASTER)
#:   v4 per-tile merge + MXU         ~10 ms/firing — scalar walk overhead
#:   v3 sublane-windowed             4.95 ms/firing (round 3)
#:   v7 full-chunk lean (no gating)  6.2 ms/firing micro vs v1's 3.4 — the
#:      count-only decode kernel's 1.37 ms does NOT extend to a fused move:
#:      the f32 mask conversion + two multiply-reductions over the full
#:      (1024,1024) mask cost more than v1's cond-gated half-chunk form.
#:   v0 decode-only + XLA gather     351 ms sweep (vs v1's 76): the 1M
#:      single-column gather costs ~18 ms per firing in-engine — the fused
#:      move's entire reason to exist, now pinned by a same-session A/B.
#:      (Batched WIDE takes amortise the per-row overhead across columns,
#:      which is why the wide-state hybrid still gathers its overflow.)
#: v3/v4/v5/v7 are kept as measured testbeds documenting the design space:
#: fine granularity loses to Mosaic's scalar control; the MXU rewrite saves
#: no wall time because the i32 mask compare + mask-sized multiply-reduce —
#: common to all variants — are the true bottleneck, not the accumulation
#: formulation.
_MOVE_IMPLS = {
    1: _resample_move_cols,
    3: _resample_move_cols_v3,
    4: _resample_move_cols_v4,
    5: _resample_move_cols_v5,
    7: _resample_move_cols_v7,
}
# APS_MOVE_VERSION: measurement override for same-session A/B on shared
# hardware (the chip+host show a few percent of hour-scale drift, so absolute
# numbers across sessions don't settle 10%-class kernel questions).
DEFAULT_MOVE_VERSION = int(os.environ.get("APS_MOVE_VERSION", "1"))


def _move_cols_grouped(impl, f, cols, n, start=None, n_out=None, interpret=False):
    """Move wide states against one set of extents: grouped launches, then a
    batched-gather hybrid.

    One kernel launch holds ``g = _move_group_size(m)`` value columns in
    VMEM.  Each extra launch re-walks ``f`` (~3.6 ms at 1M — the walk
    dominates, extra columns ride nearly free), while ONE XLA gather of a
    stacked ``[m, d_rest]`` block costs ~8 ms at 1M *regardless of width*
    (per-row index overhead amortises across the row).  So:

    * ``d ≤ 2g``  — up to two fused launches (≤ ~7 ms < the gather);
    * ``d > 2g``  — one fused launch decodes the ancestors and moves the
      first ``g`` columns; the remaining columns ride one batched
      ``jnp.take`` (slots past the drawn population are zeroed to keep the
      kernel's past-end contract).

    Measured v5e basis (round 4): v1 launch 3.6-4.4 ms/firing at 1M; the
    naive 8-launch plan for D=16 would cost ~35 ms vs ~12 ms hybrid vs
    ~23 ms pure-XLA fallback.
    """
    m = f.shape[0]
    # Fused value columns are EXPENSIVE: each adds a multiply-reduce over the
    # whole mask volume (~1 ms/col at 1M — the measured D=1→D=2 delta), while
    # batched-gather columns amortise to ~nothing.  Cap the fused group at 2
    # regardless of the VMEM budget; the in-engine win on a 50-site generic
    # sweep was 67 → 20 ms (round 4).
    g = min(max(1, _move_group_size(m)), 2)
    if len(cols) <= g:
        return impl(f, cols, n, start=start, n_out=n_out, interpret=interpret)
    if len(cols) <= 2 * g:
        anc = None
        ys = []
        for i in range(0, len(cols), g):
            anc_i, ys_i = impl(
                f, cols[i : i + g], n,
                start=start, n_out=n_out, interpret=interpret,
            )
            anc = anc_i if anc is None else anc
            ys.extend(ys_i)
        return anc, tuple(ys)
    anc, ys = impl(
        f, cols[:g], n, start=start, n_out=n_out, interpret=interpret
    )
    anc_cl = jnp.clip(anc, 0, m - 1)
    rest = jnp.stack(cols[g:], axis=1)  # [m, d_rest]
    taken = jnp.take(rest, anc_cl, axis=0)
    # Kernel contract: slots whose owner is a sentinel row (at/past the drawn
    # population) move value 0; the clipped gather would leak the last row.
    taken = jnp.where((anc >= m)[:, None], 0.0, taken)
    return anc, tuple(ys) + tuple(taken[:, i] for i in range(taken.shape[1]))


def resample_move_f(
    f, state, n: int, interpret: bool = False, version: int = None
):
    """As :func:`resample_move`, but from precomputed extents ``f``
    (e.g. the output of :func:`extents_from_logw` — skipping the XLA
    normalise+cumsum chain entirely).

    ``version=0`` selects the decode-only kernel + whole-tree XLA gather
    (no in-kernel value move) — an A/B alternative to the fused kernels.
    """
    ver = DEFAULT_MOVE_VERSION if version is None else version
    m = f.shape[0]
    if ver == 0:
        anc = jnp.clip(decode_ancestors(f, n, interpret=interpret), 0, m - 1)
        moved = jax.tree_util.tree_map(
            lambda a: jnp.take(a, anc, axis=0), state
        )
        return anc, moved
    leaves, treedef, cols = _flatten_cols(state, m)
    anc, ys = _move_cols_grouped(
        _MOVE_IMPLS[ver], f, cols, n, interpret=interpret
    )
    anc = jnp.clip(anc, 0, m - 1)
    return anc, _unflatten_cols(leaves, treedef, ys, m, n)


def resample_move(
    u, weights, state, n: int, interpret: bool = False, version: int = None
):
    """Systematic resampling with the state moved in-kernel.

    Returns ``(anc int32 [n], new_state)`` where ``new_state`` equals
    ``tree_map(lambda a: a[anc], state)`` exactly.  Caller must check
    :func:`move_eligible` first.
    """
    m = weights.shape[0]
    cdf = jnp.cumsum(weights)
    f = jnp.clip(jnp.ceil(n * cdf - u), 0, n).astype(jnp.int32)
    return resample_move_f(f, state, n, interpret=interpret, version=version)


def resample_move_window_fext(
    f_ext, state, n: int, start, n_out: int,
    interpret: bool = False, version: int = None,
):
    """Window decode+move against a ROW-WINDOW of precomputed global extents.

    The O(N/K·D) sharded exchange (parallel/sharded.py) hands each chip only
    the 3 neighbouring shards' rows: ``f_ext`` is the nondecreasing int32
    global-extents slice for those rows and ``state`` their value rows (same
    leading length).  Requires (caller-guaranteed, via the neighbour-exchange
    predicate) that every owner of slots ``[start, start + n_out)`` lies
    inside the window and that all rows BEFORE the window have extents
    ``≤ start``; then the returned ``anc`` is the WINDOW-LOCAL owner index
    (global owner − window first row) and moved values are exact copies.  The
    kernel's last-row guard (``f.at[m-1].set(n)``) only raises the final
    window row's extent, which by the predicate already exceeds every slot
    decoded here, so ownership inside the window is unchanged.
    """
    impl = _MOVE_IMPLS[version or DEFAULT_MOVE_VERSION]
    m = f_ext.shape[0]
    leaves, treedef, cols = _flatten_cols(state, m)
    anc, ys = _move_cols_grouped(
        impl, f_ext, cols, n, start=start, n_out=n_out, interpret=interpret
    )
    anc = jnp.clip(anc, 0, m - 1)
    return anc, _unflatten_cols(leaves, treedef, ys, m, n_out)


def resample_move_window(
    u, weights, state, n: int, start, n_out: int,
    interpret: bool = False, version: int = None,
):
    """Window variant of :func:`resample_move` for sharded sweeps.

    Decodes ancestors and moves state only for global output slots
    ``[start, start + n_out)`` against the full population's systematic CDF —
    the per-chip slice of the exchange after an ``all_gather`` of the state
    (``start`` may be traced, e.g. ``axis_index * shard_len``).  Identical
    extents formula as :func:`resample_move`, so the decoded indices equal the
    corresponding slice of the whole-population ancestors.  Output slots at or
    beyond ``n`` (e.g. the reference slot the caller overwrites) decode to
    ``anc = m - 1`` with moved value 0.
    """
    impl = _MOVE_IMPLS[version or DEFAULT_MOVE_VERSION]
    m = weights.shape[0]
    cdf = jnp.cumsum(weights)
    f = jnp.clip(jnp.ceil(n * cdf - u), 0, n).astype(jnp.int32)
    leaves, treedef, cols = _flatten_cols(state, m)
    anc, ys = _move_cols_grouped(
        impl, f, cols, n, start=start, n_out=n_out, interpret=interpret
    )
    anc = jnp.clip(anc, 0, m - 1)
    return anc, _unflatten_cols(leaves, treedef, ys, m, n_out)
