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
    "decode_ancestors_bs",
    "systematic_pallas",
    "extents_from_logw",
    "scaled_prefix_from_logw",
    "prefix_sum",
    "count_le_sorted",
    "count_le_sorted_bs",
    "count_le_sorted_auto",
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


def _block_prefix(e):
    """Inclusive prefix over one (_EX_SUB, 128) block: prefix along lanes
    (row-local), then carry row totals down the sublanes — standard log-step
    scan, 7 + 7 masked shifts.  Returns (inclusive prefix, sublane running
    totals ``rp`` whose last row holds the block total)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (_EX_SUB, 128), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (_EX_SUB, 1), 0)
    p = e
    for k in (1, 2, 4, 8, 16, 32, 64):
        p = p + jnp.where(lane >= k, pltpu.roll(p, shift=k, axis=1), 0.0)
    row_tot = jax.lax.slice(p, (0, 127), (_EX_SUB, 128))  # (_EX_SUB, 1)
    rp = row_tot
    for k in (1, 2, 4, 8, 16, 32, 64):
        rp = rp + jnp.where(subl >= k, pltpu.roll(rp, shift=k, axis=0), 0.0)
    row_excl = jnp.where(subl == 0, 0.0, pltpu.roll(rp, shift=1, axis=0))
    return p + row_excl, rp


def _kahan_update(carry_ref, base, total):
    """Kahan-compensated running sum across blocks (carry_ref[0] = sum,
    carry_ref[1] = compensation)."""
    comp = carry_ref[1]
    y = total - comp
    t_new = base + y
    carry_ref[1] = (t_new - base) - y
    carry_ref[0] = t_new


def _block_runmax(x):
    """Running (cumulative) max over one (_EX_SUB, 128) block, row-major
    order — the same log-step shift structure as :func:`_block_prefix` with
    ``max`` instead of ``+``.  Used to make emitted prefixes *bitwise*
    nondecreasing: the log-step sum scan computes neighbouring prefixes
    through different summation trees, so a later element can round an ulp
    BELOW an earlier one — and the decode+move staircase requires monotone
    extents (its telescoped owner mask breaks on a dip)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (_EX_SUB, 128), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (_EX_SUB, 1), 0)
    ninf = jnp.float32(-jnp.inf)
    p = x
    for k in (1, 2, 4, 8, 16, 32, 64):
        p = jnp.maximum(p, jnp.where(lane >= k, pltpu.roll(p, shift=k, axis=1), ninf))
    row_m = jax.lax.slice(p, (0, 127), (_EX_SUB, 128))  # (_EX_SUB, 1)
    rm = row_m
    for k in (1, 2, 4, 8, 16, 32, 64):
        rm = jnp.maximum(rm, jnp.where(subl >= k, pltpu.roll(rm, shift=k, axis=0), ninf))
    row_excl = jnp.where(subl == 0, ninf, pltpu.roll(rm, shift=1, axis=0))
    return jnp.maximum(p, row_excl)


def _make_extents_kernel(nr: int):
    def kernel(scal_ref, logw_ref, f_ref, carry_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = 0.0  # running sum of exp(logw - m)
            carry_ref[1] = 0.0  # Kahan compensation
            carry_ref[2] = 0.0  # largest extent emitted so far (monotone guard)

        m = scal_ref[0]
        inv_s1 = scal_ref[1]
        u = scal_ref[2]

        e = jnp.exp(logw_ref[:].reshape(_EX_SUB, 128) - m)
        prefix, rp = _block_prefix(e)

        base = carry_ref[0]
        cdf = (base + prefix) * inv_s1
        ff = jnp.clip(jnp.ceil(nr * cdf - u), 0.0, float(nr))
        # Bitwise-monotone guard: the log-step scan's differing summation
        # trees can round a later prefix an ulp below an earlier one, and at
        # an exact stratum boundary that would emit a DECREASING extent —
        # which the decode+move staircase cannot absorb.  nr < 2^24 keeps
        # the float running max exact.
        ff = jnp.maximum(_block_runmax(ff), carry_ref[2])
        f_ref[:] = ff.astype(jnp.int32).reshape(_EX_BLK)

        carry_ref[2] = ff[_EX_SUB - 1, 127]
        _kahan_update(carry_ref, base, rp[_EX_SUB - 1, 0])

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
        scratch_shapes=[pltpu.SMEM((3,), jnp.float32)],
        interpret=interpret,
    )(scal, logw)
    return f[:mm]


# ---------------------------------------------------------------------------
# Scaled-prefix + sorted merge-count: the monotone-extents reduction for
# stratified and multinomial resampling (round-4 verdict, next #1)
# ---------------------------------------------------------------------------
#
# Both non-systematic schemes reduce to the SAME problem the fused
# decode+move kernel already solves — nondecreasing int32 extents ``f_j`` =
# #positions ≤ cdf_j — because their positions are sorted by construction:
#
# * stratified positions ``(k + u_k)/n`` are sorted, and because ``u_k`` is a
#   POSITIONAL uniform (a pure function of (key, k), rng.py) the extent has a
#   closed form needing ONE cipher evaluation per particle, no gather:
#   with ``c_j = n·cdf_j``, ``f_j = ⌊c_j⌋ + [u_{⌊c_j⌋} ≤ frac(c_j)]`` —
#   see ``resampling.stratified_extents``.
# * multinomial uniforms are GENERATED sorted via the exponential-spacings
#   order-statistics construction (Devroye 1986, §V.3): with n+1 iid Exp(1)
#   gaps ``G_k`` and prefix sums ``S_k``, the sorted uniforms are
#   ``S_k / S_n``; then ``f_j = #{k < n : S_k ≤ cdf_j · S_n}`` — one
#   merge-count of two sorted arrays (kernel below).
#
# The kernels here supply the two primitives: ``scaled_prefix_from_logw``
# (the extents kernel's exp+prefix pass emitting the FLOAT scaled cdf,
# ``(Σ_{i≤j} exp(logw_i − m)) · scale``) and ``count_le_sorted`` (staircase
# merge-count, the float-threshold analogue of ``decode_ancestors``).


def _make_scaled_prefix_kernel(use_exp: bool):
    def kernel(scal_ref, x_ref, out_ref, carry_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = 0.0  # running sum across blocks
            carry_ref[1] = 0.0  # Kahan compensation
            carry_ref[2] = -jnp.inf  # largest value emitted (monotone guard)

        m = scal_ref[0]
        scale = scal_ref[1]

        x = x_ref[:].reshape(_EX_SUB, 128)
        e = jnp.exp(x - m) if use_exp else x
        prefix, rp = _block_prefix(e)

        base = carry_ref[0]
        # Bitwise-monotone output (see _block_runmax): required downstream —
        # count_le_sorted's cross-block masking and stratified_extents'
        # nondecreasing-extents contract both assume it.
        out = _block_runmax((base + prefix) * scale)
        out = jnp.maximum(out, carry_ref[2])
        out_ref[:] = out.reshape(_EX_BLK)
        carry_ref[2] = out[_EX_SUB - 1, 127]
        _kahan_update(carry_ref, base, rp[_EX_SUB - 1, 0])

    return kernel


def _scaled_prefix(x, m, scale, use_exp, interpret):
    mm = x.shape[0]
    pad = (-mm) % _EX_BLK
    if pad:
        # exp path: -inf pads contribute exp = 0; identity path: 0 pads.
        fill = -jnp.inf if use_exp else 0.0
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    scal = jnp.stack([jnp.asarray(m, jnp.float32),
                      jnp.asarray(scale, jnp.float32)])
    out = pl.pallas_call(
        _make_scaled_prefix_kernel(use_exp),
        grid=(x.shape[0] // _EX_BLK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_EX_BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_EX_BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0],), jnp.float32),
        scratch_shapes=[pltpu.SMEM((3,), jnp.float32)],
        interpret=interpret,
    )(scal, x.astype(jnp.float32))
    return out[:mm]


@functools.partial(jax.jit, static_argnames=("interpret",))
def scaled_prefix_from_logw(logw, m, scale, interpret: bool = False):
    """``(Σ_{i≤j} exp(logw_i − m)) · scale`` as float32 — the scaled weight
    CDF in one streamed pass (same prefix machinery and Kahan carry as
    :func:`extents_from_logw`, float output, no ceil).  ``scale`` is a traced
    scalar: ``n/s1`` gives stratified's ``c = n·cdf``; ``S_total/s1`` gives
    multinomial's merge thresholds ``cdf·S_total``."""
    return _scaled_prefix(logw, m, scale, use_exp=True, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def prefix_sum(x, interpret: bool = False):
    """Inclusive float32 prefix sum in one streamed Pallas pass — replaces
    XLA's multi-pass 1M ``cumsum`` (~1.5 ms/firing) for the multinomial
    exponential-spacings construction.  Pairwise-class error per block +
    Kahan-compensated cross-block carry (monotone for nonnegative input)."""
    return _scaled_prefix(x, 0.0, 1.0, use_exp=False, interpret=interpret)


# Merge-count block sizes: one 1024-threshold output block per grid step,
# walking 1024-element chunks of the sorted values (same staircase economics
# as the decode kernel: each chunk is consumed exactly once across the grid).
_CT_C = 1024
_CT_W = 1024


def _count_le_kernel(s_ref, t_ref, out_ref, icarry_ref, fcarry_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        icarry_ref[0] = 0  # chunk pointer (units of _CT_C)
        icarry_ref[1] = 0  # jbase: #values counted by earlier blocks
        fcarry_ref[0] = -jnp.inf  # last threshold of the previous block

    tb = t_ref[:]  # (_CT_W,) nondecreasing thresholds
    t_last = tb[_CT_W - 1]
    t_prev = fcarry_ref[0]
    ptr0 = icarry_ref[0]
    jbase = icarry_ref[1]
    num_chunks = s_ref.shape[0] // _CT_C

    def cond(c):
        return jnp.logical_not(c[-1])

    def body(c):
        ptr, h, _ = c
        chunk = s_ref[pl.ds(pl.multiple_of(ptr * _CT_C, _CT_C), _CT_C)]
        chunk2 = chunk[:, None] + jnp.zeros((_CT_C, _CT_W), jnp.float32)
        # Values ≤ the previous block's last threshold were already counted
        # into jbase by earlier blocks (thresholds are sorted).
        contrib = (chunk2 > t_prev) & (chunk2 <= tb[None, :])
        h = h + jnp.sum(contrib.astype(jnp.int32), axis=0)
        last = chunk[_CT_C - 1]
        stop = (last > t_last) | (ptr + 1 >= num_chunks)
        ptr = jnp.where(stop, ptr, ptr + 1)
        return ptr, h, stop

    ptr, h, _ = jax.lax.while_loop(
        cond, body, (ptr0, jnp.zeros((_CT_W,), jnp.int32), jnp.asarray(False))
    )

    out_ref[:] = jbase + h
    icarry_ref[0] = ptr
    icarry_ref[1] = jbase + h[_CT_W - 1]
    fcarry_ref[0] = t_last


def _win_lookup_f32(win2, idx, nrows):
    """``out[i,j] = win2[idx >> 7, idx & 127]`` for an (nrows, 128) f32 table
    and (8, 128) indices; out-of-range indices read +inf (bisection
    invariant)."""
    r = idx >> 7
    c = idx & 127
    out = jnp.full(idx.shape, jnp.float32(jnp.inf))
    for k in range(nrows):
        row = jax.lax.slice(win2, (k, 0), (k + 1, 128))
        b = jnp.broadcast_to(row, idx.shape)
        g = jnp.take_along_axis(b, c, axis=1)
        out = jnp.where(r == k, g, out)
    return out


def _count_le_bs_kernel(s_ref, t_ref, out_ref, carry_ref):
    """Binary-search form of the sorted merge-count (same structure as
    :func:`_decode_bs_kernel` with float values/thresholds)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry_ref[0] = 0  # #values ≤ the previous block's last threshold

    tb = t_ref[:].reshape(_BS_BLK // 128, 128)
    t_last = t_ref[_BS_BLK - 1]
    rbase = carry_ref[0]
    wstart0 = (rbase // 1024) * 1024

    def cond(c):
        return jnp.logical_not(c[-1])

    def body(c):
        wstart, acc, _ = c
        win = s_ref[pl.ds(pl.multiple_of(wstart, 1024), _BS_WIN)]
        win2 = win.reshape(_BS_WIN // 128, 128)
        lo = jnp.zeros(tb.shape, jnp.int32)
        hi = jnp.full(tb.shape, _BS_WIN, jnp.int32)
        for _ in range(_BS_STEPS):
            mid = (lo + hi) >> 1
            sm = _win_lookup_f32(win2, mid, _BS_WIN // 128)
            gt = sm > tb
            hi = jnp.where(gt, mid, hi)
            lo = jnp.where(gt, lo, mid + 1)
        acc = acc + lo
        last = win[_BS_WIN - 1]
        num_rows = s_ref.shape[0]
        stop = (last > t_last) | (wstart + 2 * _BS_WIN > num_rows)
        return wstart + _BS_WIN, acc, stop

    acc0 = jnp.full(tb.shape, wstart0, jnp.int32)
    _, acc, _ = jax.lax.while_loop(
        cond, body, (wstart0, acc0, jnp.asarray(False))
    )
    out_ref[:] = acc.reshape(_BS_BLK)
    carry_ref[0] = acc[_BS_BLK // 128 - 1, 127]


@functools.partial(jax.jit, static_argnames=("interpret",))
def count_le_sorted_bs(s: jax.Array, t: jax.Array, interpret: bool = False):
    """Binary-search form of :func:`count_le_sorted` (same contract)."""
    nt = t.shape[0]
    nt_pad = -(-nt // _BS_BLK) * _BS_BLK
    if nt_pad != nt:
        t_p = jnp.concatenate(
            [t.astype(jnp.float32),
             jnp.full((nt_pad - nt,), 1.0, jnp.float32) * t[nt - 1]]
        )
    else:
        t_p = t.astype(jnp.float32)
    pad = ((-s.shape[0]) % 1024) + 2 * _BS_WIN
    s_p = jnp.concatenate(
        [s.astype(jnp.float32), jnp.full((pad,), jnp.inf, jnp.float32)]
    )
    out = pl.pallas_call(
        _count_le_bs_kernel,
        grid=(nt_pad // _BS_BLK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_BS_BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_BS_BLK,), lambda b: (b,), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nt_pad,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(s_p, t_p)
    return out[:nt]


def count_le_sorted_auto(s: jax.Array, t: jax.Array, interpret: bool = False):
    """Engine dispatcher: the binary-search merge-count unless
    APS_DECODE=dense (the same A/B handle as the v6 decoder)."""
    fn = count_le_sorted_bs if _V6_DECODE_BS else count_le_sorted
    return fn(s, t, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def count_le_sorted(s: jax.Array, t: jax.Array, interpret: bool = False):
    """``out[j] = #{k : s_k ≤ t_j}`` for SORTED (nondecreasing) float32 ``s``
    and ``t`` — the float-threshold analogue of :func:`decode_ancestors`,
    O(|s| + |t|) chunk walks of dense VPU compares.  The output is the
    nondecreasing extents vector consumed by :func:`resample_move_f`."""
    ns, nt = s.shape[0], t.shape[0]
    pad_s = (-ns) % _CT_C
    pad_t = (-nt) % _CT_W
    s_p = jnp.concatenate(
        [s.astype(jnp.float32), jnp.full((pad_s,), jnp.inf, jnp.float32)]
    ) if pad_s else s.astype(jnp.float32)
    if pad_t:
        # Pad thresholds with the last real one: keeps them nondecreasing and
        # avoids walking every remaining chunk for the sliced-off tail.
        t_p = jnp.concatenate(
            [t.astype(jnp.float32), jnp.full((pad_t,), 1.0, jnp.float32) * t[nt - 1]]
        )
    else:
        t_p = t.astype(jnp.float32)
    out = pl.pallas_call(
        _count_le_kernel,
        grid=(t_p.shape[0] // _CT_W,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_CT_W,), lambda b: (b,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_CT_W,), lambda b: (b,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_p.shape[0],), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
        ],
        interpret=interpret,
    )(s_p, t_p)
    return out[:nt]


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
    guard=None,
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
    # Guard float cumsum undershoot: the last extent covers every drawn slot
    # (callers decoding EXTRA slots — e.g. the engine's reference slot —
    # pass the drawn count as ``guard``; the extra slots then decode
    # past-population: anc = m, value 0).
    f = f.at[m - 1].set(n if guard is None else guard)
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


# VMEM budget: one launch holds f plus a GROUP of state columns on-chip; cap
# total per-launch input elements under the ~16 MB VMEM of a v5e core.  Wider
# states (round-3 verdict #3: Lévy D=2 at 1M sat exactly at the old 3M cap;
# 16-site generic programs fell off it) are handled by ``_move_cols_grouped``:
# up to two group launches, then the fused-decode + batched-gather hybrid —
# always at least as fast as the pure-XLA fallback whenever f fits in VMEM.
_MOVE_MAX_ELEMS = 3_000_000  # f32 elements per launch across f + column group
# Width cap: with the fused-decode + ONE-batched-gather hybrid the overflow
# columns ride a single [m, d-2] take whose per-row index overhead amortises
# across the row, so width costs HBM traffic only — the same traffic the
# pure-XLA fallback's gather pays on top of its searchsorted/scatter decode.
# 256 admits the reference-example-scale generic programs (T=200 ⇒ 200-column
# records), which at 64 fell off a silent cliff (round 5).
_MOVE_MAX_COLS = 256


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


# ---------------------------------------------------------------------------
# Binary-search decode (round 5): anc[k] = searchsorted(f, k, 'right') via
# in-kernel dynamic-gather lookups
# ---------------------------------------------------------------------------
#
# With the v6 lookup move (below), the count-only staircase decode became
# the dominant per-firing term (1.37 ms per 1M).  The same vreg-local
# ``tpu.dynamic_gather`` lets the count be computed by BINARY SEARCH instead
# of dense compares: per 1024-slot block, walk 2048-row windows of ``f``
# starting at the carried consumed-row count; within each window an 11-step
# bisection (each step one 2048-entry table lookup = 16 × broadcast +
# lane-gather + select) yields ``#{r in window : f_r ≤ k}`` for all 1024
# slots at once — ~0.8k vreg-ops per window vs the dense walk's ~4k per
# chunk.  Counts across windows add; a window whose first row already
# exceeds the block's last slot contributes nothing and stops the walk —
# the same staircase economics (each row window consumed once overall).

#: v6's decoder: the binary-search form (default) vs the dense staircase —
#: APS_DECODE=dense for in-engine A/Bs.
_V6_DECODE_BS = os.environ.get("APS_DECODE", "bs") == "bs"

_BS_BLK = 1024  # output slots per grid step
# f rows per search window (APS_BS_WIN: in-engine tuning knob; 1024-multiple)
_BS_WIN = int(os.environ.get("APS_BS_WIN", "2048"))
_BS_STEPS = ( _BS_WIN + 1 - 1).bit_length()  # ceil(log2(_BS_WIN + 1))


def _win_lookup_i32(win2, idx):
    """``out[i,j] = win2[idx[i,j] >> 7, idx[i,j] & 127]`` for a
    (16, 128) i32 table and (8, 128) indices in [0, _BS_WIN)."""
    r = idx >> 7
    c = idx & 127
    # Indices at/past the window (a converged-at-2048 search keeps probing
    # mid == _BS_WIN) must read as +inf so the bisection invariant holds.
    out = jnp.full(idx.shape, jnp.int32(1 << 30))
    for k in range(_BS_WIN // 128):
        row = jax.lax.slice(win2, (k, 0), (k + 1, 128))
        b = jnp.broadcast_to(row, idx.shape)
        g = jnp.take_along_axis(b, c, axis=1)
        out = jnp.where(r == k, g, out)
    return out


def _make_decode_bs_kernel(windowed: bool):
    def kernel(*refs):
        if windowed:
            win_ref, f_ref, out_ref, carry_ref = refs
        else:
            f_ref, out_ref, carry_ref = refs
            win_ref = None
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            # rbase: #rows with f ≤ previous block's last slot.  Windowed
            # calls seed it with the aligned row count below the first slot
            # (rows there have f ≤ start, so they count for every slot).
            carry_ref[0] = win_ref[1] if windowed else 0

        base = (win_ref[0] if windowed else 0) + b * _BS_BLK
        block_end = base + _BS_BLK - 1
        rbase = carry_ref[0]
        wstart0 = (rbase // 1024) * 1024  # aligned; slack rows have f ≤ base-1
        pos = base + jax.lax.broadcasted_iota(
            jnp.int32, (_BS_BLK // 128, 128), 1
        ) + 128 * jax.lax.broadcasted_iota(
            jnp.int32, (_BS_BLK // 128, 128), 0
        )

        def cond(c):
            return jnp.logical_not(c[-1])

        def body(c):
            wstart, acc, _ = c
            win = f_ref[pl.ds(pl.multiple_of(wstart, 1024), _BS_WIN)]
            win2 = win.reshape(_BS_WIN // 128, 128)
            # 12-step bisection: lo converges to #{r in window: f_r ≤ k}.
            lo = jnp.zeros(pos.shape, jnp.int32)
            hi = jnp.full(pos.shape, _BS_WIN, jnp.int32)
            for _ in range(_BS_STEPS):
                mid = (lo + hi) >> 1
                fm = _win_lookup_i32(win2, mid)
                gt = fm > pos
                hi = jnp.where(gt, mid, hi)
                lo = jnp.where(gt, lo, mid + 1)
            acc = acc + lo
            last = win[_BS_WIN - 1]
            # Stop once the NEXT window cannot contribute (this window's
            # rows already reach past the block — later rows are even
            # larger) or there are no further rows to walk.
            num_rows = f_ref.shape[0]
            stop = (last > block_end) | (wstart + 2 * _BS_WIN > num_rows)
            return wstart + _BS_WIN, acc, stop

        acc0 = jnp.full(pos.shape, wstart0, jnp.int32)
        _, acc, _ = jax.lax.while_loop(
            cond, body, (wstart0, acc0, jnp.asarray(False))
        )
        out_ref[:] = acc.reshape(_BS_BLK)
        carry_ref[0] = acc[_BS_BLK // 128 - 1, 127]

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "n_out", "interpret"))
def decode_ancestors_bs(
    f: jax.Array, n: int, start=None, n_out=None, interpret: bool = False
):
    """``anc[k] = #{j: f_j ≤ k}`` for nondecreasing int32 ``f`` — the
    binary-search formulation (see block comment).  Same contract as
    :func:`decode_ancestors`.  With ``start``/``n_out`` given, decodes only
    output slots ``[start, start + n_out)`` (the sharded per-chip window),
    seeding the walk at the first row owning the window."""
    windowed = n_out is not None
    if not windowed:
        n_out = n
    n_pad = -(-n_out // _BS_BLK) * _BS_BLK
    # Pad with a +inf-class sentinel so window loads stay in bounds and the
    # walk stops; two extra windows guarantee the last real window's load
    # and the lookahead are valid.
    pad = ((-f.shape[0]) % 1024) + 2 * _BS_WIN
    f_p = jnp.concatenate(
        [f.astype(jnp.int32), jnp.full((pad,), jnp.int32(1 << 30))]
    )
    args = []
    if windowed:
        start = jnp.asarray(start, jnp.int32)
        # Rows below the aligned seed all have f ≤ start ≤ every decoded
        # slot, so they enter the count as the carried base.
        j0 = jnp.searchsorted(f, start, side="right").astype(jnp.int32)
        args.append(jnp.stack([start, (j0 // 1024) * 1024]))
    anc = pl.pallas_call(
        _make_decode_bs_kernel(windowed),
        grid=(n_pad // _BS_BLK,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] if windowed else [])
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (_BS_BLK,), lambda b: (b,), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(*args, f_p)
    return anc[:n_out]


# ---------------------------------------------------------------------------
# v6: decode + windowed dynamic-gather lookup move (round 5)
# ---------------------------------------------------------------------------
#
# The round-4 floor argument — "every exact decode on the TPU VPU is a dense
# compare because there is no per-lane gather" — expired with this jax
# release: Mosaic now lowers ``jnp.take_along_axis`` on (8, 128) operands to
# ``tpu.dynamic_gather`` (sublane- and lane-axis; probed compiled+exact on
# v5e, crashes above one vreg of sublanes).  That enables a gather-based
# move:
#
# 1. ``decode_ancestors`` produces ``anc`` (the count kernel alone runs the
#    staircase at 1.37 ms per 1M — 2.4× less than the fused v1 move).
# 2. A lookup kernel moves the values: per 1024-slot output block, ``anc``
#    is NONDECREASING, so its sources live in windows of the value array
#    starting at ``anc[0]``.  For each (1024-aligned, 2048-row) window the
#    block needs, the 2048-entry table lookup decomposes as 16 × (sublane
#    broadcast of table row k + lane ``dynamic_gather`` by ``local & 127`` +
#    select where ``local >> 7 == k``) on (8, 128) vregs — ~50 vreg-ops per
#    window per column vs the dense staircase's ~5 000 per block.  Typical
#    resampling (offspring O(1)) needs 1–2 windows per block; heavy skew
#    degrades gracefully (the window while-loop walks the ancestor range).
#
# Exactness: every output slot matches exactly one (window, k) pair and the
# value moves through gather+select only — a bitwise copy with NO float
# arithmetic (stronger than v1's multiply-sum, which relies on 0/1-mask
# algebra).  Slots at/past the drawn population have ``anc = m`` and pick
# up the zero padding — same contract as v1.

_LK_BLK = 1024  # output slots per grid step
# value rows per lookup window (APS_LK_WIN: in-engine tuning knob)
_LK_WIN = int(os.environ.get("APS_LK_WIN", "2048"))


def _make_lookup_kernel(n_cols: int):
    def kernel(anc_ref, *refs):
        v_refs = refs[:n_cols]
        out_refs = refs[n_cols : 2 * n_cols]

        anc = anc_ref[:].reshape(_LK_BLK // 128, 128)
        amin = anc_ref[0]  # nondecreasing: first/last are the extremes
        amax = anc_ref[_LK_BLK - 1]
        wstart0 = (amin // 1024) * 1024

        def cond(c):
            return c[0] <= amax

        def body(c):
            wstart, outs = c
            local = anc - wstart  # (8, 128) i32
            r = local >> 7  # source sublane row within the window
            cidx = local & 127  # source lane (in [0,127] even when invalid)
            new_outs = []
            for o, v_ref in zip(outs, v_refs):
                win = v_ref[pl.ds(pl.multiple_of(wstart, 1024), _LK_WIN)]
                win2 = win.reshape(_LK_WIN // 128, 128)
                acc = o
                for k in range(_LK_WIN // 128):
                    row = jax.lax.slice(win2, (k, 0), (k + 1, 128))
                    b = jnp.broadcast_to(row, (_LK_BLK // 128, 128))
                    g = jnp.take_along_axis(b, cidx, axis=1)
                    # r == k implies 0 <= local < _LK_WIN: no extra mask.
                    acc = jnp.where(r == k, g, acc)
                new_outs.append(acc)
            return wstart + _LK_WIN, tuple(new_outs)

        zeros = tuple(
            jnp.zeros((_LK_BLK // 128, 128), jnp.float32) for _ in range(n_cols)
        )
        _, outs = jax.lax.while_loop(cond, body, (wstart0, zeros))
        for o_ref, o in zip(out_refs, outs):
            o_ref[:] = o.reshape(_LK_BLK)

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "n_out", "interpret"))
def _resample_move_cols_v6(
    f, cols, n, start=None, n_out=None, interpret=False, guard=None
):
    """v6 decode + lookup move (see block comment): same contract as
    :func:`_resample_move_cols` — identical ancestors and bitwise-identical
    moved values for identical inputs, including the windowed
    (sharded-exchange) form via :func:`decode_ancestors_bs`'s window
    support."""
    m = f.shape[0]
    windowed = n_out is not None
    if not windowed:
        n_out = n
    f = f.at[m - 1].set(n if guard is None else guard)  # undershoot guard (as v1)
    if windowed:
        anc = decode_ancestors_bs(
            f, n, start=start, n_out=n_out, interpret=interpret
        )
    else:
        decoder = decode_ancestors_bs if _V6_DECODE_BS else decode_ancestors
        anc = decoder(f, n, interpret=interpret)  # [n_out] counts in [0, m]
    n_pad = -(-n_out // _LK_BLK) * _LK_BLK
    if n_pad != n_out:
        # Padded output slots replay the last count (nondecreasing, and their
        # windows stay within the padded value array).
        anc_p = jnp.concatenate(
            [anc, jnp.full((n_pad - n_out,), 1, jnp.int32) * anc[n_out - 1]]
        )
    else:
        anc_p = anc
    # Pad values so every window load [wstart, wstart + _LK_WIN) is in
    # bounds: anc <= m, so the last window starts < m rounded up + margin.
    pad_in = ((-m) % 1024) + _LK_WIN
    zpad = jnp.zeros((pad_in,), jnp.float32)
    vs = [jnp.concatenate([c.astype(jnp.float32), zpad]) for c in cols]

    n_cols = len(vs)
    outs = pl.pallas_call(
        _make_lookup_kernel(n_cols),
        grid=(n_pad // _LK_BLK,),
        in_specs=[
            pl.BlockSpec((_LK_BLK,), lambda b: (b,), memory_space=pltpu.VMEM)
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_cols,
        out_specs=[
            pl.BlockSpec((_LK_BLK,), lambda b: (b,), memory_space=pltpu.VMEM)
        ]
        * n_cols,
        out_shape=[jax.ShapeDtypeStruct((n_pad,), jnp.float32)] * n_cols,
        interpret=interpret,
    )(anc_p, *vs)
    return anc, tuple(o[:n_out] for o in outs)


#: Which fused decode+move implementation the engine uses.  The ONLY
#: trustworthy comparison is an in-engine same-session A/B of the full sweep
#: (bench.py under APS_MOVE_VERSION): micro-harnesses mislead in BOTH
#: directions on this machine — loop-invariant operands get the kernel
#: hoisted out of timing scans (reads ~25x fast), while varied operands can
#: trigger per-grid-step operand re-copies for SOME kernels (reads ~1.5x
#: slow, and differently per version).
#:
#: The round-4 design-space sweep built, pinned exact, and measured FIVE
#: alternatives to v1 at 1M (in-engine, same hour); all lost and were
#: removed in round 5 (this file ≈ halved; the code lives in git history at
#: tag ``pre-kernel-prune-r5``, the findings in docs/benchmarks.md):
#:   v1 dense staircase (VPU f32)    76.1 ms sweep  ← production default
#:   v5 dense staircase + bf16 MXU   79.6 ms sweep (micro said 1.5x FASTER)
#:   v4 per-tile merge + MXU         ~10 ms/firing — scalar walk overhead
#:   v3 sublane-windowed             4.95 ms/firing (round 3)
#:   v7 full-chunk lean (no gating)  6.2 ms/firing micro vs v1's 3.4
#:   v0 decode-only + XLA gather     351 ms sweep (vs v1's 76): the 1M
#:      single-column gather costs ~18 ms per firing in-engine — the fused
#:      move's entire reason to exist.  v0 is KEPT (below) as the A/B that
#:      pins that premise.
#: Conclusion: every exact decode on the TPU VPU (no per-lane gather) is a
#: dense compare, and the i32 mask compare + mask-sized multiply-reduce —
#: common to all variants — are the bottleneck, not the accumulation
#: formulation; v1 sits within ~1.3x of that formulation's floor.
_MOVE_IMPLS = {
    1: _resample_move_cols,
    # Round-5: decode + dynamic-gather window lookup (see v6 block comment)
    # — the production default after the same-session in-engine A/B below.
    6: _resample_move_cols_v6,
}
#: Version 0 (decode-only + XLA gather) is handled specially in
#: :func:`resample_move_f`; valid APS_MOVE_VERSION values are {0} ∪ keys.
_VALID_MOVE_VERSIONS = frozenset({0}) | frozenset(_MOVE_IMPLS)
#: Versions with a windowed (sharded-exchange) form.  v0 decodes the whole
#: population, so the window wrappers fall back to the v1 staircase for it.
_WINDOWED_MOVE_VERSIONS = frozenset({1, 6})
# APS_MOVE_VERSION: measurement override for same-session A/B on shared
# hardware (the chip+host show a few percent of hour-scale drift, so absolute
# numbers across sessions don't settle 10%-class kernel questions).
DEFAULT_MOVE_VERSION = int(os.environ.get("APS_MOVE_VERSION", "6"))
if DEFAULT_MOVE_VERSION not in _VALID_MOVE_VERSIONS:
    raise ValueError(
        f"APS_MOVE_VERSION={DEFAULT_MOVE_VERSION} is not one of "
        f"{sorted(_VALID_MOVE_VERSIONS)} (pruned versions live at git tag "
        "pre-kernel-prune-r5)"
    )


def _resolve_version(version):
    ver = DEFAULT_MOVE_VERSION if version is None else version
    if ver not in _VALID_MOVE_VERSIONS:
        raise ValueError(
            f"unknown move-kernel version {ver}; valid: "
            f"{sorted(_VALID_MOVE_VERSIONS)}"
        )
    return ver


def _move_cols_grouped(
    impl, f, cols, n, start=None, n_out=None, interpret=False, guard=None
):
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
        return impl(
            f, cols, n, start=start, n_out=n_out, interpret=interpret,
            guard=guard,
        )
    if len(cols) <= 2 * g:
        anc = None
        ys = []
        for i in range(0, len(cols), g):
            anc_i, ys_i = impl(
                f, cols[i : i + g], n,
                start=start, n_out=n_out, interpret=interpret, guard=guard,
            )
            anc = anc_i if anc is None else anc
            ys.extend(ys_i)
        return anc, tuple(ys)
    anc, ys = impl(
        f, cols[:g], n, start=start, n_out=n_out, interpret=interpret,
        guard=guard,
    )
    anc_cl = jnp.clip(anc, 0, m - 1)
    rest = jnp.stack(cols[g:], axis=1)  # [m, d_rest]
    taken = jnp.take(rest, anc_cl, axis=0)
    # Kernel contract: slots whose owner is a sentinel row (at/past the drawn
    # population) move value 0; the clipped gather would leak the last row.
    taken = jnp.where((anc >= m)[:, None], 0.0, taken)
    return anc, tuple(ys) + tuple(taken[:, i] for i in range(taken.shape[1]))


def resample_move_f(
    f, state, n: int, interpret: bool = False, version: int = None,
    guard_n=None,
):
    """As :func:`resample_move`, but from precomputed extents ``f``
    (e.g. the output of :func:`extents_from_logw` — skipping the XLA
    normalise+cumsum chain entirely).

    ``version=0`` selects the decode-only kernel + whole-tree XLA gather
    (no in-kernel value move) — an A/B alternative to the fused kernels.
    """
    ver = _resolve_version(version)
    m = f.shape[0]
    if ver == 0:
        if guard_n is not None:
            f = f.at[m - 1].set(guard_n)
        anc = jnp.clip(decode_ancestors(f, n, interpret=interpret), 0, m - 1)
        moved = jax.tree_util.tree_map(
            lambda a: jnp.take(a, anc, axis=0), state
        )
        return anc, moved
    leaves, treedef, cols = _flatten_cols(state, m)
    anc, ys = _move_cols_grouped(
        _MOVE_IMPLS[ver], f, cols, n, interpret=interpret, guard=guard_n
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
    ver = _resolve_version(version)
    if ver not in _WINDOWED_MOVE_VERSIONS:
        # v0 (decode+gather) and v6 (whole-population lookup) have no
        # windowed form; the sharded exchange uses the v1 staircase — so an
        # APS_MOVE_VERSION A/B of the single-chip engine never breaks
        # sharded runs.
        ver = 1
    impl = _MOVE_IMPLS[ver]
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
    ver = _resolve_version(version)
    if ver not in _WINDOWED_MOVE_VERSIONS:
        # v0 (decode+gather) and v6 (whole-population lookup) have no
        # windowed form; the sharded exchange uses the v1 staircase — so an
        # APS_MOVE_VERSION A/B of the single-chip engine never breaks
        # sharded runs.
        ver = 1
    impl = _MOVE_IMPLS[ver]
    m = weights.shape[0]
    cdf = jnp.cumsum(weights)
    f = jnp.clip(jnp.ceil(n * cdf - u), 0, n).astype(jnp.int32)
    leaves, treedef, cols = _flatten_cols(state, m)
    anc, ys = _move_cols_grouped(
        impl, f, cols, n, start=start, n_out=n_out, interpret=interpret
    )
    anc = jnp.clip(anc, 0, m - 1)
    return anc, _unflatten_cols(leaves, treedef, ys, m, n_out)
