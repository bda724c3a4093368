"""Vectorised resampling schemes.

The reference implements four ancestor-index samplers as sequential CDF walks
(``/root/reference/src/resampling.jl``: ``resample_systematic`` :149-183,
``resample_stratified`` :98-131, ``resample_multinomial`` :31-35,
``resample_residual`` :53-81, plus ``randcat`` :11-21 and the ESS-threshold wrapper
:193-204).  Those are O(N) scalar loops — exactly the shape TPUs are worst at.

Here each scheme is a single vectorised expression over the particle axis:
``cumsum`` of the weights plus a ``searchsorted`` (binary search batched on the VPU).
The math is identical: sample ``x_i = j`` iff ``u_i ∈ [cum_{j-1}, cum_j)``.

All resamplers share the signature ``resampler(key, weights, n) -> int32[n]`` where
``weights`` are normalised probabilities.  They are jit/vmap/shard_map-safe (fixed
shapes, no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils.trees import pytree_dataclass, static_field

__all__ = [
    "randcat",
    "randcat_gumbel",
    "resample_systematic",
    "resample_stratified",
    "resample_multinomial",
    "resample_residual",
    "stratified_extents",
    "multinomial_spacings",
    "DEFAULT_RESAMPLER",
    "ResampleWithESSThreshold",
    "effective_sample_size",
]


def _inverse_cdf(weights: jax.Array, us: jax.Array) -> jax.Array:
    """Map ordered or unordered uniforms ``us`` through the weight CDF.

    Returns ``idx`` with ``idx_i = j`` iff ``u_i ∈ [cum_{j-1}, cum_j)`` — the same
    selection rule as the reference's sequential walks
    (``/root/reference/src/resampling.jl:149-183``), computed as a batched binary
    search instead of a scalar loop.
    """
    cdf = jnp.cumsum(weights)
    # Clamp: floating cumsum of normalised weights may end slightly below 1.
    idx = jnp.searchsorted(cdf, us, side="right")
    return jnp.clip(idx, 0, weights.shape[0] - 1).astype(jnp.int32)


def randcat(key: jax.Array, weights: jax.Array) -> jax.Array:
    """One categorical draw by CDF inversion (reference ``randcat``,
    ``/root/reference/src/resampling.jl:11-21``)."""
    u = jax.random.uniform(key, dtype=weights.dtype)
    return _inverse_cdf(weights, u)


def randcat_gumbel(key: jax.Array, log_weights: jax.Array, gids=None) -> jax.Array:
    """One categorical draw ∝ ``exp(log_weights)`` by the Gumbel-max trick.

    Same distribution as :func:`randcat` ∘ softmax, but with no normalisation
    and no prefix scan: one positional-uniform pass, one Gumbel transform, one
    argmax.  On TPU at N ~ 1e6 this replaces a softmax (3 passes) + ``cumsum``
    (log-depth passes) with a single fused elementwise+reduce — the fast form
    for the per-step PGAS ancestor draw.  The per-element Gumbel is a pure
    function of ``(key, gids[i])`` (see :mod:`advancedps_tpu.rng`), and argmax
    tie-breaking is first-occurrence, so the draw is bit-identical between
    single-chip and sharded layouts (the sharded form is a local argmax plus
    two scalar collectives — see ``parallel/sharded.py``).
    """
    from . import rng as rngmod

    if gids is None:
        gids = jnp.arange(log_weights.shape[0])
    u = rngmod.pos_uniform(key, gids)
    # u = 0 (prob 2^-24 per element) ⇒ gumbel = -inf ⇒ that slot is excluded
    # from this draw — a O(2^-24) total-variation perturbation, harmless.
    z = log_weights - jnp.log(-jnp.log(u))
    return jnp.argmax(z).astype(jnp.int32)


def _systematic_searchsorted(u, weights, n):
    us = (u + jnp.arange(n, dtype=weights.dtype)) / n
    return _inverse_cdf(weights, us)


def _scatter_decode(f, n):
    """Run-length decode of nondecreasing int32 extents ``f`` (length ``m``,
    values in [0, n]) into the ancestor vector ``anc[k] = #{j : f_j ≤ k}`` by
    scatter + cumulative max.  No binary search, no sort: on TPU this is ~10×
    faster inside a ``lax.scan`` than XLA's scan-based ``searchsorted``
    lowering (measured ~15 ms vs ~139 ms per 1M-particle step on v5e)."""
    m = f.shape[0]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), f[:-1]])
    counts = f - starts
    j = jnp.arange(m, dtype=jnp.int32)
    # Runs with count > 0 have distinct start slots; drop empty runs.
    tgt = jnp.where(counts > 0, starts, n)
    s = jnp.zeros((n,), jnp.int32).at[tgt].max(j, mode="drop", unique_indices=True)
    return jax.lax.cummax(s)


def _systematic_scatter(u, weights, n):
    """Search-free systematic resampling via the closed-form extents
    ``f_j = ceil(n·cdf_j − u)`` (the number of equally-spaced positions below
    each CDF entry) + :func:`_scatter_decode`.

    Accuracy note: ``n·cdf`` in float32 rounds at the ~0.06 ulp level for
    n ~ 1e6, flipping ~0.2% of indices by ±1 slot relative to exact arithmetic —
    statistically equivalent to perturbing ``u`` per-entry by ~1e-7; the same
    order as the float32 ``cumsum`` rounding both formulations share.
    """
    cdf = jnp.cumsum(weights)
    f = jnp.clip(jnp.ceil(n * cdf - u), 0, n).astype(jnp.int32)
    return _scatter_decode(f, n)


# Particle count above which the scatter formulation wins on TPU.
_TPU_SCATTER_MIN_N = 16384


def resample_systematic(key: jax.Array, weights: jax.Array, n: int) -> jax.Array:
    """Systematic resampling: one shared uniform, ``u_k = (u + k) / n``.

    Reference: ``/root/reference/src/resampling.jl:149-183``.  On TPU at large N
    the search-free scatter formulation is used (see ``_systematic_scatter``).
    """
    u = jax.random.uniform(key, dtype=weights.dtype)
    if jax.default_backend() == "tpu" and n >= _TPU_SCATTER_MIN_N:
        return _systematic_scatter(u, weights, n)
    return _systematic_searchsorted(u, weights, n)


def stratified_extents(key: jax.Array, c: jax.Array, n: int) -> jax.Array:
    """Stratified-resampling extents ``f_j = #{k : (k + u_k)/n ≤ cdf_j}``
    from the scaled CDF ``c = n·cdf`` — closed form, ONE positional-cipher
    evaluation per particle, no gather.

    Because ``u_k`` is a pure function of ``(key, k)``
    (:func:`advancedps_tpu.rng.pos_uniform`), the count has the closed form
    ``f_j = ⌊c_j⌋ + [u_{⌊c_j⌋} ≤ c_j − ⌊c_j⌋]``: every stratum fully below
    ``c_j`` contributes 1, and the boundary stratum contributes its own
    uniform's indicator — evaluated *positionally* at the data-dependent
    stratum index, which on TPU is elementwise cipher arithmetic, not a
    gather.  Nondecreasing by construction (same uniform at equal boundary
    strata).  Same f32 ``n·cdf`` rounding class as the systematic extents.
    """
    from . import rng as rngmod

    c = jnp.clip(c, 0.0, float(n))
    kj = jnp.minimum(jnp.floor(c), float(n - 1))
    ku = rngmod.pos_uniform(key, kj.astype(jnp.int32))
    f = jnp.where(c >= float(n), float(n), kj + (ku <= c - kj))
    return f.astype(jnp.int32)


def resample_stratified(key: jax.Array, weights: jax.Array, n: int) -> jax.Array:
    """Stratified resampling: position ``k`` draws ``(k + u_k)/n`` with its own
    uniform ``u_k``.

    Reference: ``/root/reference/src/resampling.jl:98-131``.  ``u_k`` is
    *positional* (a pure function of ``(key, k)``), which makes the three
    formulations of this scheme consume identical randomness: this
    searchsorted form, the scatter form used on TPU at large ``n``, and the
    engine's fused Pallas pipeline (:func:`stratified_extents` +
    ``resample_move_f``) — they agree up to the documented ±1 f32 boundary
    flips.
    """
    from . import rng as rngmod

    if jax.default_backend() == "tpu" and n >= _TPU_SCATTER_MIN_N:
        c = n * jnp.cumsum(weights)
        return _scatter_decode(stratified_extents(key, c, n), n)
    u = rngmod.pos_uniform(key, jnp.arange(n)).astype(weights.dtype)
    us = (u + jnp.arange(n, dtype=weights.dtype)) / n
    return _inverse_cdf(weights, us)


def multinomial_spacings(key: jax.Array, n: int) -> jax.Array:
    """``n + 1`` positional Exp(1) gaps for the sorted-uniform construction
    (Devroye 1986, §V.3): the n sorted uniforms are ``S_k / S_n`` for the
    inclusive prefix sums ``S`` of these gaps.  Used by the engine's fused
    multinomial path; ``-log1p(-u)`` keeps the gap finite at ``u = 0``."""
    from . import rng as rngmod

    u = rngmod.pos_uniform(key, jnp.arange(n + 1))
    return -jnp.log1p(-u)


def resample_multinomial(key: jax.Array, weights: jax.Array, n: int) -> jax.Array:
    """Multinomial resampling: n iid categorical draws.

    Reference: ``/root/reference/src/resampling.jl:31-35``.  Uniforms are
    positional (pure functions of ``(key, k)``).  Note the engine's fused
    TPU path draws the *sorted* uniforms directly via
    :func:`multinomial_spacings` — a different (equally distributed) random
    variable, so its ancestor vector is the sorted version of a different
    draw; offspring counts are Multinomial(n, w) in both.
    """
    from . import rng as rngmod

    us = rngmod.pos_uniform(key, jnp.arange(n)).astype(weights.dtype)
    return _inverse_cdf(weights, us)


def resample_residual(key: jax.Array, weights: jax.Array, n: int) -> jax.Array:
    """Residual resampling: ``floor(n·w_i)`` deterministic copies of particle ``i``,
    remaining slots multinomial on the residual weights.

    Reference: ``/root/reference/src/resampling.jl:53-81``.  Vectorised formulation:
    with ``c = cumsum(floor(n·w))`` the deterministic copies occupy output slots
    ``k < c[-1]`` and slot ``k`` holds ``searchsorted(c, k, 'right')``; the remaining
    slots draw from the residual distribution.  Fixed shapes throughout (the
    data-dependent count of deterministic copies becomes a mask, not a shape).
    """
    scaled = n * weights
    floors = jnp.floor(scaled)
    residuals = scaled - floors
    counts_cdf = jnp.cumsum(floors)
    n_det = counts_cdf[-1]  # number of deterministic copies (traced scalar)

    slots = jnp.arange(n, dtype=weights.dtype)
    det_idx = jnp.searchsorted(counts_cdf, slots, side="right")
    det_idx = jnp.clip(det_idx, 0, weights.shape[0] - 1).astype(jnp.int32)

    res_total = jnp.sum(residuals)
    # Guard the fully-deterministic case (all residuals zero).
    safe = jnp.where(res_total > 0, res_total, 1.0)
    res_weights = residuals / safe
    res_idx = resample_multinomial(key, res_weights, n)

    return jnp.where(slots < n_det, det_idx, res_idx)


DEFAULT_RESAMPLER = resample_systematic


def effective_sample_size(weights: jax.Array) -> jax.Array:
    """ESS = 1 / Σ wᵢ² of normalised weights
    (reference ``effectiveSampleSize``, ``/root/reference/src/container.jl:116-119``)."""
    return 1.0 / jnp.sum(jnp.square(weights))


@pytree_dataclass
class ResampleWithESSThreshold:
    """Resample with ``resampler`` iff ESS ≤ ``threshold · n``.

    Reference: ``/root/reference/src/resampling.jl:193-204`` with defaults
    (systematic, 0.5) and the gate ``ess ≤ threshold * n`` in
    ``/root/reference/src/container.jl:242-244``.  Inside ``jit`` the gate is a
    branchless select in the sweep engine — both the resampled ancestor indices and
    the identity permutation are cheap, so we compute the indices and ``where`` on
    the gate (SURVEY.md §7 hard part (c)).
    """

    resampler: object = static_field(default=DEFAULT_RESAMPLER)
    threshold: float = static_field(default=0.5)

    def __call__(self, key, weights, n):
        return self.resampler(key, weights, n)

    def should_resample(self, weights, n):
        return effective_sample_size(weights) <= self.threshold * n


def as_gated_resampler(resampler) -> ResampleWithESSThreshold:
    """Normalise a bare resampler function to an always-on gated resampler."""
    if isinstance(resampler, ResampleWithESSThreshold):
        return resampler
    # A bare function resamples every step (threshold 1.0 ⇒ ESS ≤ N always holds).
    return ResampleWithESSThreshold(resampler=resampler, threshold=float("inf"))
