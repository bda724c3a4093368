"""Fused fast paths for stratified and multinomial resampling (round-5).

Both schemes reduce to the monotone-extents problem the fused decode+move
kernel solves (reference treats all four resamplers as first-class peers,
``/root/reference/src/resampling.jl:31-35,98-131``):

* stratified positions ``(k + u_k)/n`` are sorted by construction, and with
  POSITIONAL uniforms the extent has a gather-free closed form
  (``resampling.stratified_extents``);
* multinomial uniforms are generated *sorted* via the exponential-spacings
  order-statistics construction (``resampling.multinomial_spacings`` +
  prefix sum + ``count_le_sorted``).

These tests pin the Pallas primitives (interpret mode) against XLA/numpy
formulas, and the end-to-end ancestor vectors against the native C++
sequential CDF-walk oracle fed the identical uniforms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedps_tpu import rng as rngmod
from advancedps_tpu.ops import native
from advancedps_tpu.ops.pallas_resample import (
    count_le_sorted,
    prefix_sum,
    resample_move_f,
    scaled_prefix_from_logw,
)
from advancedps_tpu.resampling import (
    _inverse_cdf,
    multinomial_spacings,
    resample_stratified,
    stratified_extents,
)


# --- Pallas primitives (interpret mode) --------------------------------------


@pytest.mark.parametrize("m", [1000, 4096, 5000, 70])
def test_scaled_prefix_matches_xla(m):
    rng = np.random.default_rng(m)
    logw = jnp.asarray(rng.standard_normal(m).astype(np.float32) * 3)
    mx = jnp.max(logw)
    scale = jnp.float32(7.25)
    want = np.asarray(jnp.cumsum(jnp.exp(logw - mx)) * scale)
    got = np.asarray(scaled_prefix_from_logw(logw, mx, scale, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-5)
    assert (np.diff(got) >= 0).all()  # monotone (nonneg summands)


@pytest.mark.parametrize("m", [1000, 4096, 20000])
def test_prefix_sum_matches_cumsum(m):
    rng = np.random.default_rng(m + 1)
    x = jnp.asarray(rng.exponential(size=m).astype(np.float32))
    want = np.cumsum(np.asarray(x, np.float64))
    got = np.asarray(prefix_sum(x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=3e-6)
    assert (np.diff(got) >= 0).all()


@pytest.mark.parametrize("ns,nt", [(1000, 1000), (4096, 3000), (3000, 4096), (100, 5000)])
def test_count_le_sorted_matches_searchsorted(ns, nt):
    rng = np.random.default_rng(ns * 3 + nt)
    s = np.sort(rng.exponential(size=ns).cumsum().astype(np.float32))
    t = np.sort((rng.random(nt) * s[-1] * 1.05).astype(np.float32))
    want = np.searchsorted(s, t, side="right")  # #{k: s_k <= t_j}
    got = np.asarray(count_le_sorted(jnp.asarray(s), jnp.asarray(t), interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ns,nt", [(1000, 1000), (4096, 3000), (100, 5000), (20000, 20000)])
def test_count_le_sorted_bs_matches_dense(ns, nt):
    # Binary-search merge-count (round 5) must equal the dense form exactly.
    from advancedps_tpu.ops.pallas_resample import count_le_sorted_bs

    rng = np.random.default_rng(ns + 7 * nt)
    s = np.sort(rng.exponential(size=ns).cumsum().astype(np.float32))
    t = np.sort((rng.random(nt) * s[-1] * 1.05).astype(np.float32))
    want = np.searchsorted(s, t, side="right")
    got = np.asarray(
        count_le_sorted_bs(jnp.asarray(s), jnp.asarray(t), interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_decode_ancestors_bs_matches_dense():
    # Binary-search decode (round 5, the v6 default) vs the dense staircase.
    from advancedps_tpu.ops.pallas_resample import (
        decode_ancestors,
        decode_ancestors_bs,
    )

    rng = np.random.default_rng(3)
    for m, n, skew in [(5000, 4097, 0.3), (20000, 20000, 0.3), (3000, 8192, None)]:
        if skew is None:
            w = np.full(m, 1e-12)
            w[rng.integers(m, size=4)] = 1.0
        else:
            w = rng.gamma(skew, size=m)
        w = (w / w.sum()).astype(np.float32)
        f = jnp.clip(
            jnp.ceil(n * jnp.cumsum(jnp.asarray(w)) - 0.3), 0, n
        ).astype(jnp.int32)
        a = np.asarray(decode_ancestors(f, n, interpret=True))
        b = np.asarray(decode_ancestors_bs(f, n, interpret=True))
        np.testing.assert_array_equal(a, b)


def test_count_le_sorted_extremes():
    s = jnp.asarray(np.arange(1, 2049, dtype=np.float32))
    # thresholds below every value, between, above every value
    t = jnp.asarray(np.asarray([0.0, 0.5, 1.0, 1024.5, 2048.0, 9999.0], np.float32))
    got = np.asarray(count_le_sorted(s, t, interpret=True))
    np.testing.assert_array_equal(got, [0, 0, 1, 1024, 2048, 2048])


def test_count_le_sorted_long_stall():
    # One tiny threshold block, values spanning many chunks: the walk must
    # consume all chunks in the final (padded) region without overcounting.
    ns = 8192
    s = jnp.asarray(np.linspace(0.0, 1.0, ns, dtype=np.float32))
    t = jnp.asarray(np.asarray([0.25, 0.5, 1.0], np.float32))
    got = np.asarray(count_le_sorted(s, t, interpret=True))
    want = np.searchsorted(np.asarray(s), np.asarray(t), side="right")
    np.testing.assert_array_equal(got, want)


# --- stratified: closed-form extents -----------------------------------------


def _np_weights(m, seed):
    w = np.abs(np.random.default_rng(seed).standard_normal(m)).astype(np.float32)
    return w / w.sum()


@pytest.mark.parametrize("m,n", [(2048, 2048), (1000, 4096), (5000, 3000)])
def test_stratified_extents_match_searchsorted_formulation(m, n):
    key = jax.random.key(m + n)
    w = jnp.asarray(_np_weights(m, seed=m))
    c = n * jnp.cumsum(w)
    f = np.asarray(stratified_extents(key, c, n))
    # reference: count positions (k + u_k)/n <= cdf_j directly
    us = np.asarray(rngmod.pos_uniform(key, jnp.arange(n)))
    pos = (us + np.arange(n)) / n
    cdf = np.asarray(jnp.cumsum(w))
    want = np.searchsorted(np.sort(pos), cdf, side="right")
    # f32 n*cdf rounding: ±1 flips at stratum boundaries only
    diff = np.abs(f.astype(np.int64) - want.astype(np.int64))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
    assert (np.diff(f) >= 0).all() and f.min() >= 0 and f.max() <= n


@pytest.mark.parametrize("m,n", [(2048, 2048), (4096, 1024)])
def test_stratified_fast_path_matches_native_oracle(m, n):
    if not native.available():
        pytest.skip("native oracle unavailable")
    key = jax.random.key(17 * m + n)
    w = _np_weights(m, seed=3)
    us = np.asarray(rngmod.pos_uniform(key, jnp.arange(n)), np.float32)
    want = native.stratified(us, w, n)
    c = n * jnp.cumsum(jnp.asarray(w))
    f = stratified_extents(key, c, n)
    anc, moved = resample_move_f(
        f, jnp.arange(m, dtype=jnp.float32), n, interpret=True
    )
    agree = (np.asarray(anc) == want).mean()
    assert agree > 0.999, agree
    np.testing.assert_array_equal(np.asarray(moved), np.asarray(anc, np.float32))


def test_resample_stratified_positional_searchsorted_agrees_with_extents():
    # The standalone searchsorted form and the extents form consume the SAME
    # positional uniforms — they must agree up to ±1 boundary flips.
    m = n = 3000
    key = jax.random.key(5)
    w = jnp.asarray(_np_weights(m, seed=9))
    got_search = np.asarray(resample_stratified(key, w, n))
    c = n * jnp.cumsum(w)
    f = stratified_extents(key, c, n)
    anc = np.searchsorted(np.asarray(f), np.arange(n), side="right")
    anc = np.clip(anc, 0, m - 1)
    assert (got_search == anc).mean() > 0.999


def test_stratified_extents_degenerate_weights():
    # single survivor: every position lands in its stratum
    m = n = 2048
    key = jax.random.key(0)
    w = jnp.zeros(m).at[777].set(1.0)
    c = n * jnp.cumsum(w)
    f = np.asarray(stratified_extents(key, c, n))
    assert f[776] == 0 and f[777] == n and f[-1] == n


# --- multinomial: sorted-spacings construction -------------------------------


def _multinomial_fast_anc(key, w, n, m):
    g = multinomial_spacings(key, n)
    S = prefix_sum(g, interpret=True)
    mx = jnp.max(jnp.log(w))
    thr = scaled_prefix_from_logw(
        jnp.log(w), mx, S[n] / jnp.sum(jnp.exp(jnp.log(w) - mx)), interpret=True
    )
    f = count_le_sorted(S[:n], thr, interpret=True)
    anc, moved = resample_move_f(
        f, jnp.arange(m, dtype=jnp.float32), n, interpret=True
    )
    return np.asarray(anc), S


@pytest.mark.parametrize("m,n", [(2048, 2048), (1024, 4096)])
def test_multinomial_fast_path_matches_native_oracle(m, n):
    if not native.available():
        pytest.skip("native oracle unavailable")
    key = jax.random.key(23 * m + n)
    w = _np_weights(m, seed=11)
    anc, S = _multinomial_fast_anc(key, jnp.asarray(w), n, m)
    # oracle fed the identical sorted positions S_k / S_n
    pos = (np.asarray(S[:n], np.float64) / float(S[n])).astype(np.float32)
    want = native.multinomial(pos, w, n)
    agree = (anc == want).mean()
    assert agree > 0.999, agree
    assert (np.diff(anc) >= 0).all()  # sorted draws => sorted ancestors


def test_multinomial_fast_path_offspring_distribution():
    # Offspring counts must be Multinomial(n, w): mean n·w_j, the frequency
    # oracle tolerance class of /root/reference/test/resampling.jl:14-15.
    m = 3
    n = 100_000
    w = jnp.asarray([0.3, 0.4, 0.3], jnp.float32)
    key = jax.random.key(42)
    anc, _ = _multinomial_fast_anc(key, w, n, m)
    freq = np.bincount(anc, minlength=m) / n
    np.testing.assert_allclose(freq, np.asarray(w), atol=1e-2)


def test_multinomial_spacings_are_finite_positive():
    g = np.asarray(multinomial_spacings(jax.random.key(1), 100_000))
    assert g.shape == (100_001,)
    assert np.isfinite(g).all() and (g >= 0).all()


# --- engine integration (CPU fallback path, statistical) ---------------------


def test_engine_sweep_with_each_scheme_matches_kalman():
    # All three fused-capable schemes through the public sweep on the CPU
    # fallback path: logZ must approximate the exact Kalman evidence.
    import advancedps_tpu as aps
    from advancedps_tpu.resampling import (
        ResampleWithESSThreshold,
        resample_multinomial,
        resample_stratified,
        resample_systematic,
    )

    a, q, r = 0.9, 0.32, 1.0
    import math

    sigma0 = math.sqrt(q * q / (1 - a * a))
    model = aps.models.stationary_lgssm(a=a, q=q, r=r)
    key = jax.random.key(7)
    _, ys = aps.simulate(key, model, 25)
    traced = aps.TracedSSM(model, ys)
    kf = aps.utils.kalman_filter(np.asarray(ys), a, 0.0, q, 1.0, r, 0.0, sigma0)
    for scheme in (resample_systematic, resample_stratified, resample_multinomial):
        smc = aps.SMC(2000, resampler=ResampleWithESSThreshold(resampler=scheme))
        out = aps.sample(jax.random.fold_in(key, 1), traced, smc)
        assert abs(float(out.log_evidence) - float(kf.log_likelihood)) < 0.5, (
            scheme.__name__,
            float(out.log_evidence),
            float(kf.log_likelihood),
        )
