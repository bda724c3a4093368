"""Distribution layer: log_prob vs scipy, sampling moments.

The reference gets these from Distributions.jl for free; here they are load-bearing
framework code, so we pin parameterisations (std-dev Normals, shape/scale Gamma —
SURVEY.md §7 hard part (e)) against scipy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from advancedps_tpu.distributions import (
    Bernoulli,
    Beta,
    Categorical,
    Exponential,
    Gamma,
    LogNormal,
    MvNormal,
    Normal,
    Poisson,
    StudentT,
    Uniform,
)

KEY = jax.random.key(0)


@pytest.mark.parametrize(
    "dist,ref,xs",
    [
        (Normal(0.5, 2.0), st.norm(0.5, 2.0), [-1.0, 0.0, 3.0]),
        (Gamma(2.0, 3.0), st.gamma(2.0, scale=3.0), [0.5, 2.0, 10.0]),
        (Beta(2.0, 5.0), st.beta(2.0, 5.0), [0.1, 0.5, 0.9]),
        (Uniform(-1.0, 3.0), st.uniform(-1.0, 4.0), [0.0, 2.0]),
        (Exponential(2.0), st.expon(scale=2.0), [0.1, 1.0, 5.0]),
        (LogNormal(0.3, 0.8), st.lognorm(0.8, scale=np.exp(0.3)), [0.5, 1.0, 4.0]),
        (StudentT(4.0, 1.0, 2.0), st.t(4.0, loc=1.0, scale=2.0), [-2.0, 1.0, 3.0]),
        (Poisson(2.5), st.poisson(2.5), [0.0, 2.0, 7.0]),
        (Bernoulli(0.3), st.bernoulli(0.3), [0.0, 1.0]),
    ],
)
def test_log_prob_matches_scipy(dist, ref, xs):
    xs = np.asarray(xs)
    got = np.asarray(dist.log_prob(jnp.asarray(xs)))
    discrete = hasattr(ref.dist, "pmf")
    want = ref.logpmf(xs) if discrete else ref.logpdf(xs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_normal_sampling_moments():
    d = Normal(1.5, 0.7)
    s = d.sample(KEY, (200_000,))
    assert abs(float(s.mean()) - 1.5) < 0.01
    assert abs(float(s.std()) - 0.7) < 0.01


def test_gamma_sampling_moments():
    d = Gamma(2.0, 3.0)
    s = d.sample(KEY, (200_000,))
    assert abs(float(s.mean()) - 6.0) < 0.1
    assert abs(float(s.var()) - 18.0) < 0.7


def test_bernoulli_extreme_p_exact():
    # Bernoulli(1) must give log_prob(1)=0 exactly; Bernoulli(0.5) gives -log 2 —
    # the analytic log-evidence oracle depends on this
    # (/root/reference/test/smc.jl:84-104).
    assert float(Bernoulli(1.0).log_prob(1.0)) == 0.0
    np.testing.assert_allclose(
        float(Bernoulli(0.5).log_prob(1.0)), -np.log(2.0), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(Bernoulli(0.5).log_prob(0.0)), -np.log(2.0), rtol=1e-6
    )


def test_mvnormal_logprob_matches_scipy():
    mean = np.array([0.5, -1.0])
    cov = np.array([[2.0, 0.3], [0.3, 1.0]])
    d = MvNormal(jnp.asarray(mean), jnp.asarray(cov))
    x = np.array([0.2, 0.1])
    np.testing.assert_allclose(
        float(d.log_prob(jnp.asarray(x))),
        st.multivariate_normal(mean, cov).logpdf(x),
        rtol=1e-5,
    )


def test_mvnormal_batched_params():
    # per-particle mean/cov (as the Lévy SSM needs)
    means = jnp.stack([jnp.zeros(2), jnp.ones(2)])
    covs = jnp.stack([jnp.eye(2), 2.0 * jnp.eye(2)])
    d = MvNormal(means, covs)
    s = d.sample(KEY)
    assert s.shape == (2, 2)
    lp = d.log_prob(s)
    assert lp.shape == (2,)
    for i in range(2):
        np.testing.assert_allclose(
            float(lp[i]),
            st.multivariate_normal(np.asarray(means[i]), np.asarray(covs[i])).logpdf(
                np.asarray(s[i])
            ),
            rtol=1e-4,
        )


def test_categorical():
    d = Categorical(jnp.array([0.2, 0.5, 0.3]))
    s = d.sample(KEY, (100_000,))
    freqs = np.bincount(np.asarray(s), minlength=3) / 100_000
    np.testing.assert_allclose(freqs, [0.2, 0.5, 0.3], atol=0.01)
    np.testing.assert_allclose(float(d.log_prob(1)), np.log(0.5), rtol=1e-6)


def test_distributions_are_pytrees():
    d = Normal(jnp.zeros(3), jnp.ones(3))
    leaves = jax.tree_util.tree_leaves(d)
    assert len(leaves) == 2
    d2 = jax.tree_util.tree_map(lambda x: x * 2, d)
    assert isinstance(d2, Normal)


def test_vmap_over_distribution_params():
    locs = jnp.arange(4.0)

    def lp(loc):
        return Normal(loc, 1.0).log_prob(0.0)

    got = jax.vmap(lp)(locs)
    want = np.array([st.norm(l, 1.0).logpdf(0.0) for l in range(4)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


# --- positional fast paths (round-4: Poisson & Categorical, verdict #9) ------
#
# Contract (rng.py): element i of sample_positional(key, gids) is a pure
# function of (key, gids[i]) — never of the batch layout — so sharded sweeps
# and O(T) single-particle replay reproduce the same draws bit-exactly.


def _layout_independent(dist):
    gids = jnp.arange(64)
    full = dist.sample_positional(KEY, gids)
    lo = dist.sample_positional(KEY, gids[:32])
    hi = dist.sample_positional(KEY, gids[32:])
    np.testing.assert_array_equal(np.asarray(full[:32]), np.asarray(lo))
    np.testing.assert_array_equal(np.asarray(full[32:]), np.asarray(hi))
    shuffled = jnp.asarray([5, 63, 17, 0])
    sub = dist.sample_positional(KEY, shuffled)
    np.testing.assert_array_equal(
        np.asarray(sub), np.asarray(full)[np.asarray(shuffled)]
    )


def test_poisson_positional_layout_independent():
    _layout_independent(Poisson(3.5))


def test_categorical_positional_layout_independent():
    _layout_independent(Categorical(jnp.asarray([0.2, 0.5, 0.1, 0.2])))


@pytest.mark.parametrize("rate", [0.3, 2.5, 30.0])
def test_poisson_positional_frequencies(rate):
    n = 200_000
    s = np.asarray(Poisson(rate).sample_positional(KEY, jnp.arange(n)))
    assert s.min() >= 0 and (s == np.round(s)).all()
    # mean/variance within MC error
    np.testing.assert_allclose(s.mean(), rate, rtol=0.02)
    np.testing.assert_allclose(s.var(), rate, rtol=0.05)
    # exact pmf check on the head of the support
    ref = st.poisson(rate)
    for k in range(int(rate + 3)):
        np.testing.assert_allclose(
            (s == k).mean(), ref.pmf(k), atol=4.0 / np.sqrt(n)
        )


def test_poisson_positional_large_rate_fallback():
    # λ > 87 underflows the f32 exp(−λ) seed; the traced gate must route to
    # the per-gid fallback and still return a valid positional draw.
    n = 50_000
    rate = 120.0
    s = np.asarray(Poisson(rate).sample_positional(KEY, jnp.arange(n)))
    np.testing.assert_allclose(s.mean(), rate, rtol=0.02)
    np.testing.assert_allclose(s.var(), rate, rtol=0.08)
    _layout_independent(Poisson(rate))


def test_poisson_positional_batched_rates():
    # Batched (per-particle) rates: the caller slices parameters along with
    # gids (as sharded sweeps slice state), and draws stay positional.
    rates = jnp.asarray([0.5, 4.0, 9.0, 1.0] * 16)  # batch (64,)
    gids = jnp.arange(64)
    full = Poisson(rates).sample_positional(KEY, gids)
    assert full.shape == (64,)
    lo = Poisson(rates[:32]).sample_positional(KEY, gids[:32])
    hi = Poisson(rates[32:]).sample_positional(KEY, gids[32:])
    np.testing.assert_array_equal(np.asarray(full[:32]), np.asarray(lo))
    np.testing.assert_array_equal(np.asarray(full[32:]), np.asarray(hi))


def test_categorical_positional_frequencies():
    n = 300_000
    p = np.asarray([0.3, 0.4, 0.3], np.float32)
    s = np.asarray(
        Categorical(jnp.asarray(p)).sample_positional(KEY, jnp.arange(n))
    )
    assert s.dtype == np.int32 and s.min() >= 0 and s.max() <= 2
    for k in range(3):
        np.testing.assert_allclose((s == k).mean(), p[k], atol=3e-3)


def test_categorical_positional_batched_probs():
    # per-particle probabilities: particle i draws from its own row
    n = 100_000
    probs = jnp.stack(
        [jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 0.2, 0.8])]
    )
    probs = jnp.tile(probs, (n // 2, 1))
    s = np.asarray(Categorical(probs).sample_positional(KEY, jnp.arange(n)))
    assert (s[0::2] == 0).all()
    assert set(np.unique(s[1::2])) <= {1, 2}
    np.testing.assert_allclose((s[1::2] == 2).mean(), 0.8, atol=5e-3)


def test_poisson_positional_cdf_saturation_terminates():
    # Round-4 advisor finding (medium): for rates where the f32 cdf saturates
    # below the largest representable uniform (e.g. λ = 1, 10, 60, 86), a
    # draw with u ≥ csum_final used to spin the whole batch 65536 iterations
    # and return the runaway-guard value 65536.0.  gid 1900208 at λ=60 under
    # key 0 is such a draw; the p>0-gated walk must return a sane tail value.
    key = jax.random.key(0)
    gids = jnp.asarray([1900208, 0, 1, 2])
    out = np.asarray(Poisson(60.0).sample_positional(key, gids))
    assert out[0] < 200.0, out  # extreme-tail draw, not the runaway guard
    assert (out >= 0).all() and (out < 200.0).all()


# --- positional Gamma/Beta/StudentT (round-5, verdict #7): bounded-attempt
# Marsaglia–Tsang on positional counters --------------------------------------


@pytest.mark.parametrize("alpha", [0.5, 1.0, 2.0, 7.5])
def test_gamma_positional_ks_vs_scipy(alpha):
    n = 200_000
    s = np.asarray(Gamma(alpha, 1.0).sample_positional(KEY, jnp.arange(n)))
    assert (s >= 0).all() and np.isfinite(s).all()
    # subsample for KS power/runtime balance
    p = st.kstest(s[:50_000], st.gamma(alpha).cdf).pvalue
    assert p > 1e-3, (alpha, p)


def test_gamma_positional_scale_and_batched_params():
    n = 100_000
    alphas = jnp.where(jnp.arange(n) % 2 == 0, 0.7, 4.0)
    s = np.asarray(Gamma(alphas, 2.0).sample_positional(KEY, jnp.arange(n)))
    m0, m1 = s[0::2].mean(), s[1::2].mean()
    np.testing.assert_allclose(m0, 0.7 * 2.0, rtol=0.03)
    np.testing.assert_allclose(m1, 4.0 * 2.0, rtol=0.03)


@pytest.mark.parametrize("a,b", [(2.0, 5.0), (0.5, 0.5), (3.0, 1.0)])
def test_beta_positional_ks_vs_scipy(a, b):
    n = 100_000
    s = np.asarray(Beta(a, b).sample_positional(KEY, jnp.arange(n)))
    assert ((s >= 0) & (s <= 1)).all()
    p = st.kstest(s[:50_000], st.beta(a, b).cdf).pvalue
    assert p > 1e-3, (a, b, p)


@pytest.mark.parametrize("df", [3.0, 10.0])
def test_studentt_positional_ks_vs_scipy(df):
    n = 100_000
    s = np.asarray(StudentT(df, 1.0, 2.0).sample_positional(KEY, jnp.arange(n)))
    p = st.kstest(s[:50_000], st.t(df, loc=1.0, scale=2.0).cdf).pvalue
    assert p > 1e-3, (df, p)


def test_gamma_beta_t_positional_layout_independent():
    _layout_independent(Gamma(2.0, 3.0))
    _layout_independent(Gamma(0.6, 1.0))  # boost branch
    _layout_independent(Beta(2.0, 5.0))
    _layout_independent(StudentT(4.0, 0.0, 1.0))


def test_gamma_positional_streams_do_not_collide():
    # Gamma/Beta internal attempt streams ride double-folded keys, so sites
    # with different draw indices (and different families) stay independent.
    from advancedps_tpu import rng as rngmod

    gids = jnp.arange(4096)
    key = rngmod.step_key(KEY, rngmod.PROPAGATE, 3)
    rng = rngmod.StepRng(key=key, gids=gids)
    g0 = np.asarray(Gamma(2.0, 1.0).sample_rng(rng, 0))
    g1 = np.asarray(Gamma(2.0, 1.0).sample_rng(rng, 1))
    b0 = np.asarray(Beta(2.0, 2.0).sample_rng(rng, 0))
    assert not np.array_equal(g0, g1)
    assert abs(np.corrcoef(g0, g1)[0, 1]) < 0.05
    assert abs(np.corrcoef(g0, b0)[0, 1]) < 0.05
