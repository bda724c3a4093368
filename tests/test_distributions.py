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
