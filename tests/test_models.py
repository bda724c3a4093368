"""Model-family tests: the four reference example configs as code
(gaussian-ssm, particle-gibbs SV, levy-ssm, gaussian-process — SURVEY.md §2.15).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import advancedps_tpu as aps
from advancedps_tpu.models import (
    GammaProcess,
    gp_ssm,
    levy_ssm,
    stationary_lgssm,
    stochastic_volatility_ssm,
)


def test_stationary_lgssm_prior_variance():
    # Stationary prior σ0² = q²/(1−a²) (examples/gaussian-ssm/script.jl:64-69).
    m = stationary_lgssm(a=0.9, q=0.32, r=1.0)
    sigma0 = float(m.prior.sigma)
    np.testing.assert_allclose(sigma0, math.sqrt(0.32**2 / (1 - 0.81)), rtol=1e-6)


def test_sv_model_observation_scale():
    m = stochastic_volatility_ssm(a=0.9, q=0.5)
    d = m.observation.distribution(0, jnp.asarray(2.0))
    np.testing.assert_allclose(float(d.scale), math.exp(1.0), rtol=1e-6)
    assert float(d.loc) == 0.0


class TestGammaProcess:
    def test_masked_simulation_shapes(self):
        gp = GammaProcess(C=1.0, beta=1.0, max_jumps=32)
        jumps, times, mask = gp.simulate(jax.random.key(0), 0.5, 0.0, 0.5)
        assert jumps.shape == times.shape == mask.shape == (32,)
        assert bool((times >= 0.0).all() and (times <= 0.5).all())

    def test_jump_budget_sufficient(self):
        # The masked tail must be dead: the last candidate jump should be far
        # below tolerance, i.e. the static budget covers the dynamic loop.
        gp = GammaProcess(C=1.0, beta=1.0, max_jumps=64)
        for s in range(5):
            jumps, _, mask = gp.simulate(jax.random.key(s), 0.5, 0.0, 0.5)
            assert not bool(mask[-1]), "jump budget too small"

    def test_moments_against_numpy_loop(self):
        # Oracle: a direct NumPy transcription of the reference's while-loop
        # (examples/levy-ssm/script.jl:21-40) — total masses must agree in
        # distribution; compare means over many paths.
        import numpy as np

        rng = np.random.default_rng(0)

        def numpy_total(C=1.0, beta=1.0, rate=0.5, tol=1e-10):
            total, t, last = 0.0, 0.0, np.inf
            while not last < tol:
                t += rng.exponential(1.0 / rate)
                xi = 1.0 / (beta * (np.exp(t / C) - 1.0))
                if rng.random() < (1.0 + beta * xi) * np.exp(-beta * xi):
                    total += xi
                    last = xi
            return total

        np_totals = np.array([numpy_total() for _ in range(3000)])

        gp = GammaProcess(C=1.0, beta=1.0, max_jumps=64)

        def jax_total(key):
            jumps, _, mask = gp.simulate(key, 0.5, 0.0, 0.5)
            return jnp.sum(jumps * mask)

        jx_totals = np.asarray(
            jax.vmap(jax_total)(jax.random.split(jax.random.key(1), 3000))
        )
        # Same distribution: compare mean within combined standard error ×4.
        se = np.hypot(np_totals.std() / 55.0, jx_totals.std() / 55.0)
        assert abs(np_totals.mean() - jx_totals.mean()) < 4 * se


def test_levy_ssm_end_to_end():
    m = levy_ssm(dt=0.5)
    xs, ys = aps.simulate(jax.random.key(0), m, 20)
    assert xs.shape == (20, 2) and ys.shape == (20,)
    traced = aps.TracedSSM(m, ys)
    chain = aps.sample(jax.random.key(1), traced, aps.PGAS(10), 5)
    assert chain.trajectory.shape == (5, 20, 2)
    assert bool(jnp.isfinite(chain.log_evidence).all())


class TestGPSSM:
    def test_gp_posterior_matches_direct_regression(self):
        # White-box oracle: the masked fixed-shape GP predictive must equal a
        # direct (unmasked) GP regression computed with NumPy.
        T, t = 8, 5
        model = gp_ssm(num_steps=T)
        hist = jnp.asarray(np.linspace(-1, 1, T), dtype=jnp.float32)
        d = model.dynamics.distribution(
            jnp.asarray(t), None, aps.History(states=hist, length=jnp.asarray(t))
        )

        times = np.arange(t, dtype=np.float64)
        K = np.exp(-0.5 * (times[:, None] - times[None, :]) ** 2) + 1e-6 * np.eye(t)
        k_star = np.exp(-0.5 * (times - t) ** 2)
        x = np.asarray(hist[:t], dtype=np.float64)
        alpha = np.linalg.solve(K, x)
        mean = k_star @ alpha
        var = 1.0 - k_star @ np.linalg.solve(K, k_star)

        np.testing.assert_allclose(float(d.loc), mean, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(d.scale), math.sqrt(var), rtol=1e-3)

    def test_gp_ssm_end_to_end(self):
        T = 12
        m = gp_ssm(num_steps=T)
        xs, ys = aps.simulate(jax.random.key(0), m, T)
        traced = aps.TracedSSM(m, ys)
        chain = aps.sample(jax.random.key(1), traced, aps.PGAS(8), 5)
        assert chain.trajectory.shape == (5, T)
        assert bool(jnp.isfinite(chain.log_evidence).all())

    def test_gp_ssm_smc_determinism(self):
        T = 10
        m = gp_ssm(num_steps=T)
        _, ys = aps.simulate(jax.random.key(0), m, T)
        traced = aps.TracedSSM(m, ys)
        a = aps.sample(jax.random.key(2), traced, aps.SMC(16))
        b = aps.sample(jax.random.key(2), traced, aps.SMC(16))
        assert bool((a.trajectories == b.trajectories).all())
