"""Gold-standard integration test (mirror of ``/root/reference/test/linear-gaussian.jl``).

A 1-D LGSSM with an exact Kalman filtering distribution; PG and PGAS final-step
samples must agree with the exact marginal by a one-sided Kolmogorov–Smirnov test
(p > 0.05), 100 particles × 200 MCMC samples — the same contract, with the Kalman
oracle implemented in-repo (:mod:`advancedps_tpu.utils.kalman`).
"""

import math

import jax
import numpy as np
import pytest
import scipy.stats as st

import advancedps_tpu as aps

# Reference model constants (/root/reference/test/linear-gaussian.jl:28-44).
T = 3
N_PARTICLES = 100
N_SAMPLES = 200
A, B, Q = 0.5, 0.2, 0.1
H, R = 1.0, 0.1
X0, P0 = 0.0, 1.0


@pytest.fixture(scope="module")
def setup():
    model = aps.models.LinearGaussianSSM(X0, P0, A, B, Q, H, R)
    xs, ys = aps.simulate(jax.random.key(1234), model, T)
    traced = aps.TracedSSM(model, ys)
    kf = aps.utils.kalman_filter(ys, A, B, Q, H, R, X0, P0)
    return traced, kf


@pytest.mark.parametrize("sampler_cls", [aps.PGAS, aps.PG])
def test_ks_vs_kalman(setup, sampler_cls):
    traced, kf = setup
    chain = aps.sample(jax.random.key(4321), traced, sampler_cls(N_PARTICLES), N_SAMPLES)
    final = np.asarray(chain.trajectory)[:, -1]  # x_{T-1} samples
    mean = float(kf.means[-1])
    std = math.sqrt(float(kf.variances[-1]))
    p = st.kstest(final, "norm", args=(mean, std)).pvalue
    assert p > 0.05, f"{sampler_cls.__name__}: KS p={p}"


def test_smc_filtering_moments_and_logz():
    # Longer LGSSM: SMC weighted mean at final step vs Kalman mean; logZ vs exact.
    model = aps.models.LinearGaussianSSM(X0, P0, A, B, Q, H, R)
    xs, ys = aps.simulate(jax.random.key(7), model, 50)
    traced = aps.TracedSSM(model, ys)
    out = aps.sample(jax.random.key(8), traced, aps.SMC(4096))
    kf = aps.utils.kalman_filter(ys, A, B, Q, H, R, X0, P0)
    w = np.asarray(out.weights)
    final = np.asarray(out.trajectories)[-1]
    est_mean = float((w * final).sum())
    exact_mean = float(kf.means[-1])
    exact_std = math.sqrt(float(kf.variances[-1]))
    assert abs(est_mean - exact_mean) < 0.25 * exact_std
    assert abs(float(out.log_evidence) - float(kf.log_likelihood)) < 0.5


def test_rts_smoother_matches_dense_posterior():
    # The RTS smoother (utils/kalman.py) is the oracle for PGAS trajectory
    # anchors (bench_pgas.py): check it against the brute-force joint-Gaussian
    # posterior of the stationary LGSSM, x ~ N(0, P), y = x + e.
    A, Q, R, T = 0.9, 0.32, 1.0, 12
    s0 = math.sqrt(Q * Q / (1 - A * A))
    model = aps.models.stationary_lgssm(a=A, q=Q, r=R)
    _, ys = aps.simulate(jax.random.key(0), model, T)
    ysn = np.asarray(ys, dtype=np.float64)
    idx = np.arange(T)
    P = s0 * s0 * (A ** np.abs(idx[:, None] - idx[None, :]))
    S = P + R * R * np.eye(T)
    mean_post = P @ np.linalg.solve(S, ysn)
    cov_post = P - P @ np.linalg.solve(S, P)
    sm = aps.utils.kalman_smoother(ys, A, 0.0, Q, 1.0, R, 0.0, s0)
    np.testing.assert_allclose(np.asarray(sm.means), mean_post, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sm.variances), np.diag(cov_post), atol=1e-4
    )
    # log-likelihood passthrough must equal the filter's
    kf = aps.utils.kalman_filter(ys, A, 0.0, Q, 1.0, R, 0.0, s0)
    assert float(sm.log_likelihood) == float(kf.log_likelihood)


def test_pgas_trajectory_mean_matches_smoother():
    # Retained PGAS trajectories are marginal smoothing draws: their mean over
    # iterations must hit the RTS means within Monte-Carlo error (the
    # trajectory-level analogue of the filtering-moments test above).
    A, Q, R, T = 0.9, 0.32, 1.0, 10
    s0 = math.sqrt(Q * Q / (1 - A * A))
    model = aps.models.stationary_lgssm(a=A, q=Q, r=R)
    _, ys = aps.simulate(jax.random.key(1), model, T)
    traced = aps.TracedSSM(model, ys)
    res = aps.sample(jax.random.key(9), traced, aps.PGAS(1024), 40)
    tr = np.asarray(res.trajectory)[8:]
    sm = aps.utils.kalman_smoother(ys, A, 0.0, Q, 1.0, R, 0.0, s0)
    sd = np.sqrt(np.asarray(sm.variances))
    z = (tr.mean(axis=0) - np.asarray(sm.means)) / (sd / math.sqrt(tr.shape[0]))
    zrms = float(np.sqrt(np.mean(z * z)))
    assert zrms < 3.0, f"PGAS trajectory mean off the exact smoother: {zrms}"
