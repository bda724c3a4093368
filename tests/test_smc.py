"""SMC sampler suite (mirror of ``/root/reference/test/smc.jl``):

constructor defaults, analytic log-evidence, seeded determinism, and the
mis-aligned-traces guard.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import advancedps_tpu as aps
from advancedps_tpu.distributions import Bernoulli, Beta, Gamma, Normal
from advancedps_tpu.resampling import (
    ResampleWithESSThreshold,
    resample_multinomial,
    resample_systematic,
)


def test_smc_constructor_defaults():
    # Mirrors /root/reference/test/smc.jl:2-20.
    s = aps.SMC(10)
    assert s.n_particles == 10
    assert s.resampler.resampler is resample_systematic
    assert s.resampler.threshold == 0.5

    s = aps.SMC(15, 0.6)
    assert s.n_particles == 15
    assert s.resampler.resampler is resample_systematic
    assert s.resampler.threshold == 0.6

    s = aps.SMC(20, resample_multinomial, 0.6)
    assert s.resampler.resampler is resample_multinomial
    assert s.resampler.threshold == 0.6

    s = aps.SMC(25, resample_systematic)
    assert s.resampler.resampler is resample_systematic
    assert s.resampler.threshold == float("inf")  # bare resampler ⇒ every step


def _bernoulli_model(ctx):
    # Mirrors TestModel (/root/reference/test/smc.jl:76-97): latent sites that do
    # not affect the evidence, plus two Bernoulli(x/2) observations with x ≡ 1
    # ⇒ log-evidence exactly −2·log 2.
    ctx.sample(Normal(0.0, 1.0), name="a")
    x = ctx.sample(Bernoulli(1.0), name="x")
    ctx.sample(Gamma(2.0, 3.0), name="b")
    ctx.observe(Bernoulli(x / 2.0), 1.0)
    ctx.sample(Beta(1.0, 1.0), name="c")
    ctx.observe(Bernoulli(x / 2.0), 0.0)


def test_smc_analytic_log_evidence():
    # /root/reference/test/smc.jl:99-104: logZ ≈ −2·log 2 exactly.
    gm = aps.GenericModel(_bernoulli_model)
    out = aps.sample(jax.random.key(100), gm, aps.SMC(100))
    np.testing.assert_allclose(
        float(out.log_evidence), -2.0 * math.log(2.0), rtol=1e-6
    )
    dec = gm.decode(out.trajectories[-1])
    assert bool((dec["x"] == 1.0).all())


def test_smc_seeded_determinism():
    # /root/reference/test/pgas.jl:117-126 (SMC leg).
    model = aps.models.stationary_lgssm(a=0.9, q=0.32, r=1.0)
    _, ys = aps.simulate(jax.random.key(0), model, 8)
    traced = aps.TracedSSM(model, ys)
    a = aps.sample(jax.random.key(5), traced, aps.SMC(32))
    b = aps.sample(jax.random.key(5), traced, aps.SMC(32))
    assert bool((a.trajectories == b.trajectories).all())
    assert float(a.log_evidence) == float(b.log_evidence)


def test_random_observation_count_rejected():
    # FailSMCModel (/root/reference/test/smc.jl:49-68): number of observes depends
    # on a sampled value ⇒ ill-defined posterior, must error.
    def fail_model(ctx):
        a = ctx.sample(Normal(4.0, 5.0), name="a")
        b = ctx.sample(Normal(a, 1.0), name="b")
        if a >= 4:
            ctx.observe(Normal(b, 2.0), 1.5)

    with pytest.raises(Exception, match="mis-aligned|at least one observe"):
        gm = aps.GenericModel(fail_model)
        aps.sample(jax.random.key(0), gm, aps.SMC(10))


def test_smc_requires_no_iteration_count():
    model = aps.models.stationary_lgssm(a=0.9, q=0.32, r=1.0)
    _, ys = aps.simulate(jax.random.key(0), model, 4)
    traced = aps.TracedSSM(model, ys)
    with pytest.raises(ValueError):
        aps.sample(jax.random.key(0), traced, aps.SMC(8), 10)


def test_smc_ess_adaptivity_reported():
    model = aps.models.stationary_lgssm(a=0.9, q=0.32, r=0.3)
    _, ys = aps.simulate(jax.random.key(0), model, 20)
    traced = aps.TracedSSM(model, ys)
    out = aps.sample(jax.random.key(2), traced, aps.SMC(64))
    d = out.diagnostics
    assert d["ess"].shape == (20,)
    assert d["resampled"].shape == (20,)
    # Adaptive: with a tight observation noise some (not all) steps resample.
    assert bool(d["resampled"].any())
