"""PG / PGAS suite (mirror of ``/root/reference/test/pgas.jl`` + the PG legs of
``test/smc.jl``): constructor defaults, reference-trajectory semantics, the
ancestor-sampling white-box, single-particle replay, seeded determinism, and the
update-rate contract ≈ 1 − 1/N from the particle-gibbs example
(``/root/reference/examples/particle-gibbs/script.jl:104-134``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import advancedps_tpu as aps
from advancedps_tpu.engine import SweepKernel, inject_ref, sweep
from advancedps_tpu.resampling import (
    ResampleWithESSThreshold,
    resample_multinomial,
    resample_systematic,
)
from advancedps_tpu.utils.trees import pytree_dataclass


def _lgssm(T=3, seed=0, a=0.9, q=0.32, r=1.0):
    model = aps.models.stationary_lgssm(a=a, q=q, r=r)
    _, ys = aps.simulate(jax.random.key(seed), model, T)
    return aps.TracedSSM(model, ys)


def test_pg_constructor_defaults():
    # /root/reference/test/smc.jl:107-125.
    s = aps.PG(10)
    assert s.n_particles == 10
    assert s.resampler.resampler is resample_systematic
    assert s.resampler.threshold == 0.5
    s = aps.PG(60, 0.6)
    assert s.resampler.threshold == 0.6
    s = aps.PG(80, resample_multinomial, 0.6)
    assert s.resampler.resampler is resample_multinomial


def test_pgas_constructor_default_always_resamples():
    # /root/reference/test/pgas.jl:93-97: PGAS(n) ⇒ threshold 1.0.
    s = aps.PGAS(10)
    assert s.n_particles == 10
    assert s.resampler.threshold == 1.0
    assert s.ancestor_sampling


# --- white-box: PGAS ancestor draw picks the only positively-weighted particle ---
@pytree_dataclass
class _CtrlKernel(SweepKernel):
    """3-step kernel with hand-controlled weights: at every step, only slot 1 has
    non-(-inf) log-weight among the non-reference slots.  With ancestor sampling,
    the reference slot's recorded ancestor must therefore be 1 — the dense analogue
    of forcing ``pc.logWs = [-Inf, 0, -Inf]``
    (``/root/reference/test/pgas.jl:61-91``)."""

    n: int = 4

    @property
    def num_steps(self):
        return 3

    def _scores(self, x):
        # Only slot 1 has finite weight — the forced-weight analogue of
        # ``pc.logWs = [-Inf, 0, -Inf]`` (/root/reference/test/pgas.jl:82).
        s = jnp.full((self.n,), -jnp.inf)
        return s.at[1].set(0.0)

    def init(self, rng, ref0, ref_mask):
        x = jnp.arange(self.n, dtype=jnp.float32)  # state = original slot id
        x = inject_ref(ref_mask, ref0, x)
        return x, self._scores(x)

    def step(self, t, rng, state, ref_t, ref_mask):
        state = inject_ref(ref_mask, ref_t, state)
        return state, self._scores(state)

    def snapshot(self, state):
        return state

    def transition_logprob(self, t, state, ref_t):
        return jnp.zeros((self.n,))  # uniform: ancestor weights = logW alone


def test_pgas_ancestor_update_whitebox():
    kernel = _CtrlKernel(n=4)
    ref = jnp.full((3,), 99.0)  # distinguishable reference trajectory
    res = sweep(
        jax.random.key(0),
        kernel,
        4,
        ResampleWithESSThreshold(threshold=float("inf")),
        ref=ref,
        ancestor_sampling=True,
    )
    # Ancestor weights = logW + 0 = [-inf, 0, -inf, -inf]: the reference slot's
    # recorded ancestor must be slot 1 at every resampling step — the genealogy
    # splice of the reference's update_ref! (/root/reference/src/pgas.jl:125-127).
    assert bool((res.ancestors[1:, -1] == 1).all())
    # Non-ref slots must also all descend from slot 1 (the only survivor).
    assert bool((res.ancestors[1:, :-1] == 1).all())
    # Ref slot keeps the injected trajectory in the state array.
    np.testing.assert_allclose(np.asarray(res.states[:, -1]), 99.0)


def test_pg_reference_ancestor_is_fixed_without_ancestor_sampling():
    kernel = _CtrlKernel(n=4)
    ref = jnp.zeros((3,))
    res = sweep(
        jax.random.key(0),
        kernel,
        4,
        ResampleWithESSThreshold(threshold=float("inf")),
        ref=ref,
        ancestor_sampling=False,
    )
    # PG: the reference slot's ancestor is always itself
    # (/root/reference/src/container.jl:219-224 without update_ref!).
    assert bool((res.ancestors[:, -1] == 3).all())


def test_single_particle_pg_replays():
    # /root/reference/test/smc.jl:161-189: PG with one particle must return the
    # identical trajectory (and log-evidence) every iteration.
    traced = _lgssm(T=5)
    chain = aps.sample(jax.random.key(0), traced, aps.PG(1), 3)
    t = np.asarray(chain.trajectory)
    np.testing.assert_allclose(t[0], t[1])
    np.testing.assert_allclose(t[1], t[2])
    z = np.asarray(chain.log_evidence)
    np.testing.assert_allclose(z[0], z[2])


@pytest.mark.parametrize("sampler_cls", [aps.PG, aps.PGAS])
def test_seeded_determinism(sampler_cls):
    # /root/reference/test/pgas.jl:99-127.
    traced = _lgssm(T=6)
    c1 = aps.sample(jax.random.key(7), traced, sampler_cls(10), 10)
    c2 = aps.sample(jax.random.key(7), traced, sampler_cls(10), 10)
    assert bool((c1.trajectory == c2.trajectory).all())


def test_pgas_mixes_better_than_pg():
    """Update-rate contract (``examples/particle-gibbs/script.jl:104-134``): PGAS's
    per-step trajectory update rate approaches 1 − 1/N; plain PG (always-resample)
    path-degenerates at early time steps."""
    N, T, iters = 20, 60, 150
    model = aps.models.stochastic_volatility_ssm(a=0.9, q=0.5)
    _, ys = aps.simulate(jax.random.key(0), model, T)
    traced = aps.TracedSSM(model, ys)

    def update_rate(chain):
        traj = np.asarray(chain.trajectory)  # [iters, T]
        return (np.abs(np.diff(traj, axis=0)) > 0).mean(axis=0)

    pgas_rate = update_rate(
        aps.sample(jax.random.key(1), traced, aps.PGAS(N), iters)
    )
    pg_rate = update_rate(
        aps.sample(jax.random.key(1), traced, aps.PG(N, 1.0), iters)
    )

    theory = 1.0 - 1.0 / N
    # PGAS: high update rate everywhere (mean within 10% of theory).
    assert pgas_rate.mean() > theory - 0.1
    # PG: collapses at early times — early update rate far below PGAS's.
    early = slice(0, T // 3)
    assert pg_rate[early].mean() < pgas_rate[early].mean() - 0.3


def test_pgas_rejects_generic_models():
    from advancedps_tpu.distributions import Normal

    def m(ctx):
        a = ctx.sample(Normal(0.0, 1.0))
        ctx.observe(Normal(a, 1.0), 0.5)

    gm = aps.GenericModel(m)
    with pytest.raises(TypeError, match="ancestor sampling"):
        aps.sample(jax.random.key(0), gm, aps.PGAS(5), 2)


# --- genealogy compaction: replay storage must equal dense storage bitwise ---


@pytest.mark.parametrize("sampler_cls", [aps.PG, aps.PGAS])
def test_replay_storage_matches_dense(sampler_cls):
    # trajectory_storage='replay' re-samples the retained trajectory from the
    # positional RNG along the genealogy instead of gathering stored
    # snapshots (SURVEY.md §7(d)).  Same key ⇒ identical genealogy and draws;
    # state values agree to XLA float-reordering tolerance (the one-particle
    # replay program fuses FMAs differently than the N-particle sweep).
    traced = _lgssm(T=6, seed=3)
    dense = aps.sample(jax.random.key(9), traced, sampler_cls(12), 8)
    repl = aps.sample(
        jax.random.key(9), traced, sampler_cls(12), 8, trajectory_storage="replay"
    )
    np.testing.assert_allclose(
        np.asarray(dense.trajectory), np.asarray(repl.trajectory),
        rtol=0, atol=1e-5,
    )
    # log-evidence comes from the (identical) sweep, not the replay: bitwise.
    np.testing.assert_array_equal(
        np.asarray(dense.log_evidence), np.asarray(repl.log_evidence)
    )


def test_replay_storage_nonmarkov_matches_dense():
    # Non-Markov dynamics replay their own (lineage) history buffer.
    model = aps.models.gp_ssm(num_steps=5, lengthscale=1.5, variance=0.5)
    _, ys = aps.simulate(jax.random.key(1), model, 5)
    traced = aps.TracedSSM(model, ys)
    dense = aps.sample(jax.random.key(2), traced, aps.PG(8), 5)
    repl = aps.sample(
        jax.random.key(2), traced, aps.PG(8), 5, trajectory_storage="replay"
    )
    np.testing.assert_allclose(
        np.asarray(dense.trajectory), np.asarray(repl.trajectory),
        rtol=0, atol=1e-5,
    )


def test_replay_storage_rejects_generic_models():
    def prog(ctx):
        a = ctx.sample(aps.Normal(0.0, 1.0), name="a")
        ctx.observe(aps.Normal(a, 0.5), 0.7)

    gm = aps.GenericModel(prog)
    with pytest.raises(TypeError):
        aps.sample(jax.random.key(0), gm, aps.PG(8), 3, trajectory_storage="replay")
