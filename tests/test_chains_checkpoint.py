"""Chain-axis parallelism and checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np

import advancedps_tpu as aps
from advancedps_tpu.parallel import sample_chains, smc_ensemble
from advancedps_tpu.utils import restore_chain, resume_chain, save_chain


def _traced(T=6):
    model = aps.models.stationary_lgssm(a=0.9, q=0.32, r=1.0)
    _, ys = aps.simulate(jax.random.key(0), model, T)
    return aps.TracedSSM(model, ys)


def test_vmapped_chains_shapes_and_independence():
    traced = _traced()
    out = sample_chains(jax.random.key(1), traced, aps.PGAS(8), 5, n_chains=3)
    assert out.trajectory.shape == (3, 5, 6)
    assert out.log_evidence.shape == (3, 5)
    # chains differ (independent keys)
    t = np.asarray(out.trajectory)
    assert not np.allclose(t[0], t[1])


def test_smc_ensemble_logz_spread():
    traced = _traced(10)
    out = smc_ensemble(jax.random.key(2), traced, aps.SMC(64), 8)
    z = np.asarray(out.log_evidence)
    assert z.shape == (8,)
    assert np.isfinite(z).all()
    assert z.std() > 0  # independent runs


def test_checkpoint_roundtrip_and_deterministic_resume(tmp_path):
    traced = _traced()
    sampler = aps.PGAS(8)
    key = jax.random.key(3)

    # Uninterrupted run of 6 iterations.
    states, samples = [], []
    st = None
    for i in range(6):
        smp, st = aps.step_pg(jax.random.fold_in(key, i), traced, sampler, st)
        samples.append(smp)
        states.append(st)

    # Checkpoint after iteration 3, resume 3 more.
    path = str(tmp_path / "chain.npz")
    save_chain(path, states[2], key, iteration=3)
    ck = restore_chain(path)
    assert ck.iteration == 3
    np.testing.assert_allclose(
        np.asarray(ck.trajectory), np.asarray(states[2].trajectory)
    )
    resumed, _, it = resume_chain(path, traced, sampler, 3)
    assert it == 6
    # Resumed samples must equal the uninterrupted run's iterations 3..5 exactly.
    want = np.stack([np.asarray(samples[i].trajectory) for i in (3, 4, 5)])
    np.testing.assert_allclose(np.asarray(resumed.trajectory), want)
