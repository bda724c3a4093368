"""Sampling drivers — the AbstractMCMC-integration analogue.

The reference plugs into ``AbstractMCMC``: ``sample(rng, model, sampler[, N])`` drives
repeated ``step`` calls (``/root/reference/src/smc.jl:29-57,101-129``,
``ext/AdvancedPSLibtaskExt.jl:165-233``).  Here the driver is native:

* :func:`sample_smc` — one SMC sweep (weighted trajectories + log-evidence);
* :func:`step_pg` / :func:`sample_pg` — one / many PG(AS) iterations, the chain as a
  single ``lax.scan`` resident on device;
* :func:`sample` — the ``AbstractMCMC.sample``-shaped entry point dispatching on the
  sampler type and accepting both structured (:class:`TracedSSM`) and generic
  (:class:`GenericModel`) models.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp

from . import rng as rngmod
from .engine import SweepKernel, reconstruct, replay_trajectory, sweep
from .generic import GenericModel, GenericSSMKernel
from .pg import PG, PGAS, PGSample, PGState
from .resampling import randcat_gumbel
from .smc import SMC, SMCSample, SSMKernel
from .ssm import TracedSSM

__all__ = ["make_kernel", "sample_smc", "step_pg", "sample_pg", "sample"]


def make_kernel(model):
    """Model → sweep kernel (the architectural fork of SURVEY.md §1: structured SSM
    path vs generic-program path).

    A :class:`~advancedps_tpu.engine.SweepKernel` instance passes through
    unchanged — the host-PPL integration surface (the analogue of the
    reference's Turing.jl extension driving PG/SMC for external models,
    ``/root/reference/ext/AdvancedPSLibtaskExt.jl:165-233``): any external
    model representation adapted to the protocol gets every sampler/driver in
    this module for free.  See ``examples/host_ppl_adapter.py``.
    """
    if isinstance(model, SweepKernel):
        return model
    if isinstance(model, TracedSSM):
        return SSMKernel(ssm=model)
    if isinstance(model, GenericModel):
        return GenericSSMKernel(model=model)
    raise TypeError(
        f"cannot build a sweep kernel for {type(model).__name__}; expected "
        "TracedSSM, GenericModel, or a SweepKernel implementation"
    )


def sample_smc(key, model, sampler: SMC, store_states: bool = True) -> SMCSample:
    """One SMC sweep (reference ``AbstractMCMC.sample`` for ``SMC``,
    ``/root/reference/src/smc.jl:29-57``).

    Unlike the reference we do not run a final post-observation resampling pass —
    the weighted particle cloud is returned directly; both are valid particle
    representations of the same posterior (the Julia loop's trailing
    ``resample_propagate!`` contributes 0 to the evidence,
    ``/root/reference/src/container.jl:344-360``).
    """
    kernel = make_kernel(model)
    res = sweep(
        key,
        kernel,
        sampler.n_particles,
        sampler.resampler,
        store_states=store_states,
    )
    trajectories = (
        reconstruct(res.states, res.ancestors, None)
        if store_states and res.states is not None
        else None
    )
    weights = jax.nn.softmax(res.log_weights)
    return SMCSample(
        trajectories=trajectories,
        weights=weights,
        log_evidence=res.log_evidence,
        diagnostics={"ess": res.ess, "resampled": res.resampled},
    )


def step_pg(
    key: jax.Array,
    model,
    sampler: PG,
    state: Optional[PGState] = None,
    trajectory_storage: str = "dense",
):
    """One PG / PGAS iteration (reference ``AbstractMCMC.step``,
    ``/root/reference/src/smc.jl:101-129``).  Returns ``(PGSample, PGState)``.

    ``trajectory_storage``:

    * ``"dense"`` (default) — store ``[T, N, ...]`` snapshots through the sweep
      and gather the retained trajectory through the genealogy.
    * ``"replay"`` — genealogy compaction for big N (SURVEY.md §7 hard part
      (d)): the sweep stores only the ``[T, N]`` ancestor trace; the retained
      trajectory is re-sampled exactly along its lineage from the positional
      RNG (:func:`~advancedps_tpu.engine.replay_trajectory`).  Identical
      genealogy and draws; states agree to float-reordering tolerance.  Cuts
      sweep memory from O(T·N·D) to O(T·N) — PGAS at N=1M with vector states
      fits a single chip.  Structured (:class:`TracedSSM`) models only.
    """
    if trajectory_storage not in ("dense", "replay"):
        raise ValueError(f"unknown trajectory_storage {trajectory_storage!r}")
    replay = trajectory_storage == "replay"
    kernel = make_kernel(model)
    if sampler.ancestor_sampling and isinstance(model, GenericModel):
        raise TypeError(
            "PGAS requires transition densities — only structured state-space "
            "models support ancestor sampling (reference: update_ref! dispatches "
            "on SSMTrace, /root/reference/src/pgas.jl:113)"
        )
    if replay and isinstance(model, GenericModel):
        raise TypeError(
            "trajectory_storage='replay' needs per-step snapshots; generic "
            "models carry their whole variable record as state — use 'dense'"
        )
    ref = None if state is None else state.trajectory
    res = sweep(
        key,
        kernel,
        sampler.n_particles,
        sampler.resampler,
        ref=ref,
        ancestor_sampling=sampler.ancestor_sampling and ref is not None,
        store_states=not replay,
    )
    # Retained-trajectory draw ∝ final weights (reference
    # ``rand(particles.rng, particles)``, /root/reference/src/container.jl:33-36);
    # Gumbel-max form — no softmax/cumsum pass over [N].
    draw_key = rngmod.step_key(key, rngmod.DRAW, 0)
    idx = randcat_gumbel(draw_key, res.log_weights)
    if replay:
        traj = replay_trajectory(key, kernel, res.ancestors, idx, ref=ref)
    else:
        traj = reconstruct(res.states, res.ancestors, idx)
    return PGSample(trajectory=traj, log_evidence=res.log_evidence), PGState(
        trajectory=traj
    )


def sample_pg(
    key: jax.Array,
    model,
    sampler: PG,
    n_iterations: int,
    jit_chain: bool = True,
    trajectory_storage: str = "dense",
):
    """Run a PG(AS) chain (usage mirror of
    ``sample(rng, model, pg, N)``, ``/root/reference/test/linear-gaussian.jl:18``).

    The first iteration (no reference trajectory) runs separately; the remaining
    ``n_iterations - 1`` conditional sweeps run as one ``lax.scan`` so the whole
    chain is a single compiled on-device program.  Returns stacked ``PGSample``:
    ``trajectory [n_iterations, T, ...]``, ``log_evidence [n_iterations]``.
    ``trajectory_storage``: see :func:`step_pg`.
    """
    key0 = jax.random.fold_in(key, 0)
    first, st = step_pg(key0, model, sampler, None, trajectory_storage)

    if n_iterations == 1:
        return jax.tree_util.tree_map(lambda a: a[None], first)

    def body(st, i):
        smp, st = step_pg(
            jax.random.fold_in(key, i), model, sampler, st, trajectory_storage
        )
        return st, smp

    iters = jnp.arange(1, n_iterations)
    if jit_chain:
        _, rest = jax.lax.scan(body, st, iters)
    else:
        outs = []
        for i in range(1, n_iterations):
            st, smp = body(st, jnp.asarray(i))
            outs.append(smp)
        rest = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *outs)

    return jax.tree_util.tree_map(
        lambda f, r: jnp.concatenate([f[None], r], axis=0), first, rest
    )


def sample(key, model, sampler, n_iterations: Optional[int] = None, **kwargs):
    """``AbstractMCMC.sample``-shaped entry point.

    * ``sample(key, model, SMC(n))`` → :class:`SMCSample`
    * ``sample(key, model, PG(n), n_iterations)`` → stacked :class:`PGSample`
    """
    if isinstance(sampler, SMC):
        if n_iterations is not None:
            raise ValueError("SMC draws one weighted population; n_iterations must be None")
        return sample_smc(key, model, sampler, **kwargs)
    if isinstance(sampler, PG):
        if n_iterations is None:
            raise ValueError("PG/PGAS require n_iterations")
        return sample_pg(key, model, sampler, n_iterations, **kwargs)
    raise TypeError(f"unknown sampler {type(sampler).__name__}")
