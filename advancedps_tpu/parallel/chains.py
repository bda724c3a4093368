"""Chain-axis parallelism: independent PG(AS) chains as a free second mesh axis.

The reference runs one chain per process (SURVEY.md §2.12).  Here independent
chains are just a ``vmap`` over chain keys — on a 2-D ``(chains, particles)`` mesh
(:func:`~advancedps_tpu.parallel.mesh.chain_particle_mesh`) each chain's particle
block lives on its own device group, giving embarrassingly-parallel scaling in the
number of chains on top of particle-axis scaling.

Note: under ``vmap`` the engine's ``lax.cond`` resample gate lowers to a select
(both branches execute); for many-chain workloads this is the right trade — chains
desynchronise their resampling steps anyway.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..inference import sample_pg, sample_smc
from ..pg import PG
from ..smc import SMC

__all__ = ["sample_chains", "smc_ensemble"]


def sample_chains(
    key: jax.Array,
    model,
    sampler: PG,
    n_iterations: int,
    n_chains: int,
):
    """Run ``n_chains`` independent PG(AS) chains, vmapped over chain keys.

    Returns stacked samples with a leading chain axis:
    ``trajectory [n_chains, n_iterations, T, ...]``,
    ``log_evidence [n_chains, n_iterations]``.
    """
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_chains))
    return jax.vmap(lambda k: sample_pg(k, model, sampler, n_iterations))(keys)


def smc_ensemble(key: jax.Array, model, sampler: SMC, n_runs: int):
    """``n_runs`` independent SMC sweeps (e.g. for log-evidence variance
    estimates).  Returns stacked :class:`~advancedps_tpu.smc.SMCSample`."""
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_runs))
    return jax.vmap(lambda k: sample_smc(k, model, sampler))(keys)
