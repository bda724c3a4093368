"""Sharded SMC driver — the multi-chip counterpart of
:func:`advancedps_tpu.inference.sample_smc`.

The reference's ``AbstractMCMC.sample`` for SMC
(``/root/reference/src/smc.jl:29-57``) runs one sweep and packages weighted
trajectories + log-evidence; this driver does the same over a particle-axis
mesh, so an SMC user scales to multiple chips with one extra argument.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..engine import reconstruct
from ..smc import SMC, SMCSample
from .mesh import PARTICLE_AXIS
from .sharded import sharded_sweep

__all__ = ["sharded_sample_smc"]


def sharded_sample_smc(
    key: jax.Array,
    kernel,
    sampler: SMC,
    mesh,
    axis: str = PARTICLE_AXIS,
    store_states: bool = True,
    exchange: str = "auto",
) -> SMCSample:
    """One sharded SMC sweep returning the same :class:`SMCSample` as the
    single-chip driver (weighted trajectories, log-evidence, per-step ESS /
    resampled diagnostics).  ``store_states=False`` skips the [T, N, ...]
    snapshot stack (log-evidence/diagnostics only) for memory-bound N.
    ``exchange`` selects the resampling state-exchange strategy
    (:func:`~advancedps_tpu.parallel.sharded.sweep_shard_body`)."""
    res = sharded_sweep(
        key,
        kernel,
        sampler.n_particles,
        sampler.resampler,
        mesh,
        store_states=store_states,
        axis=axis,
        exchange=exchange,
    )
    trajectories = None
    if store_states and res.states is not None:
        # Trajectory extraction walks the genealogy with dynamic gathers;
        # replicate first (an SMCSample's trajectories are global data the
        # caller consumes anyway — on hardware this is the one all-gather of
        # the result extraction, not of the sweep).
        rep = NamedSharding(mesh, P())
        states = jax.sharding.reshard(res.states, rep)
        ancestors = jax.sharding.reshard(res.ancestors, rep)
        trajectories = reconstruct(states, ancestors, None)
    weights = jax.nn.softmax(res.log_weights)
    return SMCSample(
        trajectories=trajectories,
        weights=weights,
        log_evidence=res.log_evidence,
        diagnostics={"ess": res.ess, "resampled": res.resampled},
    )
