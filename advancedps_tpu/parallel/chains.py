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
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .. import rng as rngmod
from ..engine import _ref_slice, lineages
from ..inference import sample_pg, sample_smc
from ..pg import PG
from ..resampling import randcat_gumbel
from ..smc import SMC
from .mesh import CHAIN_AXIS, PARTICLE_AXIS
from .sharded import _step_rng, sweep_shard_body

__all__ = ["sample_chains", "smc_ensemble", "sharded_chains_pg"]


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


def sharded_chains_pg(
    key: jax.Array,
    kernel,
    sampler: PG,
    mesh: Mesh,
    n_chains: int,
    n_iterations: int,
    chain_axis: str = CHAIN_AXIS,
    axis: str = PARTICLE_AXIS,
    exchange: str = "allgather",
):
    """K chains × P particle-shards on a 2-D ``(chains, particles)`` mesh.

    ``exchange`` must stay ``"allgather"`` here: the O(L·D) neighbour exchange
    uses ``ppermute``, which XLA lowers to a *channel* ``collective-permute``
    whose participants are ALL devices of the program (no replica groups —
    unlike ``all_gather``).  The resample gate is per-chain, so chain groups
    diverge on it, and a collective-permute inside a divergent branch
    deadlocks the rendezvous (measured on the 8-device CPU mesh: 4 of 8
    threads arrive).  The neighbour exchange is sound exactly when the gate is
    uniform across the whole mesh — i.e. on 1-D particle meshes
    (:func:`~advancedps_tpu.parallel.sharded.sharded_sweep`).

    The whole run is **one** ``shard_map`` program: the chain axis partitions
    independent PG(AS) chains (zero communication across it), the particle axis
    shards each chain's sweep with the usual collectives (SURVEY.md §2.12 —
    "DP over independent chains is a free second axis").  Each chain's
    randomness is derived from ``fold_in(key, chain_id)`` exactly as
    :func:`sample_chains`, so results are layout-independent.

    Returns ``(trajectories [n_chains, n_iterations, T, ...],
    log_evidence [n_chains, n_iterations])``.
    """
    if exchange != "allgather":
        raise ValueError(
            "sharded_chains_pg supports exchange='allgather' only: the "
            "neighbour ppermute exchange cannot sit under the per-chain "
            "resample gate (collective-permute rendezvous spans all devices; "
            "divergent chain groups deadlock it)"
        )
    Kc = mesh.shape[chain_axis]
    Kp = mesh.shape[axis]
    n = sampler.n_particles
    if n % Kp:
        raise ValueError(f"n_particles={n} not divisible by mesh axis {axis}={Kp}")
    if n_chains % Kc:
        raise ValueError(
            f"n_chains={n_chains} not divisible by mesh axis {chain_axis}={Kc}"
        )
    L = n // Kp
    local_c = n_chains // Kc
    chain_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(n_chains)
    )

    def one_step(ck, it, ref, kernel):
        """One conditional-SMC iteration of one chain (inside shard_map)."""
        it_key = jax.random.fold_in(ck, it)
        has_ref = ref is not None
        state, logw, log_z, snaps, ancs, _, _ = sweep_shard_body(
            it_key,
            kernel,
            ref,
            n=n,
            L=L,
            resampler=sampler.resampler,
            ancestor_sampling=sampler.ancestor_sampling and has_ref,
            store_states=True,
            axis=axis,
            exchange=exchange,
        )
        gids = lax.axis_index(axis) * L + jnp.arange(L)
        ref_mask = (gids == (n - 1)) if has_ref else None

        # t = 0 snapshot (recomputed — deterministic in it_key).
        rng0 = _step_rng(it_key, rngmod.INIT, 0, gids)
        st0, _ = kernel.init(rng0, _ref_slice(ref, 0), ref_mask)
        states = jax.tree_util.tree_map(
            lambda s0, ss: jnp.concatenate([s0[None], ss], axis=0),
            kernel.snapshot(st0),
            snaps,
        )  # [T, L, ...]
        ancs = jnp.concatenate([gids.astype(jnp.int32)[None], ancs], axis=0)

        # Retained-trajectory draw: replicated within the chain's particle group
        # (same key on every shard ⇒ same idx), matching sharded_step_pg.
        logw_all = lax.all_gather(logw, axis, tiled=True)
        anc_all = lax.all_gather(ancs, axis, tiled=True, axis=1)
        draw_key = rngmod.step_key(it_key, rngmod.DRAW, 0)
        idx = randcat_gumbel(draw_key, logw_all)

        # Reconstruct through the genealogy: local one-hot contraction + psum
        # over the particle axis (no cross-shard dynamic gather).
        lin = lineages(anc_all)  # [T, N] replicated
        idx_t = lin[:, idx]  # [T]
        sel = (idx_t[:, None] == gids[None, :]).astype(jnp.float32)  # [T, L]

        def contract(s):
            w = sel.reshape(sel.shape + (1,) * (s.ndim - 2))
            part = (w * s.astype(jnp.float32)).sum(axis=1)
            return lax.psum(part, axis).astype(s.dtype)

        traj = jax.tree_util.tree_map(contract, states)
        return traj, log_z

    def chain_body(ck, kernel):
        traj0, lz0 = one_step(ck, 0, None, kernel)

        def body(ref, it):
            traj, lz = one_step(ck, it, ref, kernel)
            return traj, (traj, lz)

        if n_iterations == 1:
            return (
                jax.tree_util.tree_map(lambda a: a[None], traj0),
                lz0[None],
            )
        _, (trajs, lzs) = lax.scan(body, traj0, jnp.arange(1, n_iterations))
        trajs = jax.tree_util.tree_map(
            lambda f, r: jnp.concatenate([f[None], r], axis=0), traj0, trajs
        )
        return trajs, jnp.concatenate([lz0[None], lzs])

    def body(keys_local, kernel):
        # keys_local: [local_c] — this chain-row's chains, run sequentially.
        return lax.map(lambda ck: chain_body(ck, kernel), keys_local)

    rep = P()
    kernel_specs = jax.tree_util.tree_map(lambda _: rep, kernel)
    shmapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(chain_axis), kernel_specs),
        out_specs=(P(chain_axis), P(chain_axis)),
        check_vma=False,
    )
    return shmapped(chain_keys, kernel)
