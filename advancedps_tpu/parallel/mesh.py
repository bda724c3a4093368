"""Mesh helpers for particle-axis sharding.

The reference has no distributed code at all (SURVEY.md §2.12-2.13) — this module is
the invented-from-the-north-star layer.  SMC's natural parallel axis is the particle
axis N (the time axis is a Markov recursion); independent chains form a free second
axis.  We build 1-D ``(particles,)`` or 2-D ``(chains, particles)`` meshes; on real
hardware the particle axis should map to ICI-adjacent devices so the resampling
all-gather rides ICI, not DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["particle_mesh", "chain_particle_mesh", "shard_along"]

PARTICLE_AXIS = "p"
CHAIN_AXIS = "c"


def particle_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the particle axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (PARTICLE_AXIS,), devices=devices)


def chain_particle_mesh(n_chains: int, n_particle_shards: int, devices=None) -> Mesh:
    """2-D mesh: data-parallel chains × sharded particles."""
    if devices is None:
        devices = jax.devices()
    assert n_chains * n_particle_shards <= len(devices)
    return jax.make_mesh(
        (n_chains, n_particle_shards),
        (CHAIN_AXIS, PARTICLE_AXIS),
        devices=devices[: n_chains * n_particle_shards],
    )


def shard_along(mesh: Mesh, axis: str = PARTICLE_AXIS):
    """NamedSharding putting the leading array axis on ``axis``."""
    return NamedSharding(mesh, P(axis))
