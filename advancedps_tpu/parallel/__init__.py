from .mesh import (
    CHAIN_AXIS,
    PARTICLE_AXIS,
    chain_particle_mesh,
    particle_mesh,
    shard_along,
)
from .sharded import sharded_sweep

__all__ = [
    "CHAIN_AXIS",
    "PARTICLE_AXIS",
    "chain_particle_mesh",
    "particle_mesh",
    "shard_along",
    "sharded_sweep",
]
