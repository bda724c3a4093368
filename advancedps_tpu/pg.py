"""Particle Gibbs (PG) and PG with ancestor sampling (PGAS).

Reference counterparts: ``PG``/``PGAS`` structs and the shared ``AbstractMCMC.step``
(``/root/reference/src/smc.jl:59-129``) plus the PGAS ancestor update
(``/root/reference/src/pgas.jl:113-128``).

One PG(AS) iteration = one *conditional* SMC sweep: the retained trajectory rides in
slot ``N-1`` (reading its stored states instead of sampling,
``/root/reference/src/pgas.jl:69-72``; surviving every resampling,
``/root/reference/src/container.jl:219-224``), then a new retained trajectory is drawn
∝ final weights and reconstructed through the genealogy.  The whole iteration is one
jitted program; a full chain is a ``lax.scan`` over iterations, so an entire MCMC run
compiles to a single on-device computation.

PGAS defaults to resampling every step (reference
``PGAS(n) = PGAS(n, ResampleWithESSThreshold(1.0))``,
``/root/reference/src/smc.jl:99``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from . import rng as rngmod
from .resampling import ResampleWithESSThreshold
from .smc import _build_gated_resampler
from .utils.trees import pytree_dataclass

__all__ = ["PG", "PGAS", "PGState", "PGSample"]


class PG:
    """Particle Gibbs sampler config (reference ``/root/reference/src/smc.jl:59-81``)."""

    ancestor_sampling = False

    def __init__(self, n_particles: int, resampler=None, threshold=None):
        self.n_particles = int(n_particles)
        self.resampler = _build_gated_resampler(resampler, threshold)

    def __repr__(self):
        return (
            f"{type(self).__name__}(n_particles={self.n_particles}, "
            f"resampler={self.resampler})"
        )


class PGAS(PG):
    """PG with ancestor sampling (reference ``/root/reference/src/smc.jl:92-99``);
    defaults to always-resample (threshold 1.0)."""

    ancestor_sampling = True

    def __init__(self, n_particles: int, resampler=None, threshold=None):
        if resampler is None and threshold is None:
            threshold = 1.0
        super().__init__(n_particles, resampler, threshold)


@pytree_dataclass
class PGState:
    """Chain state: the retained trajectory ``[T, ...]`` (reference ``PGState``,
    ``/root/reference/src/smc.jl:83-85``).  A small pytree — trivially
    checkpointable with orbax (SURVEY.md §5.4)."""

    trajectory: Any


@pytree_dataclass
class PGSample:
    """One chain draw (reference ``PGSample``, ``/root/reference/src/smc.jl:87-89``)."""

    trajectory: Any
    log_evidence: jax.Array
