"""Counter-based key discipline — the TPU replacement for the reference's seed tree.

The reference keeps a mutable ``TracedRNG`` per particle: a Philox counter-based
generator plus a per-step ``keys`` history, so a trajectory can be *replayed* instead of
stored (``/root/reference/src/rng.jl:9-18,38-42,49-53``), and an alternative ``refseed``
stream so reference-particle children can never collide with stored keys
(``/root/reference/src/rng.jl:96-106``).

In this framework particle states are stored **densely**, so replay is unnecessary, and
all randomness is a *pure function of position*: the key used by particle ``i`` at step
``t`` of a sweep is ``fold_in(fold_in(fold_in(sweep_key, tag), t), i)``.  This gives all
three seed-tree invariants (divergence of siblings, exact reproducibility, no
ref-stream collisions — see SURVEY.md §3.5) statically, with zero carried state:

* children of one parent diverge immediately — their slots ``i`` differ;
* a sweep replays bitwise from ``sweep_key`` alone;
* streams with different ``tag`` (propagation / resampling / ancestor draws / final
  trajectory draw) never collide.

``jax.random`` keys are already Threefry/Philox counter-based generators — the same
family the reference uses (``/root/reference/src/rng.jl:2``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "PROPAGATE",
    "RESAMPLE",
    "ANCESTOR",
    "DRAW",
    "INIT",
    "step_key",
    "particle_keys",
    "StepRng",
]

# Stream tags: disjoint randomness streams within one sweep.
PROPAGATE = 0  # latent transition sampling
RESAMPLE = 1  # ancestor-index draws (resampling)
ANCESTOR = 2  # PGAS reference-ancestor draw
DRAW = 3  # final retained-trajectory draw (PG/PGAS)
INIT = 4  # initial-state sampling


def step_key(key: jax.Array, tag: int, t) -> jax.Array:
    """Key for stream ``tag`` at sweep step ``t`` (t may be traced)."""
    return jax.random.fold_in(jax.random.fold_in(key, tag), t)


def particle_keys(key: jax.Array, tag: int, t, n: int) -> jax.Array:
    """[n] keys: one per particle slot for stream ``tag`` at step ``t``.

    Pure function of (key, tag, t, slot) — the dense analogue of the reference's
    ``split``-based seed tree (``/root/reference/src/rng.jl:38-42``).
    """
    base = step_key(key, tag, t)
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(n))


from .utils.trees import pytree_dataclass  # noqa: E402  (avoid cycle at top)


@pytree_dataclass
class StepRng:
    """Per-(stream, step) randomness handed to a sweep kernel.

    ``key`` is already folded with (tag, t); ``gids`` are the **global** particle
    ids covered by this kernel invocation (``arange(N)`` single-chip, the local
    shard's slice under ``shard_map``).

    Two consumption styles:

    * :meth:`batch_key` — one key for a single batched ``sample`` over the whole
      slice (one Threefry counter pass; the TPU-fast path).  Distinct per shard
      because it folds in the slice's first global id.
    * :meth:`particle_keys` — one key per particle (general path for kernels whose
      per-particle computation cannot be expressed as a batched distribution,
      e.g. Lévy jump paths or GP history solves).
    """

    key: jax.Array
    gids: jax.Array

    def batch_key(self) -> jax.Array:
        return jax.random.fold_in(self.key, self.gids[0])

    def particle_keys(self) -> jax.Array:
        return jax.vmap(lambda i: jax.random.fold_in(self.key, i))(self.gids)

    @property
    def n(self) -> int:
        return self.gids.shape[0]
