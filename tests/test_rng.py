"""Key-discipline invariants (SURVEY.md §3.5).

The reference pins save/load replay and split-distinctness of its TracedRNG
(``/root/reference/test/rng.jl:1-24``).  The positional-key design makes replay a
triviality (same inputs → same keys), so we pin the invariants that matter here:
determinism, stream disjointness, and sibling divergence.
"""

import jax
import jax.numpy as jnp
import numpy as np

from advancedps_tpu import rng as rngmod


def test_particle_keys_deterministic():
    k = jax.random.key(0)
    a = rngmod.particle_keys(k, rngmod.PROPAGATE, 3, 8)
    b = rngmod.particle_keys(k, rngmod.PROPAGATE, 3, 8)
    assert bool((jax.random.key_data(a) == jax.random.key_data(b)).all())


def test_particle_keys_all_distinct():
    # Siblings diverge immediately; different steps/tags give disjoint streams —
    # the three seed-tree invariants (/root/reference/src/rng.jl:96-104) for free.
    k = jax.random.key(0)
    keys = []
    for tag in (rngmod.PROPAGATE, rngmod.RESAMPLE, rngmod.ANCESTOR, rngmod.INIT):
        for t in range(3):
            keys.append(np.asarray(jax.random.key_data(rngmod.particle_keys(k, tag, t, 4))))
    flat = np.concatenate(keys).reshape(-1, keys[0].shape[-1])
    unique = np.unique(flat, axis=0)
    assert unique.shape[0] == flat.shape[0]


def test_replay_same_draw():
    # Same (key, tag, t, i) → bitwise identical normal draw (reference
    # save/load replay, /root/reference/test/rng.jl:2-12).
    k = jax.random.key(9)
    ks = rngmod.particle_keys(k, rngmod.PROPAGATE, 5, 4)
    x1 = jax.random.normal(ks[2])
    x2 = jax.random.normal(rngmod.particle_keys(k, rngmod.PROPAGATE, 5, 4)[2])
    assert float(x1) == float(x2)
