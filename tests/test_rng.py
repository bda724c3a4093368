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


# --- positional counter-mode draws (rng.pos_*) -------------------------------


def test_threefry_known_answer():
    # Threefry-2x32, 20 rounds: KAT from the Random123 distribution
    # (kat_vectors: zero key/counter and all-ones key/counter).
    z0, z1 = rngmod.threefry2x32(
        jnp.uint32(0), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)
    )
    assert (int(z0), int(z1)) == (0x6B200159, 0x99BA4EFE)
    ff = jnp.uint32(0xFFFFFFFF)
    z0, z1 = rngmod.threefry2x32(ff, ff, ff, ff)
    assert (int(z0), int(z1)) == (0x1CB996FC, 0xBB002BE7)


def test_positional_layout_independence():
    # Element i of a batched draw equals the same draw computed alone — the
    # property that makes sharded sweeps bit-identical to single-chip sweeps
    # and O(T) trajectory replay possible.
    k = jax.random.key(3)
    gids = jnp.arange(64)
    full_u = rngmod.pos_uniform(k, gids)
    full_z = rngmod.pos_normal(k, gids)
    for i in (0, 17, 63):
        one_u = rngmod.pos_uniform(k, gids[i : i + 1])[0]
        one_z = rngmod.pos_normal(k, gids[i : i + 1])[0]
        assert float(one_u) == float(full_u[i])
        assert float(one_z) == float(full_z[i])


def test_positional_statistics():
    k = jax.random.key(11)
    gids = jnp.arange(200_000)
    u = rngmod.pos_uniform(k, gids)
    z0, z1 = rngmod.pos_normal_pair(k, gids)
    assert abs(float(u.mean()) - 0.5) < 5e-3
    assert abs(float(jnp.var(u)) - 1.0 / 12.0) < 1e-3
    for z in (z0, z1):
        assert abs(float(z.mean())) < 1e-2
        assert abs(float(z.std()) - 1.0) < 1e-2
    # Box–Muller pair is uncorrelated; draws are independent across draw index.
    assert abs(float(jnp.corrcoef(z0, z1)[0, 1])) < 1e-2
    z2 = rngmod.pos_normal(k, gids, draw=1)
    assert abs(float(jnp.corrcoef(z0, z2)[0, 1])) < 1e-2


def test_positional_streams_disjoint():
    # Different draw indices and different keys give different values.
    k = jax.random.key(5)
    gids = jnp.arange(128)
    a = rngmod.pos_uniform(k, gids, draw=0)
    b = rngmod.pos_uniform(k, gids, draw=1)
    c = rngmod.pos_uniform(jax.random.key(6), gids, draw=0)
    assert not bool(jnp.any(a == b))
    assert not bool(jnp.any(a == c))


def test_steprng_offset_gids_match_flat_positional():
    # StepRng draws depend only on the global ids, not on where the slice
    # starts — the invariant that makes sharded sweeps bit-identical.
    k = jax.random.key(5)
    a = rngmod.StepRng(key=k, gids=jnp.arange(8, 24))
    np.testing.assert_array_equal(
        np.asarray(a.normal()), np.asarray(rngmod.pos_normal(k, jnp.arange(8, 24)))
    )
    np.testing.assert_array_equal(
        np.asarray(a.uniform()), np.asarray(rngmod.pos_uniform(k, jnp.arange(8, 24)))
    )


def test_distribution_sample_positional_matches_formula():
    import advancedps_tpu as aps

    k = jax.random.key(7)
    gids = jnp.arange(32)
    z = rngmod.pos_normal(k, gids)
    loc = jnp.linspace(-1, 1, 32)
    d = aps.Normal(loc, 0.5)
    np.testing.assert_array_equal(
        np.asarray(d.sample_positional(k, gids)), np.asarray(loc + 0.5 * z)
    )
    u = rngmod.pos_uniform(k, gids)
    np.testing.assert_array_equal(
        np.asarray(aps.Uniform(2.0, 4.0).sample_positional(k, gids)),
        np.asarray(2.0 + 2.0 * u),
    )


def test_fallback_sample_positional_is_positional():
    # Distributions without a counter-mode override (Gamma) still derive
    # element i purely from (key, gids[i]) via per-id key folding.
    import advancedps_tpu as aps

    k = jax.random.key(13)
    gids = jnp.arange(16)
    d = aps.Gamma(2.0, 3.0)
    full = d.sample_positional(k, gids)
    one = d.sample_positional(k, gids[5:6])[0]
    assert float(one) == float(full[5])
    # batched parameters
    db = aps.Gamma(jnp.linspace(1.0, 3.0, 16), 3.0)
    fullb = db.sample_positional(k, gids)
    assert fullb.shape == (16,)
