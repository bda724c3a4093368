"""Pallas run-length-decode kernel (interpret mode on CPU).

Compiled-TPU correctness/perf is exercised separately on hardware; these tests
pin the kernel's algorithm against the searchsorted formulation exactly (same
float32 inputs ⇒ identical indices).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedps_tpu.ops.pallas_resample import decode_ancestors, systematic_pallas


def _ref(u, w, n):
    us = (u + jnp.arange(n, dtype=w.dtype)) / n
    return jnp.clip(
        jnp.searchsorted(jnp.cumsum(w), us, side="right"), 0, w.shape[0] - 1
    )


@pytest.mark.parametrize("n", [1024, 4096, 5000])
def test_matches_searchsorted_exact(n):
    w = jax.nn.softmax(jax.random.normal(jax.random.key(0), (n,)))
    u = jnp.float32(0.37)
    got = systematic_pallas(u, w, n, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref(u, w, n)))


def test_matches_searchsorted_large_n():
    # At larger n the f32 `n·cdf` rounding in the closed-form extents flips a
    # ~1e-4 fraction of indices by ±1 vs the searchsorted formulation — the same
    # tolerance class as the XLA scatter formulation (resampling.py docstring).
    n = 20000
    w = jax.nn.softmax(jax.random.normal(jax.random.key(0), (n,)))
    u = jnp.float32(0.37)
    got = np.asarray(systematic_pallas(u, w, n, interpret=True))
    ref = np.asarray(_ref(u, w, n))
    assert (got != ref).mean() < 1e-3
    assert np.abs(got - ref).max() <= 1


def test_degenerate_single_survivor():
    n = 2048
    w = jnp.zeros(n).at[777].set(1.0)
    got = systematic_pallas(jnp.float32(0.5), w, n, interpret=True)
    assert bool((got == 777).all())


def test_uniform_weights_identity():
    n = 2048
    w = jnp.ones(n) / n
    got = systematic_pallas(jnp.float32(0.5), w, n, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.arange(n))


def test_decode_ancestors_runlength():
    # f = [0, 2, 2, 5, 8, 8, 8, 8] (counts 0,2,0,3,3,0,0,0) over n=8:
    # anc = [1,1,3,3,3,4,4,4]
    f = jnp.asarray([0, 2, 2, 5, 8, 8, 8, 8], jnp.int32)
    anc = decode_ancestors(f, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(anc), [1, 1, 3, 3, 3, 4, 4, 4])


def test_long_flat_run_spanning_blocks():
    # One particle owns almost everything: runs span many output blocks; the
    # chunk pointer must stall correctly across blocks.
    n = 4096
    w = jnp.full((n,), 1e-9).at[3].set(1.0)
    w = w / w.sum()
    got = systematic_pallas(jnp.float32(0.25), w, n, interpret=True)
    ref = _ref(jnp.float32(0.25), w, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# --- fused resample+move kernel ----------------------------------------------
#
# v1 (cumulative-count staircase, the production default) is pinned against
# the searchsorted oracle: identical ancestors and bitwise-identical moved
# values for identical inputs; v0 (decode + XLA gather) is pinned separately
# below.  The round-4 design-space testbeds (v3/v4/v5/v7) were pruned in
# round 5 — findings in docs/benchmarks.md, code at git tag
# pre-kernel-prune-r5.

from advancedps_tpu.ops.pallas_resample import resample_move

VERSIONS = [1, 6]  # 6 = decode + dynamic-gather lookup (round-5 default)
# versions with a windowed (sharded-exchange) form
WINDOW_VERSIONS = [1, 6]


def _move_ref(u, w, n, m):
    f = jnp.clip(jnp.ceil(n * jnp.cumsum(w) - u), 0, n).astype(jnp.int32)
    f = f.at[m - 1].set(n)
    anc = np.searchsorted(np.asarray(f), np.arange(n), side="right")
    return np.clip(anc, 0, m - 1)


@pytest.mark.parametrize("version", VERSIONS)
@pytest.mark.parametrize("m,n", [(1000, 1000), (1000, 999), (3000, 3000), (5, 5), (2048, 4096)])
def test_resample_move_matches_gather(m, n, version):
    key = jax.random.key(m * 7 + n)
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.nn.softmax(jax.random.normal(k1, (m,)) * 3)
    state = {"a": jax.random.normal(k2, (m,)), "b": jax.random.normal(k3, (m, 3))}
    u = float(jax.random.uniform(jax.random.fold_in(key, 9)))
    anc, moved = resample_move(u, w, state, n, interpret=True, version=version)
    anc_ref = _move_ref(u, w, n, m)
    np.testing.assert_array_equal(np.asarray(anc), anc_ref)
    np.testing.assert_array_equal(np.asarray(moved["a"]), np.asarray(state["a"])[anc_ref])
    np.testing.assert_array_equal(np.asarray(moved["b"]), np.asarray(state["b"])[anc_ref])


@pytest.mark.parametrize("version", VERSIONS)
def test_resample_move_single_survivor(version):
    m = n = 2048
    w = jnp.zeros(m).at[777].set(1.0)
    x = jnp.arange(m, dtype=jnp.float32)
    anc, moved = resample_move(0.5, w, x, n, interpret=True, version=version)
    assert bool((anc == 777).all())
    assert bool((moved == 777.0).all())


@pytest.mark.parametrize("version", VERSIONS)
def test_resample_move_values_exact_copies(version):
    # The moved values must be *bitwise* copies of the source rows (the owner
    # mask has one nonzero per output, so the dot is a copy, not a blend).
    m = n = 3000
    key = jax.random.key(11)
    w = jax.nn.softmax(jax.random.normal(key, (m,)) * 5)
    x = jax.random.normal(jax.random.fold_in(key, 1), (m,)) * 1e-7  # tiny values
    anc, moved = resample_move(0.123, w, x, n, interpret=True, version=version)
    np.testing.assert_array_equal(np.asarray(moved), np.asarray(x)[np.asarray(anc)])


from advancedps_tpu.ops.pallas_resample import resample_move_window


@pytest.mark.parametrize("version", WINDOW_VERSIONS)
@pytest.mark.parametrize("m,n,n_shards", [(8192, 8192, 8), (5000, 4096, 4), (1000, 4096, 4)])
def test_resample_move_window_matches_full_slices(m, n, n_shards, version):
    # The sharded exchange decodes each chip's output window against the
    # global CDF; windows must tile exactly into the whole-population result.
    rng = np.random.default_rng(m + n)
    w = rng.gamma(0.2, size=m).astype(np.float32)
    w = jnp.asarray(w / w.sum())
    x = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    u = float(rng.random())
    anc_full, moved_full = resample_move(u, w, x, n, interpret=True, version=version)
    L = n // n_shards
    for k in range(n_shards):
        anc_w, moved_w = resample_move_window(
            u, w, x, n, jnp.int32(k * L), L, interpret=True, version=version
        )
        np.testing.assert_array_equal(
            np.asarray(anc_w), np.asarray(anc_full)[k * L : (k + 1) * L]
        )
        np.testing.assert_array_equal(
            np.asarray(moved_w), np.asarray(moved_full)[k * L : (k + 1) * L]
        )


@pytest.mark.parametrize("version", WINDOW_VERSIONS)
def test_resample_move_window_past_population_end(version):
    # Slots at/after the drawn population (the reference slot the sharded
    # caller overwrites) decode to the clipped last parent with moved value 0.
    m = n = 4096
    rng = np.random.default_rng(7)
    w = rng.gamma(0.2, size=m).astype(np.float32)
    w = jnp.asarray(w / w.sum())
    x = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    anc_f, moved_f = resample_move(0.3, w, x, n - 1, interpret=True, version=version)
    anc_w, moved_w = resample_move_window(
        0.3, w, x, n - 1, jnp.int32(n - 1024), 1024, interpret=True, version=version
    )
    np.testing.assert_array_equal(np.asarray(anc_w)[:-1], np.asarray(anc_f)[n - 1024 :])
    np.testing.assert_array_equal(
        np.asarray(moved_w)[:-1], np.asarray(moved_f)[n - 1024 :]
    )
    assert int(anc_w[-1]) == m - 1 and float(moved_w[-1]) == 0.0


def test_unknown_version_raises():
    # Round-4 advisor finding: unknown APS_MOVE_VERSION values used to
    # KeyError deep in the sharded path, and an explicit version=0 was
    # silently coerced to the default by an ``or``.
    from advancedps_tpu.ops.pallas_resample import (
        resample_move_f,
        resample_move_window,
    )

    m = n = 1024
    w = jnp.ones(m) / m
    x = jnp.zeros(m)
    f = jnp.arange(1, m + 1, dtype=jnp.int32)
    with pytest.raises(ValueError, match="unknown move-kernel version"):
        resample_move_f(f, x, n, interpret=True, version=42)
    # version=0 reaches the decode+gather path (not coerced to the default)
    a0, _ = resample_move_f(f, x, n, interpret=True, version=0)
    np.testing.assert_array_equal(np.asarray(a0), np.arange(m))
    # versions without a windowed form (0, 6) fall back to the v1 staircase
    # in the window wrappers (so APS_MOVE_VERSION A/Bs never break sharded
    # runs); the result must equal v1's.
    aw0, mw0 = resample_move_window(
        0.5, w, x, n, jnp.int32(0), 256, interpret=True, version=0
    )
    aw1, mw1 = resample_move_window(
        0.5, w, x, n, jnp.int32(0), 256, interpret=True, version=1
    )
    np.testing.assert_array_equal(np.asarray(aw0), np.asarray(aw1))
    np.testing.assert_array_equal(np.asarray(mw0), np.asarray(mw1))


# --- extents prefix-scan kernel ----------------------------------------------

from advancedps_tpu.ops.pallas_resample import extents_from_logw


@pytest.mark.parametrize("m,n", [(1000, 1000), (4096, 4096), (5000, 4999), (70, 70)])
def test_extents_from_logw_matches_xla_formula(m, n):
    rng = np.random.default_rng(m + n)
    logw = jnp.asarray(rng.standard_normal(m).astype(np.float32) * 3)
    mx = jnp.max(logw)
    e = jnp.exp(logw - mx)
    s1 = jnp.sum(e)
    u = float(rng.random())
    f_ref = np.asarray(
        jnp.clip(jnp.ceil(n * (jnp.cumsum(e) / s1) - u), 0, n).astype(jnp.int32)
    )
    f = np.asarray(extents_from_logw(logw, mx, s1, u, n, interpret=True))
    # Summation order differs (log-step block prefix + Kahan carry vs XLA's
    # decomposition): allow ±1 flips at exact stratum boundaries, nothing more.
    diff = np.abs(f.astype(np.int64) - f_ref.astype(np.int64))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01, (diff > 0).mean()
    # Contract invariants: nondecreasing, in range.
    assert (np.diff(f) >= 0).all()
    assert f.min() >= 0 and f.max() <= n


def test_extents_from_logw_degenerate_weight():
    # One dominant particle: its extent jumps by ~n at its slot.
    m = n = 2048
    logw = jnp.full((m,), -30.0).at[777].set(5.0)
    mx, e = jnp.max(logw), jnp.exp(logw - jnp.max(logw))
    f = np.asarray(extents_from_logw(logw, mx, jnp.sum(e), 0.25, n, interpret=True))
    assert f[776] == 0 and f[777] == n


def test_extents_feed_move_kernel_consistently():
    # End-to-end: extents kernel -> decode+move kernel must equal the gather
    # of the state by the ancestors the same extents decode to.
    m = n = 3000
    rng = np.random.default_rng(5)
    logw = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    mx, e = jnp.max(logw), jnp.exp(logw - jnp.max(logw))
    from advancedps_tpu.ops.pallas_resample import resample_move_f

    f = extents_from_logw(logw, mx, jnp.sum(e), 0.5, n, interpret=True)
    anc, moved = resample_move_f(f, x, n, interpret=True)
    np.testing.assert_array_equal(np.asarray(moved), np.asarray(x)[np.asarray(anc)])


@pytest.mark.parametrize("weights", ["uniform", "skewed", "degenerate"])
def test_move_weight_profiles(weights):
    # The dense kernel must be exact on every weight profile — including
    # degenerate ones with offspring runs spanning many output blocks (the
    # regime a removed "census" variant specialised for; see git history).
    from advancedps_tpu.ops.pallas_resample import _resample_move_cols

    m = n = 4096
    rng = np.random.default_rng(3)
    if weights == "uniform":
        w = rng.gamma(1.0, size=m)
    elif weights == "skewed":
        w = rng.gamma(0.05, size=m)
    else:
        w = np.full(m, 1e-12)
        w[rng.integers(m, size=5)] = 1.0
    w = (w / w.sum()).astype(np.float32)
    f = jnp.clip(
        jnp.ceil(n * jnp.cumsum(jnp.asarray(w)) - 0.4), 0, n
    ).astype(jnp.int32)
    x = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    anc_c, ys_c = _resample_move_cols(f, (x,), n, interpret=True)
    anc_ref = np.minimum(
        np.searchsorted(np.asarray(f), np.arange(n), side="right"), m - 1
    )
    np.testing.assert_array_equal(np.clip(np.asarray(anc_c), 0, m - 1), anc_ref)
    np.testing.assert_array_equal(np.asarray(ys_c[0]), np.asarray(x)[anc_ref])


# --- wide-state column grouping + eligibility boundary (round-4, verdict #3) --

from advancedps_tpu.ops import pallas_resample as prmod


def test_grouped_move_matches_ungrouped_exactly(monkeypatch):
    # Force tiny per-launch budget so a 5-column state needs 3 launches; the
    # grouped result must equal the single-launch result bitwise.
    m = n = 2048
    rng = np.random.default_rng(21)
    w = rng.gamma(0.5, size=m).astype(np.float32)
    w = jnp.asarray(w / w.sum())
    state = jnp.asarray(rng.standard_normal((m, 5)).astype(np.float32))
    anc_ref, mv_ref = resample_move(0.3, w, state, n, interpret=True)
    monkeypatch.setattr(prmod, "_MOVE_MAX_ELEMS", m * 3)  # group size 2
    assert prmod._move_group_size(m) == 2
    anc_g, mv_g = resample_move(0.3, w, state, n, interpret=True)
    np.testing.assert_array_equal(np.asarray(anc_g), np.asarray(anc_ref))
    np.testing.assert_array_equal(np.asarray(mv_g), np.asarray(mv_ref))


def test_grouped_window_matches_full_slices(monkeypatch):
    m, n = 4096, 4096
    rng = np.random.default_rng(3)
    w = rng.gamma(0.5, size=m).astype(np.float32)
    w = jnp.asarray(w / w.sum())
    state = jnp.asarray(rng.standard_normal((m, 4)).astype(np.float32))
    anc_f, mv_f = resample_move(0.7, w, state, n, interpret=True)
    monkeypatch.setattr(prmod, "_MOVE_MAX_ELEMS", m * 3)
    anc_w, mv_w = resample_move_window(
        0.7, w, state, n, jnp.int32(1024), 1024, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(anc_w), np.asarray(anc_f)[1024:2048]
    )
    np.testing.assert_array_equal(
        np.asarray(mv_w), np.asarray(mv_f)[1024:2048]
    )


def test_move_eligible_boundary(monkeypatch):
    # Pin the fallback cliff (previously silent): f32/width/VMEM rules.
    monkeypatch.setattr(prmod.jax, "default_backend", lambda: "tpu")
    m = 1_000_000
    g = prmod._move_group_size(m)  # = 2 at 1M with the 3M budget
    assert g == 2

    def st(d, dtype=jnp.float32, m_=m):
        return jax.ShapeDtypeStruct((m_, d), dtype)

    # jax.ShapeDtypeStruct has .dtype/.ndim/.shape/.size — enough for the check
    assert prmod.move_eligible(st(1), m)
    assert prmod.move_eligible(st(2), m)      # Lévy at 1M: in (was AT the cap)
    assert prmod.move_eligible(st(16), m)     # 16-site generic at 1M: hybrid
    assert prmod.move_eligible(st(64), m)
    assert prmod.move_eligible(st(200), m)    # T=200 generic record (round 5)
    assert prmod.move_eligible(st(256), m)    # width cap is the only d bound
    assert not prmod.move_eligible(st(257), m)
    assert not prmod.move_eligible(st(2, jnp.int32), m)    # non-f32: out
    assert not prmod.move_eligible(st(2, jnp.float64), m)  # f64: out
    # f alone must fit: enormous m is out even at D=1
    assert not prmod.move_eligible(st(1, m_=4_000_000), 4_000_000)


def test_hybrid_wide_move_matches_plain(monkeypatch):
    # d > 2*group: fused decode + batched gather for the overflow columns
    # must equal the single-launch result bitwise, including zeroed values at
    # sentinel-owned (past-population) slots in the windowed form.
    m = n = 2048
    rng = np.random.default_rng(31)
    w = rng.gamma(0.5, size=m).astype(np.float32)
    w = jnp.asarray(w / w.sum())
    state = jnp.asarray(rng.standard_normal((m, 7)).astype(np.float32))
    anc_ref, mv_ref = resample_move(0.4, w, state, n, interpret=True)
    monkeypatch.setattr(prmod, "_MOVE_MAX_ELEMS", m * 3)  # group size 2 -> hybrid
    anc_h, mv_h = resample_move(0.4, w, state, n, interpret=True)
    np.testing.assert_array_equal(np.asarray(anc_h), np.asarray(anc_ref))
    np.testing.assert_array_equal(np.asarray(mv_h), np.asarray(mv_ref))
    # windowed form past the population end: moved values 0 in every column
    anc_w, mv_w = resample_move_window(
        0.4, w, state, n - 1, jnp.int32(n - 512), 512, interpret=True
    )
    assert int(anc_w[-1]) == m - 1
    np.testing.assert_array_equal(np.asarray(mv_w[-1]), np.zeros(7))


def test_version0_decode_gather_matches_fused():
    # The A/B alternative (decode-only + whole-tree XLA gather) must agree
    # exactly with the fused move — it exists to keep the ~18 ms/firing
    # in-engine gather cost measurable (APS_MOVE_VERSION=0; docs/benchmarks).
    from advancedps_tpu.ops.pallas_resample import resample_move_f

    m = n = 3000
    rng = np.random.default_rng(5)
    w = rng.gamma(0.4, size=m).astype(np.float32)
    w /= w.sum()
    f = jnp.clip(
        jnp.ceil(n * jnp.cumsum(jnp.asarray(w)) - 0.3), 0, n
    ).astype(jnp.int32)
    st = {
        "a": jnp.asarray(rng.standard_normal(m).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal((m, 3)).astype(np.float32)),
    }
    a1, m1 = resample_move_f(f, st, n, interpret=True, version=1)
    a0, m0 = resample_move_f(f, st, n, interpret=True, version=0)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(m0["a"]), np.asarray(m1["a"]))
    np.testing.assert_array_equal(np.asarray(m0["b"]), np.asarray(m1["b"]))
