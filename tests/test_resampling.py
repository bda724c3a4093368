"""Resampling oracles.

Mirrors ``/root/reference/test/resampling.jl:1-16``: with weights [0.3, 0.4, 0.3] and
1e6 draws, the frequency of index 1 (0-based) must be 0.4 within 1e-3 for the
low-variance schemes (systematic, stratified) and 1e-2 for multinomial/residual.
Adds structural checks the vectorised formulations must satisfy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advancedps_tpu.resampling import (
    ResampleWithESSThreshold,
    effective_sample_size,
    randcat,
    resample_multinomial,
    resample_residual,
    resample_stratified,
    resample_systematic,
)

W = jnp.array([0.3, 0.4, 0.3])
N_DRAWS = 1_000_000


@pytest.mark.parametrize(
    "resampler,tol",
    [
        (resample_systematic, 1e-3),
        (resample_stratified, 1e-3),
        (resample_multinomial, 1e-2),
        (resample_residual, 1e-2),
    ],
)
def test_frequency_oracle(resampler, tol):
    idx = jax.jit(resampler, static_argnums=2)(jax.random.key(42), W, N_DRAWS)
    freq = float(jnp.mean(idx == 1))
    assert abs(freq - 0.4) < tol, f"{resampler.__name__}: {freq}"


@pytest.mark.parametrize(
    "resampler",
    [resample_systematic, resample_stratified, resample_residual],
)
def test_counts_within_floor_ceil(resampler):
    # Low-variance schemes give each particle floor(n·w) or ceil(n·w) copies.
    n = 1000
    w = jnp.array([0.25, 0.5, 0.25])
    idx = resampler(jax.random.key(3), w, n)
    counts = np.bincount(np.asarray(idx), minlength=3)
    for i, wi in enumerate(np.asarray(w)):
        assert np.floor(n * wi) <= counts[i] <= np.ceil(n * wi)


def test_indices_valid_and_int32():
    for r in (
        resample_systematic,
        resample_stratified,
        resample_multinomial,
        resample_residual,
    ):
        idx = r(jax.random.key(0), W, 100)
        assert idx.dtype == jnp.int32
        assert int(idx.min()) >= 0 and int(idx.max()) <= 2


def test_degenerate_weights():
    # All mass on one particle: every scheme must return only that index.
    w = jnp.array([0.0, 1.0, 0.0])
    for r in (
        resample_systematic,
        resample_stratified,
        resample_multinomial,
        resample_residual,
    ):
        idx = r(jax.random.key(1), w, 50)
        assert bool((idx == 1).all()), r.__name__


def test_randcat_frequency():
    keys = jax.random.split(jax.random.key(7), 100_000)
    draws = jax.vmap(lambda k: randcat(k, W))(keys)
    freq = float(jnp.mean(draws == 1))
    assert abs(freq - 0.4) < 1e-2


def test_ess():
    w = jnp.ones(10) / 10
    np.testing.assert_allclose(float(effective_sample_size(w)), 10.0, rtol=1e-6)
    w = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(float(effective_sample_size(w)), 1.0, rtol=1e-6)


def test_ess_threshold_defaults():
    # Reference defaults: systematic resampler, threshold 0.5
    # (/root/reference/src/resampling.jl:198-200).
    g = ResampleWithESSThreshold()
    assert g.resampler is resample_systematic
    assert g.threshold == 0.5
    uniform = jnp.ones(10) / 10
    assert not bool(g.should_resample(uniform, 10))
    degenerate = jnp.array([0.99] + [0.01 / 9] * 9)
    assert bool(g.should_resample(degenerate, 10))


def test_resamplers_deterministic_under_same_key():
    for r in (
        resample_systematic,
        resample_stratified,
        resample_multinomial,
        resample_residual,
    ):
        a = r(jax.random.key(5), W, 1000)
        b = r(jax.random.key(5), W, 1000)
        assert bool((a == b).all())
