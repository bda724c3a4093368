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
