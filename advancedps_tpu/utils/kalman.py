"""Exact Kalman filter — the in-repo gold-standard oracle.

The reference validates PG/PGAS against an exact filtering distribution from
``Kalman.jl`` (``/root/reference/test/linear-gaussian.jl:56``).  We provide the same
oracle natively so the test suite needs no external dependency: a scalar
linear-Gaussian SSM

    x_0 ~ N(mu0, sigma0²)
    x_t = a·x_{t-1} + b + N(0, q²)
    y_t = h·x_t     +     N(0, r²)

with the first observation ``y_0`` made on ``x_0`` (matching the 0-based SSM DSL).
Returns per-step filtering means/variances and the exact log marginal likelihood —
the oracle for both the KS test and the log-Z RMSE benchmark (BASELINE.md).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class KalmanResult(NamedTuple):
    means: jax.Array  # [T] filtering means  E[x_t | y_{0:t}]
    variances: jax.Array  # [T] filtering variances
    log_likelihood: jax.Array  # scalar  log p(y_{0:T-1})


def kalman_filter(
    ys: jax.Array,
    a: float,
    b: float,
    q: float,
    h: float,
    r: float,
    mu0: float,
    sigma0: float,
) -> KalmanResult:
    """Exact filter for the scalar LGSSM above.  ``q, r, sigma0`` are std-devs."""
    ys = jnp.asarray(ys, dtype=jnp.result_type(float))
    qq, rr = q * q, r * r

    def update(pred_mean, pred_var, y):
        s = h * h * pred_var + rr  # innovation variance
        k = pred_var * h / s  # Kalman gain
        mean = pred_mean + k * (y - h * pred_mean)
        var = (1.0 - k * h) * pred_var
        ll = -0.5 * (math.log(2.0 * math.pi) + jnp.log(s) + (y - h * pred_mean) ** 2 / s)
        return mean, var, ll

    m0, v0, ll0 = update(mu0, sigma0 * sigma0, ys[0])

    def body(carry, y):
        mean, var, ll = carry
        pred_mean = a * mean + b
        pred_var = a * a * var + qq
        mean, var, step_ll = update(pred_mean, pred_var, y)
        return (mean, var, ll + step_ll), (mean, var)

    (mean, var, ll), (means, variances) = lax.scan(body, (m0, v0, ll0), ys[1:])
    means = jnp.concatenate([jnp.asarray(m0)[None], means])
    variances = jnp.concatenate([jnp.asarray(v0)[None], variances])
    return KalmanResult(means=means, variances=variances, log_likelihood=ll)


def kalman_smoother(
    ys: jax.Array,
    a: float,
    b: float,
    q: float,
    h: float,
    r: float,
    mu0: float,
    sigma0: float,
) -> KalmanResult:
    """Exact RTS smoother for the same scalar LGSSM: per-step ``E[x_t | y_{0:T-1}]``
    and smoothing variances.  The marginal law of PG/PGAS retained trajectories
    is the smoothing distribution, so this is the oracle for trajectory-level
    anchors (the filter above only anchors ``log Z`` and filtering means)."""
    filt = kalman_filter(ys, a, b, q, h, r, mu0, sigma0)
    qq = q * q

    def back(carry, fm_fv):
        sm_mean, sm_var = carry
        fm, fv = fm_fv
        pred_mean = a * fm + b
        pred_var = a * a * fv + qq
        g = fv * a / pred_var
        mean = fm + g * (sm_mean - pred_mean)
        var = fv + g * g * (sm_var - pred_var)
        return (mean, var), (mean, var)

    last = (filt.means[-1], filt.variances[-1])
    _, (means, variances) = lax.scan(
        back, last, (filt.means[:-1], filt.variances[:-1]), reverse=True
    )
    means = jnp.concatenate([means, filt.means[-1][None]])
    variances = jnp.concatenate([variances, filt.variances[-1][None]])
    return KalmanResult(
        means=means, variances=variances, log_likelihood=filt.log_likelihood
    )
