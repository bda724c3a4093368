"""Linear-Gaussian state-space models.

Mirrors the models used throughout the reference's tests and examples:

* ``/root/reference/test/linear-gaussian.jl:59-94`` — prior N(x0, σ0), dynamics
  ``N(a·x + b, q)``, observation ``N(h·x, r)`` (all std-dev parameterised, matching
  ``Distributions.jl`` — SURVEY.md §7 hard part (e));
* ``/root/reference/examples/gaussian-ssm/script.jl:37-69`` — stationary prior
  ``N(0, sqrt(q²/(1-a²)))``.
"""

from __future__ import annotations

import math

import jax

from ..distributions import Normal
from ..ssm import (
    LatentDynamics,
    ObservationProcess,
    StatePrior,
    StateSpaceModel,
)
from ..utils.trees import pytree_dataclass

__all__ = [
    "GaussianPrior",
    "LinearGaussianDynamics",
    "LinearGaussianObservation",
    "LinearGaussianSSM",
    "stationary_lgssm",
]


@pytree_dataclass
class GaussianPrior(StatePrior):
    vectorized = True

    mu: jax.Array = 0.0
    sigma: jax.Array = 1.0

    def distribution(self):
        return Normal(self.mu, self.sigma)


@pytree_dataclass
class LinearGaussianDynamics(LatentDynamics):
    vectorized = True

    a: jax.Array = 1.0
    b: jax.Array = 0.0
    q: jax.Array = 1.0

    def distribution(self, step, state):
        return Normal(self.a * state + self.b, self.q)


@pytree_dataclass
class LinearGaussianObservation(ObservationProcess):
    vectorized = True

    h: jax.Array = 1.0
    r: jax.Array = 1.0

    def distribution(self, step, state):
        return Normal(self.h * state, self.r)


def LinearGaussianSSM(x0, sigma0, a, b, q, h, r) -> StateSpaceModel:
    """Reference ``LinearGaussianStateSpaceModel``
    (``/root/reference/test/linear-gaussian.jl:90-95``)."""
    return StateSpaceModel(
        prior=GaussianPrior(mu=x0, sigma=sigma0),
        dynamics=LinearGaussianDynamics(a=a, b=b, q=q),
        observation=LinearGaussianObservation(h=h, r=r),
    )


def stationary_lgssm(a, q, r) -> StateSpaceModel:
    """Gaussian random-walk model with stationary prior
    (``/root/reference/examples/gaussian-ssm/script.jl:64-69``)."""
    sigma0 = math.sqrt(q * q / (1.0 - a * a))
    return StateSpaceModel(
        prior=GaussianPrior(mu=0.0, sigma=sigma0),
        dynamics=LinearGaussianDynamics(a=a, b=0.0, q=q),
        observation=LinearGaussianObservation(h=1.0, r=r),
    )
