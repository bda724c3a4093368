"""Stochastic-volatility SSM (the reference's nonlinear PG benchmark).

Mirrors ``/root/reference/examples/particle-gibbs/script.jl:37-84``:

    x_0 ~ N(0, q);  x_t ~ N(a·x_{t-1}, q);  y_t ~ N(0, exp(x_t / 2)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions import Normal
from ..ssm import LatentDynamics, ObservationProcess, StateSpaceModel
from ..utils.trees import pytree_dataclass
from .lgssm import GaussianPrior, LinearGaussianDynamics

__all__ = ["StochasticVolatilityObservation", "stochastic_volatility_ssm"]


@pytree_dataclass
class StochasticVolatilityObservation(ObservationProcess):
    vectorized = True

    def distribution(self, step, state):
        return Normal(0.0, jnp.exp(state / 2.0))


def stochastic_volatility_ssm(a, q) -> StateSpaceModel:
    """Reference ``LinearGaussianStochasticVolatilityModel``
    (``/root/reference/examples/particle-gibbs/script.jl:79-84``)."""
    return StateSpaceModel(
        prior=GaussianPrior(mu=0.0, sigma=q),
        dynamics=LinearGaussianDynamics(a=a, b=0.0, q=q),
        observation=StochasticVolatilityObservation(),
    )
