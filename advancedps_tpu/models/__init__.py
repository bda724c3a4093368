from .lgssm import (
    GaussianPrior,
    LinearGaussianDynamics,
    LinearGaussianObservation,
    LinearGaussianSSM,
    stationary_lgssm,
)
from .stochastic_volatility import (
    StochasticVolatilityObservation,
    stochastic_volatility_ssm,
)

__all__ = [
    "GaussianPrior",
    "LinearGaussianDynamics",
    "LinearGaussianObservation",
    "LinearGaussianSSM",
    "stationary_lgssm",
    "StochasticVolatilityObservation",
    "stochastic_volatility_ssm",
]
