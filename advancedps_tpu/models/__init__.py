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

from .levy import GammaProcess, LevyLangevinDynamics, LevyPrior, levy_ssm
from .gp_ssm import GPDynamics, SqExponentialKernel, gp_ssm

__all__ += [
    "GammaProcess",
    "LevyLangevinDynamics",
    "LevyPrior",
    "levy_ssm",
    "GPDynamics",
    "SqExponentialKernel",
    "gp_ssm",
]
