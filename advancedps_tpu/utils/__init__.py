from .trees import pytree_dataclass, static_field, replace
from .kalman import kalman_filter, KalmanResult

__all__ = [
    "pytree_dataclass",
    "static_field",
    "replace",
    "kalman_filter",
    "KalmanResult",
]
