from .trees import pytree_dataclass, static_field, replace
from .kalman import kalman_filter, kalman_smoother, KalmanResult
from .checkpoint import ChainCheckpoint, restore_chain, resume_chain, save_chain

__all__ = [
    "pytree_dataclass",
    "static_field",
    "replace",
    "kalman_filter",
    "kalman_smoother",
    "KalmanResult",
    "ChainCheckpoint",
    "save_chain",
    "restore_chain",
    "resume_chain",
]
