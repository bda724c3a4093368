from .trees import pytree_dataclass, static_field, replace
from .kalman import kalman_filter, KalmanResult
from .checkpoint import ChainCheckpoint, restore_chain, resume_chain, save_chain

__all__ = [
    "pytree_dataclass",
    "static_field",
    "replace",
    "kalman_filter",
    "KalmanResult",
    "ChainCheckpoint",
    "save_chain",
    "restore_chain",
    "resume_chain",
]
