"""Checkpoint / resume for PG(AS) chains.

The reference has no checkpointing (SURVEY.md §5.4): a chain's resumable state is
just ``PGState(trajectory)`` held in memory by AbstractMCMC.  Here the chain state
is a small pytree — retained trajectory plus the chain key and iteration counter —
serialised with **orbax** when available, with a NumPy ``.npz`` fallback so
checkpointing works in minimal environments.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..pg import PGState

__all__ = ["ChainCheckpoint", "save_chain", "restore_chain"]


class ChainCheckpoint(NamedTuple):
    """Everything needed to resume a PG(AS) chain deterministically."""

    trajectory: Any  # retained trajectory pytree [T, ...]
    key: jax.Array  # chain key (positional randomness ⇒ full reproducibility)
    iteration: int

    @property
    def state(self) -> PGState:
        return PGState(trajectory=self.trajectory)


def _try_orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:  # pragma: no cover - environment without orbax
        return None


def save_chain(path: str, state: PGState, key: jax.Array, iteration: int) -> None:
    """Persist a chain checkpoint to ``path`` (directory for orbax, ``.npz``
    file otherwise)."""
    payload = {
        "trajectory": state.trajectory,
        "key": jax.random.key_data(key),
        "iteration": jnp.asarray(iteration),
    }
    ocp = _try_orbax()
    if ocp is not None and not path.endswith(".npz"):
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), payload, force=True)
        return
    np.savez(
        path,
        trajectory=np.asarray(payload["trajectory"]),
        key=np.asarray(payload["key"]),
        iteration=np.asarray(payload["iteration"]),
    )


def restore_chain(path: str) -> ChainCheckpoint:
    """Load a chain checkpoint previously written by :func:`save_chain`."""
    ocp = _try_orbax()
    if ocp is not None and not path.endswith(".npz") and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        payload = ckptr.restore(os.path.abspath(path))
    else:
        data = np.load(path)
        payload = {
            "trajectory": jnp.asarray(data["trajectory"]),
            "key": jnp.asarray(data["key"]),
            "iteration": jnp.asarray(data["iteration"]),
        }
    key = jax.random.wrap_key_data(jnp.asarray(payload["key"]))
    return ChainCheckpoint(
        trajectory=jnp.asarray(payload["trajectory"]),
        key=key,
        iteration=int(payload["iteration"]),
    )


def resume_chain(path: str, model, sampler, n_more: int):
    """Convenience: restore a checkpoint and continue the chain for ``n_more``
    iterations (deterministic continuation: iteration indices keep advancing the
    positional key stream exactly as an uninterrupted run would)."""
    from ..inference import step_pg

    ck = restore_chain(path)
    st = ck.state
    samples = []
    for i in range(ck.iteration, ck.iteration + n_more):
        smp, st = step_pg(jax.random.fold_in(ck.key, i), model, sampler, st)
        samples.append(smp)
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *samples)
    return stacked, st, ck.iteration + n_more
