"""Mid-run checkpoint / resume via orbax.

The reference has save-only artifacts (best state kept in host memory,
persisted once at the end — finetune.py:248-261, 395-403) and recovers
failures only at sweep-combo granularity (idempotent re-runs).  This module
adds step-level checkpointing: the jitted train loop periodically hands its
full state (params, optimizer state, iteration counter, best-so-far) to an
orbax CheckpointManager, and a restarted run resumes from the latest step.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


class TrainCheckpointer:
    """Thin orbax wrapper: save/restore a pytree state by step number."""

    def __init__(self, directory: str | None, max_to_keep: int = 2):
        self._mgr = None
        if directory:
            import orbax.checkpoint as ocp

            self._mgr = ocp.CheckpointManager(
                os.path.abspath(directory),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, create=True),
            )

    @property
    def enabled(self) -> bool:
        return self._mgr is not None

    def save(self, step: int, state: Any) -> None:
        if self._mgr is None:
            return
        import orbax.checkpoint as ocp

        state = jax.tree.map(np.asarray, state)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step() if self._mgr is not None else None

    def restore_latest(self, like: Any):
        """-> (step, state) or (None, None); ``like`` provides the tree
        structure/shapes to restore into."""
        if self._mgr is None:
            return None, None
        step = self._mgr.latest_step()
        if step is None:
            return None, None
        import orbax.checkpoint as ocp

        like_np = jax.tree.map(np.asarray, like)
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(like_np))
        return step, state

    def close(self):
        if self._mgr is not None:
            self._mgr.close()
