"""Checkpoint I/O (orbax) with save/auto-resume semantics.

Replaces DeepSpeed engine checkpoints (/root/reference/train_ds_medplib.py:
452-470, 517-521, 693-698): numbered step directories under `<dir>/ckpt`, a
`latest` marker, rank-0-style pruning of older checkpoints, and auto_resume
that restores the newest step. Exports (merged HF-style single trees) are
plain orbax saves of the merged params (utils/export.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, wait: bool = True):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Tuple[Any, Optional[int]]:
        """Restore into the template's shapes/shardings. Returns
        (state, step) or (template, None) if nothing to resume."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state_template, None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any):
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template: Optional[Any] = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), target=template)
