"""Checkpoint / resume on orbax.

A strict superset of the reference's ``torch.save(state_dict)`` flow
(reference scripts/train.py:172-184 saves weights only, every epoch +
every ``save_iter``): here the full (params, batch_stats, opt_state, step)
train state is saved, enabling exact auto-resume; evaluation loads with
missing-key tolerance like the reference's ``strict=False``
(scripts/eval.py:42).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, checkpoint_path: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(checkpoint_path)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(int(step), args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        return self._mgr.restore(int(step),
                                 args=ocp.args.StandardRestore(state_template))

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str, variables: Any) -> None:
    """One-shot save of model variables (for eval-only checkpoints)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))
