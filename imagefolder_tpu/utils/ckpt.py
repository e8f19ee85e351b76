"""Orbax checkpointing (replaces the reference's three checkpoint formats:
monolithic torch.save dicts for the tokenizer ``xqgan_train.py:571-606``,
trainer-dict ``ar-ckpt*.pth`` for VAR ``train.py:249-261``, and Accelerate
save_state for RAR ``train_utils.py:954-983``).

Keeps the reference semantics: ``last``/``best`` checkpoints, auto-resume
from the latest step, EMA included in the state tree.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            str(self.directory / "ckpts"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        self._best = ocp.StandardCheckpointer()
        self.best_metric: Optional[float] = None

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def save_best(self, state: Any, metric: float, lower_is_better=True):
        """best-by-val-FID checkpoint (xqgan_train.py save_best)."""
        if self.best_metric is None or (
            metric < self.best_metric if lower_is_better else metric > self.best_metric
        ):
            self.best_metric = metric
            path = self.directory / "best"
            if path.exists():
                import shutil

                shutil.rmtree(path)
            self._best.save(path, state)
            self._best.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Auto-resume (reference utils/misc.py:344-357 glob-by-mtime)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, 0
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def wait(self):
        self._mgr.wait_until_finished()
