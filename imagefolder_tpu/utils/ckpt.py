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
    """States passed in are host (device_get) trees; in a multi-process run
    only process 0 writes (reference rank-0 ``torch.save`` gating,
    ``xqgan_train.py:571``). Every process restores (shared filesystem
    assumed, as upstream)."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = Path(directory).absolute()
        self._primary = jax.process_index() == 0
        if self._primary:
            self.directory.mkdir(parents=True, exist_ok=True)
        self._barrier("mkdir")  # non-primary waits for the tree to exist
        # every process constructs (and calls) the same manager — orbax is
        # multi-process aware (primary-host writes, internal syncs), so all
        # paths go through the public API instead of hardcoding the layout
        self._mgr = ocp.CheckpointManager(
            str(self.directory / "ckpts"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        self._best = ocp.StandardCheckpointer()
        self.best_metric: Optional[float] = None

    def _barrier(self, tag: str):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_{tag}")

    def save(self, step: int, state: Any):
        # called on every process; orbax gates the actual writes internally
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def save_best(self, state: Any, metric: float, lower_is_better=True):
        """best-by-val-FID checkpoint (xqgan_train.py save_best)."""
        if self.best_metric is None or (
            metric < self.best_metric if lower_is_better else metric > self.best_metric
        ):
            self.best_metric = metric
            path = self.directory / "best"
            # force=True: orbax removes any previous best (primary-gated +
            # internally synced across processes)
            self._best.save(path, state, force=True)
            self._best.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        if not self._primary:
            self._mgr.reload()  # pick up steps written by the primary
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Auto-resume (reference utils/misc.py:344-357 glob-by-mtime)."""
        self._barrier("pre_restore")
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, 0
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_template))
        except Exception as e:
            raise RuntimeError(
                f"checkpoint at step {step} does not match the current "
                "train-state tree — optimizer/state structure may have "
                "changed across code versions (e.g. the optax chain). "
                "Restore with the code revision that wrote it, or start "
                "fresh without --resume.") from e
        return restored, step

    def save_data_state(self, step: int, state: Optional[bytes]):
        """Persist the loader iterator state (PrefetchIterator.state) so a
        resumed run continues the exact batch stream (reference
        DistInfiniteBatchSampler.start_ep/start_it,
        utils/data_sampler.py:67-103). Per-process: every host owns its own
        shard's stream."""
        if state is None:
            return
        self.directory.mkdir(parents=True, exist_ok=True)
        path = self.directory / f"data_state_rank{jax.process_index()}.bin"
        tmp = path.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            f.write(step.to_bytes(8, "little") + state)
        os.replace(tmp, path)

    def restore_data_state(self, step: int) -> Optional[bytes]:
        """Returns the loader state saved at `step`, or None when absent or
        from a different step (fall back to a fresh stream, as upstream)."""
        path = self.directory / f"data_state_rank{jax.process_index()}.bin"
        if not path.exists():
            return None
        blob = path.read_bytes()
        saved_step = int.from_bytes(blob[:8], "little")
        if saved_step != step:
            return None
        return blob[8:]

    def apply_data_state(self, step: int, iterator, log=print) -> bool:
        """restore_data_state + set_state with graceful fallback: a blob
        whose pipeline identity no longer matches (e.g. the loader was
        rebuilt between versions — grain validates repr(data_source)) starts
        a fresh stream instead of aborting the resumed run."""
        blob = self.restore_data_state(step)
        if blob is None:
            return False
        try:
            iterator.set_state(blob)
            return True
        except Exception as e:  # grain raises ValueError on identity change
            log(f"data-stream state incompatible with this loader ({e}); "
                "falling back to a fresh stream")
            return False

    def save_aux(self, step: int, aux: dict):
        """Small host-side trainer state that rides alongside the params
        (e.g. the VAR progressive-warmup counters, reference
        trainer.state_dict()); rank-0-written JSON, like the reference's
        trainer dict inside ar-ckpt*.pth (train.py:249-261)."""
        if not self._primary:
            return
        import json

        path = self.directory / "aux_state.json"
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"step": step, **aux}))
        os.replace(tmp, path)

    def restore_aux(self, step: int) -> Optional[dict]:
        """Aux state saved at `step`, or None when absent/from another step
        (callers keep their fresh defaults, matching upstream resume)."""
        path = self.directory / "aux_state.json"
        if not path.exists():
            return None
        import json

        try:
            d = json.loads(path.read_text())
        except ValueError:
            return None
        if d.pop("step", None) != step:
            return None
        return d

    def wait(self):
        self._mgr.wait_until_finished()
        self._barrier("wait")
