"""Orbax checkpoint/resume (SURVEY.md §5 checkpoint row).

The reference snapshots ``{model, optimizer, epoch}`` with ``torch.save``
every N epochs and reloads via a ``--resume`` flag (ref:train.py†). Here:
async Orbax checkpoints of the full TrainState (params, BN stats, optimizer
state, step) so preemption loses at most one save interval.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import orbax.checkpoint as ocp

from ppn_tpu.train.steps import TrainState


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        self.mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save))

    def save(self, step: int, state: TrainState) -> None:
        self.mngr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(
        self, template: TrainState
    ) -> Optional[Tuple[int, TrainState]]:
        """Restore the newest checkpoint, or None. `template` supplies the
        pytree structure/shardings (a freshly-initialized TrainState)."""
        step = self.mngr.latest_step()
        if step is None:
            return None
        try:
            restored = self.mngr.restore(
                step, args=ocp.args.StandardRestore(template))
        except Exception as e:  # orbax raises various types on tree diffs
            raise RuntimeError(
                f"checkpoint at step {step} does not match the current "
                "TrainState structure (saved by an older framework "
                "version?); delete the checkpoint dir or pass "
                "resume=False") from e
        return step, restored

    def wait(self) -> None:
        self.mngr.wait_until_finished()

    def close(self) -> None:
        self.mngr.wait_until_finished()
        self.mngr.close()
