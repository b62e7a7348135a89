"""Checkpoint save/restore with rotation — the TPU-native replacement for
accelerate ``save_state``/hooks (src/train.py:331-375,677-705).

Uses Orbax CheckpointManager: ``checkpoint-<step>`` directories, rotation to
``checkpoints_total_limit``, resume-from-latest (reference resume logic at
src/train.py:278-287 reads the global step from the directory name — Orbax
tracks steps natively).  Works multi-host via Orbax's multihost support.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, total_limit: Optional[int] = None,
                 save_interval_steps: int = 1):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=total_limit,
                save_interval_steps=save_interval_steps,
                create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, tree: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(tree))

    def restore_latest(self, abstract_tree: Any = None):
        """Returns (step, tree) or (None, None) when no checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None, None
        if abstract_tree is not None:
            tree = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_tree))
        else:
            tree = self._mgr.restore(step)
        return step, tree

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()

    def all_steps(self):
        return self._mgr.all_steps()
