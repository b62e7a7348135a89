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

import jax
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


_PIPELINE_FILE = "pipeline_params.msgpack"


def export_pipeline_params(directory: str, params: dict):
    """Save a full merged pipeline param dict (keys: unet, vae, clip,
    mask_token[, projector, controlnet]) — the counterpart of the
    reference's final pipeline.save_pretrained (src/train.py:797-805).
    Stored as flax msgpack: topology-independent (Orbax checkpoints pin the
    saving run's device shardings) and loadable without a tree template.
    Loadable by tvi.pipelines.factory.build_pipeline(params=...)."""
    import numpy as np
    from flax import serialization

    os.makedirs(directory, exist_ok=True)
    host = jax.tree.map(lambda x: np.asarray(x), params)
    with open(os.path.join(directory, _PIPELINE_FILE), "wb") as fh:
        fh.write(serialization.msgpack_serialize(host))


def load_pipeline_params(directory: str) -> dict:
    """Restore params exported by export_pipeline_params; accepts either
    the export directory itself or a trainer output_dir containing
    pipeline/."""
    from flax import serialization

    for cand in (os.path.join(directory, "pipeline", _PIPELINE_FILE),
                 os.path.join(directory, _PIPELINE_FILE)):
        if os.path.exists(cand):
            with open(cand, "rb") as fh:
                tree = serialization.msgpack_restore(fh.read())
            if not isinstance(tree, dict) or "unet" not in tree:
                raise ValueError(
                    f"{cand} does not hold exported pipeline params "
                    f"(keys: {sorted(tree) if isinstance(tree, dict) else type(tree)})")
            return tree
    raise FileNotFoundError(
        f"no {_PIPELINE_FILE} under {directory} (or {directory}/pipeline) — "
        "trainer TrainState checkpoints hold only the trainable subset; "
        "run training to completion or call export_pipeline_params")
