"""Parameter partitioning: trainable vs frozen subsets.

The reference freezes everything except the UNet's temporal transformer
blocks + the projector (src/train.py:401-410; the decoupled trainer adds the
motion encoder, train_decouples.py:704-720; the subproject trains the whole
ControlNet, train_svd.py:898-921).  In JAX this is an explicit pytree split:
gradients and optimizer state exist only for the trainable subset — the
frozen majority is a closed-over constant, which also keeps AdamW state
memory at ~2x the temporal subset instead of 2x the model.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
from flax import traverse_util


def partition_params(params, is_trainable: Callable[[str], bool]) -> Tuple[dict, dict]:
    """Split a flax variables dict into (trainable, frozen) by path substring
    predicate over '/'-joined key paths."""
    flat = traverse_util.flatten_dict(params, sep="/")
    train = {k: v for k, v in flat.items() if is_trainable(k)}
    frozen = {k: v for k, v in flat.items() if not is_trainable(k)}
    return (traverse_util.unflatten_dict(train, sep="/"),
            traverse_util.unflatten_dict(frozen, sep="/"))


def merge_params(trainable, frozen) -> dict:
    flat = dict(traverse_util.flatten_dict(frozen, sep="/"))
    flat.update(traverse_util.flatten_dict(trainable, sep="/"))
    return traverse_util.unflatten_dict(flat, sep="/")


def temporal_predicate(path: str) -> bool:
    """Reference selection: names containing 'temporal_transformer_block'
    (src/train.py:402-406)."""
    return "temporal_transformer_blocks" in path


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
