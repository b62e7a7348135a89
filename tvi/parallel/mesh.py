"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's accelerate/NCCL DDP layer (accelerate_config/*.yaml,
src/train.py:194-201,451).

The reference's only distributed strategy is single-node data parallelism
(SURVEY §2.6).  Here that becomes a 1-D (or 2-D data×model) ``jax.sharding.Mesh``:
batches are sharded along the ``data`` axis, parameters are replicated (the
UNet is ~1.5B params ≈ 3 GB bf16 — fits per chip), and XLA emits psum over
ICI for gradient reduction.  An optional ``model`` axis is provided as
headroom for sharding the (B·H·W) pixel-batch dimension of temporal
attention (sequence parallelism, SURVEY §2.6 row SP)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1   # -1: use all remaining devices
    model: int = 1

    def resolve(self, n_devices: Optional[int] = None) -> tuple[int, int]:
        n = n_devices if n_devices is not None else len(jax.devices())
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n // model)
        if data * model > n:
            raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
        return data, model


def maybe_initialize_distributed():
    """Multi-host bring-up: call once at trainer start.  No-op unless the
    standard JAX cluster env (JAX_COORDINATOR_ADDRESS / num processes) is
    set.  Replaces the reference's accelerate rendezvous
    (rdzv_backend: static + --main_process_port, src/train.sh:6)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def create_mesh(spec: MeshSpec = MeshSpec(), devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch dim over the data axis, replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Place a host batch pytree with dim `batch_axis` sharded over `data`
    (batch_axis=1 for gradient-accumulation batches shaped
    (accum, micro_batch, ...))."""
    def _put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x), batch_axis))
    return jax.tree.map(_put, batch)
