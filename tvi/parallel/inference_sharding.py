"""Multi-chip inference sharding for the denoiser.

The reference has no inference parallelism (one GPU per pipeline,
SURVEY §2.6); on TPU a pod slice can serve ONE video faster by sharding the
denoise step over the mesh:

- ``data`` axis: the CFG pair / batch dimension (uncond on one group, cond
  on the other — embarrassingly parallel, psum-free),
- ``model`` axis: the latent HEIGHT dimension (XLA SPMD spatially
  partitions the convs with halo exchanges over ICI and all-gathers K/V for
  the spatial attention; temporal attention is per-pixel and needs no
  communication).

``shard_unet_step`` returns a jitted UNet forward with these shardings
bound.  Validated on the 8-device CPU mesh in tests (the driver's
``dryrun_multichip`` exercises the data axis; this covers data x model).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tvi.parallel.mesh import DATA_AXIS, MODEL_AXIS


def shard_unet_step(unet, mesh: Mesh):
    """Returns jitted fn(params, sample, timestep, ctx, added_time_ids).

    sample: (B, F, H, W, C) — B sharded over data, H over model; params
    replicated; output sharded like sample.
    """
    repl = NamedSharding(mesh, P())
    sample_sh = NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS, None, None))
    ctx_sh = NamedSharding(mesh, P(DATA_AXIS, None, None))
    ids_sh = NamedSharding(mesh, P(DATA_AXIS, None))

    def fwd(params, sample, timestep, ctx, added_time_ids):
        out, _ = unet.apply(params, sample, timestep, ctx, added_time_ids)
        return out

    return jax.jit(
        fwd,
        in_shardings=(repl, sample_sh, repl,
                      (ctx_sh, ctx_sh), ids_sh),
        out_shardings=sample_sh,
    )
