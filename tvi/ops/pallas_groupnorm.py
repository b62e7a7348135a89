"""Pallas TPU GroupNorm(+SiLU): two streaming passes at HBM bandwidth.

Why: the XLA formulation in tvi.ops.groupnorm (channel-first stats + fused
apply) measures only ~323 GB/s effective on the VAE decoder's up-block
tensors (scripts/perf_lab.py gn_up3: 7.0 ms at (5,576,1024,128) vs the
~2.8 ms 3-pass floor at ~819 GB/s HBM).  GroupNorm is pure memory traffic;
the floor is 3 passes over the tensor (stats read, apply read, write).  This
kernel pair streams blocks through VMEM with double-buffered DMA:

  kernel 1 (stats): grid (N, S/BS); per-channel sum and sum-of-squares
    accumulated in a revisited (1, C) fp32 output block (the S dimension is
    'arbitrary' so the accumulator stays VMEM-resident across the sweep).
  host combine: (N, C) -> per-group mean/var -> folded per-channel
    scale'/bias' (tiny math on (N, C)).
  kernel 2 (apply): grid (N, S/BS); y = silu(x * scale' + bias'), all
    elementwise with lane-uniform (per-channel) operands.

Matches tvi.ops.groupnorm.group_norm_silu (flax GroupNorm semantics,
use_fast_variance) to fp32 rounding.  Reference GN sites it accelerates:
diffusers ResnetBlock2D norm1/norm2 + SiLU and the VAE decoder norms
(reference src/models/ via unet_3d_blocks.py resnets; VAE conv_norm_out).

Dispatch: OPT-IN via TVI_PALLAS_GN=1 (tvi/ops/groupnorm.py).  The XLA
formulation is the default: in context XLA fuses the GN apply pass into
neighboring ops, and this standalone kernel pair REGRESSED end-to-end
(PERF.md round-2 post-mortem #1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large blocks amortize per-grid-step overhead: at (5,576,1024,128) a
# 1024-row block means 2880 programs/pass and measured only 168 GB/s; the
# DMA pipeline needs MB-scale blocks to stream at HBM bandwidth.
_TARGET_BLOCK_ROWS = 8192


def _stats_kernel(x_ref, s_ref, s2_ref):
    # stats accumulators are (N, 1, C) arrays with (1, 1, C) blocks: the
    # trailing (1, C) equals the array dims, which Mosaic accepts where a
    # (1, C) block of an (N, C) array would violate the 8-sublane rule.
    sb = pl.program_id(1)

    @pl.when(sb == 0)
    def _init():
        s_ref[:] = jnp.zeros_like(s_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    x = x_ref[0].astype(jnp.float32)           # (BS, C)
    s_ref[:] += jnp.sum(x, axis=0, keepdims=True)[None]
    s2_ref[:] += jnp.sum(jnp.square(x), axis=0, keepdims=True)[None]


def _apply_kernel(x_ref, sc_ref, bi_ref, o_ref, *, apply_silu: bool):
    x = x_ref[0].astype(jnp.float32)           # (BS, C)
    y = x * sc_ref[0] + bi_ref[0]
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


_TARGET_BLOCK_BYTES = 4 * 1024 * 1024  # bf16 block; ~4x this live with
                                       # double buffering + fp32 temps


def _pick_block_rows(s: int, c: int) -> int:
    """Largest divisor of s that is a multiple of 16 (bf16 sublane tile)
    and keeps the (bs, c) bf16 block under the VMEM target; 0 if none."""
    cap = min(s, _TARGET_BLOCK_ROWS, _TARGET_BLOCK_BYTES // (2 * c))
    best = 0
    for bs in range(16, cap + 1, 16):
        if s % bs == 0:
            best = bs
    return best


def pallas_gn_eligible(shape, num_groups: int) -> int:
    """Returns the block-rows to use, or 0 if the XLA path should run."""
    c = shape[-1]
    s = 1
    for d in shape[1:-1]:
        s *= d
    if c % 128 or c % num_groups or s < 16:
        return 0
    return _pick_block_rows(s, c)


@functools.partial(jax.jit,
                   static_argnames=("num_groups", "eps", "apply_silu",
                                    "block_rows", "interpret"))
def pallas_group_norm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array,
                           num_groups: int, eps: float = 1e-5,
                           apply_silu: bool = True, block_rows: int = 0,
                           interpret: bool = False) -> jax.Array:
    """x: (N, ..., C); scale/bias: (C,).  Normalizes each leading-dim
    instance over (spatial..., C/num_groups) groups, exactly like
    tvi.ops.groupnorm.group_norm_silu."""
    n, c = x.shape[0], x.shape[-1]
    shape = x.shape
    x2 = x.reshape(n, -1, c)
    s = x2.shape[1]
    bs = block_rows or _pick_block_rows(s, c)
    if not bs:
        raise ValueError(f"no 16-multiple block divides S={s}")
    grid = (n, s // bs)

    sums, sumsq = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, bs, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * n * s * c, bytes_accessed=n * s * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2)

    # tiny host-side group combine + affine fold on (N, C)
    cg = c // num_groups
    cnt = s * cg
    gs = sums.reshape(n, num_groups, cg).sum(-1)
    gs2 = sumsq.reshape(n, num_groups, cg).sum(-1)
    mean = gs / cnt
    var = gs2 / cnt - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)                       # (N, G)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)                # (N, C)
    mean_c = jnp.repeat(mean, cg, axis=-1)
    sc = (rstd_c * scale.astype(jnp.float32)[None])[:, None]   # (N, 1, C)
    bi = (bias.astype(jnp.float32)[None] - mean_c
          * (rstd_c * scale.astype(jnp.float32)[None]))[:, None]

    out = pl.pallas_call(
        functools.partial(_apply_kernel, apply_silu=apply_silu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * s * c,
            bytes_accessed=2 * n * s * c * x.dtype.itemsize,
            transcendentals=n * s * c,
        ),
        interpret=interpret,
    )(x2, sc, bi)
    return out.reshape(shape)
