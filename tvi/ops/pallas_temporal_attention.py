"""Pallas kernel for temporal (frame-axis) self-attention.

The UNet's temporal self-attention runs tiny F-token attentions (F = 14-40)
over a huge batch of pixel rows (B*H*W ~ 18k at the headline geometry).
Through XLA this materializes the fp32 logits in HBM (~0.9 GB/layer through
softmax) — ablation shows ~240 ms/step spent here.  This kernel keeps each
row-block's (BR, F, F) logits entirely in VMEM: per program it loads
(BR, F, D) q/k/v tiles for one head, does the batched QK^T, softmax, and PV
on-chip, and writes only the (BR, F, D) output.

Layout: (R, F, H, D) — exactly what tvi.models.layers.Attention produces
after the QKV reshape, so no extra transposes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 256


def _rows_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # blocks are (BR, F, D) with (row, head) pre-folded into the leading
    # batch dim by the caller (Mosaic matmul supports one batch dim and
    # in-kernel transposes of 4-D tiles fail to compile)
    q, k, v = q_ref[:], k_ref[:], v_ref[:]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * scale     # (BR, F, F)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)             # (BR, F, D)
    o_ref[:] = o.astype(o_ref.dtype)


def temporal_rows_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                            scale: float) -> jax.Array:
    """Pure-XLA math of _rows_kernel on the (R, F, H, D) layout — used as
    the kernel's backward (tvi/ops/diffable.py) and by the parity tests."""
    logits = jnp.einsum("rfhd,rghd->rhfg", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("rhfg,rghd->rfhd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def temporal_rows_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            scale: float, block_r: int = BLOCK_R,
                            interpret: bool = False) -> jax.Array:
    """Differentiable wrapper: Pallas forward, reference-XLA backward
    (the (R*H, F, F) logits are tiny — no chunking needed)."""
    from tvi.ops.diffable import pallas_with_reference_vjp

    fused = functools.partial(_temporal_rows_fwd, scale=scale,
                              block_r=block_r, interpret=interpret)
    ref = functools.partial(temporal_rows_reference, scale=scale)
    return pallas_with_reference_vjp(fused, ref, q, k, v)


@functools.partial(jax.jit, static_argnames=("scale", "block_r", "interpret"))
def _temporal_rows_fwd(q: jax.Array, k: jax.Array, v: jax.Array,
                       scale: float, block_r: int = BLOCK_R,
                       interpret: bool = False) -> jax.Array:
    """q/k/v: (R, F, H, D) — per-row F-frame self-attention, independent
    across rows R and heads H.  Returns (R, F, H, D)."""
    r, f, h, d = q.shape

    def fold(x):  # (R, F, H, D) -> (R*H, F, D)
        return jnp.swapaxes(x, 1, 2).reshape(r * h, f, d)

    q, k, v = fold(q), fold(k), fold(v)
    rh = r * h
    pad_r = (-rh) % block_r
    if pad_r:
        pad = ((0, pad_r), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    rp = q.shape[0]
    grid = (rp // block_r,)
    spec = pl.BlockSpec((block_r, f, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(_rows_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rp, f, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(64 * 1024 * 1024),
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * rp * h * f * f * d,
            bytes_accessed=4 * rp * h * f * d * 2,
            transcendentals=rp * h * f * f,
        ),
        interpret=interpret,
    )(q, k, v)
    out = out[:rh].reshape(r, h, f, d)
    return jnp.swapaxes(out, 1, 2)


def temporal_rows_eligible(r: int, f: int, d: int, h: int = 1,
                           block_r: int = BLOCK_R) -> bool:
    """Small frame counts, MXU-friendly head dim, enough rows to tile."""
    if f > 64 or d % 64 != 0 or r < block_r:
        return False
    # per-program VMEM: 4 double-buffered (BR,F,H,D) bf16 tiles +
    # (BR,H,F,F) fp32 logits
    vmem = 4 * 2 * block_r * f * h * d * 2 + block_r * h * f * f * 4
    return vmem < 56 * 1024 * 1024
