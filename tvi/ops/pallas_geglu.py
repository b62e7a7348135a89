"""Fused GEGLU feed-forward input projection: (x@Wh + bh) * gelu(x@Wg + bg)
in one Pallas kernel.

Why: the UNet's GEGLU FFs materialize an (M, 2*inner) bf16 intermediate
(~2.4 GB at the headline geometry) that is written once and read twice
(split + gelu + mul).  Fusing the two matmuls with the gating epilogue keeps
the intermediate in VMEM tiles.

Grid (M/BM, N/BN); the full K dim stays resident per program (K <= 1280 in
SVD).  Exact (erf) gelu matching flax nn.gelu(approximate=False).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 256
BN = 512


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7) — Pallas TPU has
    no erf lowering; exp is supported."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _geglu_kernel(x_ref, wh_ref, wg_ref, bh_ref, bg_ref, o_ref):
    x = x_ref[:]
    h = jax.lax.dot_general(
        x, wh_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) + bh_ref[:].astype(jnp.float32)
    g = jax.lax.dot_general(
        x, wg_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) + bg_ref[:].astype(jnp.float32)
    gelu_g = 0.5 * g * (1.0 + _erf(g * 0.7071067811865476))
    o_ref[:] = (h * gelu_g).astype(o_ref.dtype)


def geglu_reference(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Pure-XLA math of _geglu_kernel (exact erf; the kernel's A&S 7.1.26
    approximation is within 1.5e-7) — backward path + parity oracle."""
    n = w.shape[1] // 2
    mm = lambda a, wn: jnp.dot(a, wn, preferred_element_type=jnp.float32)
    h = mm(x, w[:, :n]) + b[:n].astype(jnp.float32)
    g = mm(x, w[:, n:]) + b[n:].astype(jnp.float32)
    gelu_g = 0.5 * g * (1.0 + jax.lax.erf(g * 0.7071067811865476))
    return (h * gelu_g).astype(x.dtype)


def geglu_project(x: jax.Array, w: jax.Array, b: jax.Array,
                  interpret: bool = False, bm: int = BM,
                  bn0: int = BN) -> jax.Array:
    """Differentiable wrapper: Pallas forward, reference-XLA backward
    (tvi/ops/diffable.py)."""
    from tvi.ops.diffable import pallas_with_reference_vjp

    fused = functools.partial(_geglu_fwd, interpret=interpret, bm=bm,
                              bn0=bn0)
    return pallas_with_reference_vjp(fused, geglu_reference, x, w, b)


@functools.partial(jax.jit, static_argnames=("interpret", "bm", "bn0"))
def _geglu_fwd(x: jax.Array, w: jax.Array, b: jax.Array,
               interpret: bool = False, bm: int = BM,
               bn0: int = BN) -> jax.Array:
    """x (M, K); w (K, 2N) with [hidden | gate] halves; b (2N,).
    Returns (M, N) = (x@w_h + b_h) * gelu(x@w_g + b_g)."""
    m, k = x.shape
    n2 = w.shape[1]
    n = n2 // 2
    wh, wg = w[:, :n], w[:, n:]
    bh, bg = b[:n].reshape(1, n), b[n:].reshape(1, n)
    pad_m = (-m) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = x.shape[0]
    # bn must DIVIDE n or the grid leaves output columns unwritten
    bn = next(c for c in (bn0, 384, 256, 128) if n % c == 0)
    grid = (mp // bm, n // bn)
    out = pl.pallas_call(
        _geglu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(64 * 1024 * 1024),
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * mp * k * n,
            bytes_accessed=(mp * k + 2 * k * n + mp * n) * 2,
            transcendentals=mp * n,
        ),
        interpret=interpret,
    )(x, wh, wg, bh, bg)
    return out[:m]


def geglu_eligible(m: int, k: int, n2: int) -> bool:
    n = n2 // 2
    return (m >= BM and k % 8 == 0 and n % 128 == 0
            and k <= 2048)
