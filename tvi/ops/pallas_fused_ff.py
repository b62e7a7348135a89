"""Fused whole-FeedForward Pallas kernel: LN -> GEGLU -> out-projection ->
(+residual) in ONE kernel, weights resident.

Why: with the GEGLU input projection fused (tvi/ops/pallas_geglu.py) and the
out-projection a separate XLA matmul, the gated (M, inner) intermediate
still round-trips HBM between the two — ~2.4 GB r+w per 320-wide FF call at
the headline geometry, ~130 ms/step summed over every FF site
(PERF.md round-3 traffic tally).  The LayerNorm before the FF and the
residual add after it are two more full-tensor passes.  This kernel holds a
row block in VMEM through the whole sublayer:

    y = x + (geglu(ln(x) @ W1 + b1) @ W2 + b2)

HBM traffic collapses to read x + write y + (resident) weights.  Eligible
at EVERY SVD FF width: the largest weight set (C=1280: W1 1280x10240 +
W2 5120x1280 bf16 = 39 MB) fits the 100 MB VMEM budget.

Replaces the reference's FeedForward(+norm3 LayerNorm, +residual) pairs in
BasicTransformerBlock / TemporalBasicTransformerBlock
(reference src/models/attention.py:481-535 FeedForward; block wiring
:318-346 and :433-476).  Exact (erf) gelu, fp32 LN stats and fp32 matmul
accumulation — matches the unfused path to bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvi.ops.pallas_geglu import _erf

BM = 256


def _ln_rows(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _fused_ff_kernel(x_ref, lns_ref, lnb_ref, wh_ref, wg_ref, bh_ref, bg_ref,
                     w2_ref, b2_ref, o_ref, *, eps: float, with_ln: bool,
                     residual: bool):
    x = x_ref[:]                                    # (BM, C)
    h_in = (_ln_rows(x, lns_ref[0], lnb_ref[0], eps).astype(x.dtype)
            if with_ln else x)
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
    h = mm(h_in, wh_ref[:]) + bh_ref[:].astype(jnp.float32)
    g = mm(h_in, wg_ref[:]) + bg_ref[:].astype(jnp.float32)
    gated = (h * (0.5 * g * (1.0 + _erf(g * 0.7071067811865476)))).astype(x.dtype)
    y = mm(gated, w2_ref[:]) + b2_ref[:].astype(jnp.float32)
    if residual:
        y = y + x.astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def fused_ff_reference(x: jax.Array, ln_scale, ln_bias, w1: jax.Array,
                       b1: jax.Array, w2: jax.Array, b2: jax.Array,
                       eps: float = 1e-5,
                       residual: bool = True) -> jax.Array:
    """Pure-XLA math of _fused_ff_kernel (exact erf) — backward path +
    parity oracle."""
    inner = w2.shape[0]
    h_in = x
    if ln_scale is not None:
        h_in = _ln_rows(x, ln_scale, ln_bias, eps).astype(x.dtype)
    mm = lambda a, wn: jnp.dot(a, wn, preferred_element_type=jnp.float32)
    h = mm(h_in, w1[:, :inner]) + b1[:inner].astype(jnp.float32)
    g = mm(h_in, w1[:, inner:]) + b1[inner:].astype(jnp.float32)
    gated = (h * (0.5 * g * (1.0 + jax.lax.erf(g * 0.7071067811865476)))
             ).astype(x.dtype)
    y = mm(gated, w2) + b2.astype(jnp.float32)
    if residual:
        y = y + x.astype(jnp.float32)
    return y.astype(x.dtype)


def fused_feedforward(x: jax.Array, ln_scale, ln_bias, w1: jax.Array,
                      b1: jax.Array, w2: jax.Array, b2: jax.Array,
                      eps: float = 1e-5, residual: bool = True,
                      bm: int = BM, interpret: bool = False) -> jax.Array:
    """Differentiable wrapper: Pallas forward, row-chunked reference-XLA
    backward (tvi/ops/diffable.py::chunked_ff_reference bounds the
    backward's live GEGLU intermediates to one row block)."""
    from tvi.ops.diffable import chunked_ff_reference, pallas_with_reference_vjp

    fused = functools.partial(_fused_ff_fwd, eps=eps, residual=residual,
                              bm=bm, interpret=interpret)
    ref = functools.partial(chunked_ff_reference, eps=eps, residual=residual)
    return pallas_with_reference_vjp(fused, ref, x, ln_scale, ln_bias,
                                     w1, b1, w2, b2)


@functools.partial(jax.jit, static_argnames=("eps", "residual", "bm",
                                             "interpret"))
def _fused_ff_fwd(x: jax.Array, ln_scale, ln_bias, w1: jax.Array,
                  b1: jax.Array, w2: jax.Array, b2: jax.Array,
                  eps: float = 1e-5, residual: bool = True,
                  bm: int = BM, interpret: bool = False) -> jax.Array:
    """x: (M, C); ln_scale/ln_bias: (C,) or None (skip the fused LN);
    w1: (C, 2*inner) [hidden | gate]; b1: (2*inner,); w2: (inner, C_out);
    b2: (C_out,).  Returns x + ff(ln(x)) (residual requires C_out == C)."""
    m, c = x.shape
    inner = w2.shape[0]
    c_out = w2.shape[1]
    with_ln = ln_scale is not None
    if not with_ln:
        ln_scale = jnp.ones((c,), jnp.float32)
        ln_bias = jnp.zeros((c,), jnp.float32)
    wh, wg = w1[:, :inner], w1[:, inner:]
    bh, bg = b1[:inner].reshape(1, inner), b1[inner:].reshape(1, inner)
    lns = ln_scale.reshape(1, c)
    lnb = ln_bias.reshape(1, c)
    pad_m = (-m) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = x.shape[0]
    grid = (mp // bm,)
    row_spec = pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_ff_kernel, eps=eps, with_ln=with_ln,
                          residual=residual),
        grid=grid,
        in_specs=[row_spec, w_spec(lns), w_spec(lnb), w_spec(wh), w_spec(wg),
                  w_spec(bh), w_spec(bg), w_spec(w2), w_spec(b2.reshape(1, c_out))],
        out_specs=pl.BlockSpec((bm, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * c * 2 * inner + 2 * mp * inner * c_out,
            bytes_accessed=(mp * c + mp * c_out) * 2
            + (c * 2 * inner + inner * c_out) * 2,
            transcendentals=mp * inner,
        ),
        interpret=interpret,
    )(x, lns, lnb, wh, wg, bh, bg, w2, b2.reshape(1, c_out))
    return out[:m]


def fused_ff_eligible(m: int, c: int, inner2: int, c_out: int) -> bool:
    """All SVD FF widths qualify; gate on tiling alignment + weight VMEM."""
    inner = inner2 // 2
    # every BlockSpec here uses full-width trailing dims (== array dims),
    # so lane-ragged C (320) is fine; inner stays 128-aligned for the
    # [hidden | gate] split
    if m < BM or c % 8 or inner % 128 or c_out % 8:
        return False
    # measured (scripts/perf_lab.py fff_*): 76.9 vs 58.9 TF/s at C=320,
    # 107.5 vs 99.2 at C=640, but 104.3 vs 107.3 at C=1280 — the 39 MB
    # resident weight set crowds out pipelining.  Gate on weight bytes.
    weights = (c * inner2 + inner * c_out) * 2
    if weights > 20 * 1024 * 1024:
        return False
    work = BM * (2 * inner * 4 + inner * 2 + (c + c_out) * 4)
    return weights + work < 96 * 1024 * 1024
