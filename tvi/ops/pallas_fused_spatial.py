"""Fused LayerNorm + QKV-projection + flash-attention Pallas kernels for the
UNet's spatial self-attention sublayer.

Why: with the bound-shift flash kernel near its d=64 MXU ceiling
(89.5 TFLOP/s, ~98 ceiling), the remaining in-context overhead of the
spatial sublayer is layout traffic: the norm1 LayerNorm round-trip, three
projection outputs written to HBM, the (BF, S, H, D) -> (B*H, S, D)
transposes in and out of the kernel (scripts/perf_lab.py attn_chain_*:
chain 77-86 ms vs ~66 ms kernel+projection floor at the (50, 9216, 320)
layer-0 shape).  This module removes those passes:

  kernel 1 (LN + K/V, head-major): grid (B, S/BS, H); each program
    LayerNorms a row block of x (recomputed per head — VPU-cheap) and writes
    k_h = ln(x) @ Wk[:, h], v_h likewise, directly into (B, H, S, 64) — the
    kernel-native layout, so no transpose ever materializes.
  kernel 2 (LN + Q + bound-shift flash): grid (B, H, S/BQ); q_h computed
    in-VMEM from the same LN'd block, then the Cauchy-Schwarz-shifted
    softmax attention against the resident K_h/V_h.  With ``guarded=True``
    (the default; the Attention caller derives it from TVI_ATTN_SHIFT and
    drops it only under ``bound_unguarded``) an in-kernel per-tile check
    recomputes via row-max when the shifted denominator underflows.
    Output lands head-major (B, H, S, 64).
  epilogue (XLA): out = einsum('bhsd,hdo->bso', o, Wo) + bo — XLA contracts
    head-major directly; no transpose op.

Replaces the reference's norm1 + AttnProcessor2_0 self-attention pair
(src/models/attention.py:84 BasicTransformerBlock.forward, attention math
src/models/attention_processor.py:1178) for long spatial sequences.

Weights are passed as flax-layout (C, inner) kernels; per-head slices are
taken by BlockSpec, so the parameter tree is unchanged (torch checkpoint
translation unaffected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634
_BLOCK_Q = 256
_BLOCK_KV = 1024


def _ln_rows(x, ln_scale, ln_bias, eps):
    """Row-wise LayerNorm over the lane (C) dim, fp32 stats, returns the
    input dtype.  Matches flax nn.LayerNorm (use_fast_variance)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale[0].astype(jnp.float32) + ln_bias[0].astype(jnp.float32)
    return y.astype(x.dtype)


def _kv_kernel(x_ref, lns_ref, lnb_ref, wk_ref, wv_ref, k_ref, v_ref, *,
               eps: float, with_ln: bool):
    x = x_ref[0]                                   # (BS, C)
    if with_ln:
        x = _ln_rows(x, lns_ref, lnb_ref, eps)
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
    k_ref[0, 0] = mm(x, wk_ref[0]).astype(k_ref.dtype)   # (BS, 64)
    v_ref[0, 0] = mm(x, wv_ref[0]).astype(v_ref.dtype)


def _q_flash_kernel(x_ref, lns_ref, lnb_ref, wq_ref, k_ref, v_ref, kn_ref,
                    o_ref, *, eps: float, with_ln: bool, scale: float,
                    kv_valid: int, guarded: bool):
    x = x_ref[0]                                   # (BQ, C)
    if with_ln:
        x = _ln_rows(x, lns_ref, lnb_ref, eps)
    q = jax.lax.dot_general(
        x, wq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)       # (BQ, 64) fp32
    c = scale * LOG2E
    qn = jnp.sqrt(jnp.sum(jnp.square(q), axis=-1, keepdims=True))
    from tvi.ops.pallas_attention import SHIFT_BACKOFF
    shift = qn * (kn_ref[0, 0, 0, 0] * c) - SHIFT_BACKOFF
    k = k_ref[0, 0]                                # (Sk, 64)
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * c   # (BQ, Sk) in log2
    masked = kv_valid < k.shape[0]
    col = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
           if masked else None)
    p = jnp.exp2(logits - shift)
    if masked:
        p = jnp.where(col < kv_valid, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if guarded:
        # same per-tile self-guard as _flash_bound_kernel
        def _rowmax(_):
            lg = (jnp.where(col < kv_valid, logits, -jnp.inf)
                  if masked else logits)
            m = jnp.max(lg, axis=-1, keepdims=True)
            p2 = jnp.exp2(lg - m)
            return p2, jnp.sum(p2, axis=-1, keepdims=True)

        # threshold scaled by the backoff: l carries a 2^60 factor
        p, l = jax.lax.cond(jnp.min(l) < 2.0 ** (-96 + SHIFT_BACKOFF), _rowmax,
                            lambda _: (p, l), None)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "eps",
                                             "guarded", "interpret"))
def fused_spatial_self_attention(x: jax.Array, ln_scale, ln_bias,
                                 wq: jax.Array, wk: jax.Array, wv: jax.Array,
                                 heads: int, scale: float,
                                 eps: float = 1e-5, guarded: bool = True,
                                 interpret: bool = False) -> jax.Array:
    """x: (B, S, C); ln_scale/ln_bias: (C,) or None (skip the fused LN);
    wq/wk/wv: (C, heads*64).  Returns head-major attention output
    (B, heads, S, 64) — contract with Wo via einsum('bhsd,hdo->bso').
    """
    b, s, cin = x.shape
    d = wq.shape[-1] // heads
    with_ln = ln_scale is not None
    if not with_ln:
        ln_scale = jnp.ones((cin,), jnp.float32)
        ln_bias = jnp.zeros((cin,), jnp.float32)
    lns = ln_scale.reshape(1, cin)
    lnb = ln_bias.reshape(1, cin)

    pad_s = (-s) % _BLOCK_KV
    xp = jnp.pad(x, ((0, 0), (0, pad_s), (0, 0))) if pad_s else x
    sk = xp.shape[1]

    # weights arrive flax-layout (C, H*64); reslice to (H, C, 64) so the
    # per-head block's trailing dims equal the array dims (Mosaic's
    # block-shape rule: a (C, 64) slice of (C, H*64) is rejected)
    to_hm = lambda w: jnp.transpose(w.reshape(cin, heads, d), (1, 0, 2))
    wq_h, wk_h, wv_h = to_hm(wq), to_hm(wk), to_hm(wv)

    w_spec = pl.BlockSpec((1, cin, d), lambda *idx: (idx[-1], 0, 0),
                          memory_space=pltpu.VMEM)
    ln_spec = pl.BlockSpec((1, cin), lambda *idx: (0, 0),
                           memory_space=pltpu.VMEM)

    k_hm, v_hm = pl.pallas_call(
        functools.partial(_kv_kernel, eps=eps, with_ln=with_ln),
        grid=(b, sk // _BLOCK_KV, heads),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_KV, cin), lambda bb, ss, hh: (bb, ss, 0),
                         memory_space=pltpu.VMEM),
            ln_spec, ln_spec, w_spec, w_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _BLOCK_KV, d),
                         lambda bb, ss, hh: (bb, hh, ss, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _BLOCK_KV, d),
                         lambda bb, ss, hh: (bb, hh, ss, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, heads, sk, d), x.dtype),
                   jax.ShapeDtypeStruct((b, heads, sk, d), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sk * cin * heads * d,
            bytes_accessed=(b * sk * cin + 2 * b * sk * heads * d) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, lns, lnb, wk_h, wv_h)

    knorm = jnp.max(
        jnp.sqrt(jnp.sum(jnp.square(k_hm.astype(jnp.float32)), axis=-1)),
        axis=-1)[..., None, None]                       # (B, H, 1, 1)

    block_q = _BLOCK_Q
    pad_q = (-s) % block_q
    xq = jnp.pad(x, ((0, 0), (0, pad_q), (0, 0))) if pad_q else x
    sq = xq.shape[1]

    o = pl.pallas_call(
        functools.partial(_q_flash_kernel, eps=eps, with_ln=with_ln,
                          scale=scale, kv_valid=s, guarded=guarded),
        grid=(b, heads, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, cin), lambda bb, hh, qq: (bb, qq, 0),
                         memory_space=pltpu.VMEM),
            ln_spec, ln_spec,
            pl.BlockSpec((1, cin, d), lambda bb, hh, qq: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bb, hh, qq: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda bb, hh, qq: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda bb, hh, qq: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bb, hh, qq: (bb, hh, qq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, heads, sq, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sq * cin * heads * d + 4 * b * heads * sq * sk * d,
            bytes_accessed=(heads * b * sq * cin + 2 * b * sk * heads * d
                            + b * heads * sq * d) * 2,
            transcendentals=b * heads * sq * sk,
        ),
        interpret=interpret,
    )(xq, lns, lnb, wq_h, k_hm, v_hm, knorm)
    return o[:, :, :s]


def fused_spatial_eligible(b: int, s: int, cin: int, heads: int, inner: int,
                           qkv_bias: bool) -> bool:
    """Long spatial self-attention only: 64-wide heads, lane-aligned C,
    resident-KV VMEM fit (same budget as flash_attention_eligible)."""
    if qkv_bias or inner != heads * 64 or cin % 128 or s < _BLOCK_Q:
        return False
    sk = s + (-s) % _BLOCK_KV
    # K/V head slices + fp32 logits tile + x block + weights
    vmem = (4 * sk * 64 * 2 + _BLOCK_Q * sk * 4
            + 2 * _BLOCK_Q * cin * 2 + cin * 64 * 2)
    return vmem < 90 * 1024 * 1024
