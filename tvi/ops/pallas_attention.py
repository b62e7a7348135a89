"""Pallas TPU flash attention for the UNet's spatial self-attention.

Why: at the headline geometry (576x1024 -> 72x128 = 9216 latent tokens per
frame) a naive attention materializes (B*F, H, 9216, 9216) logits — tens of
GB; XLA will not fuse that away.  This kernel streams K/V through VMEM and
never materializes more than a (BLOCK_Q, Sk) tile of logits per program.

Design (per /opt/skills/guides/pallas_guide.md):
  - layout (B*H, S, D): grid = (B*H, S / BLOCK_Q); each program owns one
    query block and the full K/V of its batch-head (Sk*D*2 bf16 ~= 2.4 MB at
    Sk=9216, D=64 — well inside the 64 MB scoped-VMEM budget, so no online
    softmax pass is needed; the fp32 logits tile is BLOCK_Q x Sk ~= 4.7 MB).
  - QK^T and PV ride the MXU with fp32 accumulation
    (preferred_element_type); softmax runs on the VPU in fp32.
  - K/V BlockSpecs are constant in the query-block grid index, so Pallas
    keeps them resident across sequential programs of the same batch-head.

Used automatically by tvi.ops.attention.dot_product_attention for long
self-attention sequences; `interpret=True` path keeps CPU tests exact.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_Q_BOUND = 256
# log2-units subtracted from the Cauchy-Schwarz shift: softmax is
# shift-invariant, so backing the bound off only REDUCES underflow risk
# (margin 126 -> 186) at the cost of p/l magnitudes up to ~2^60 (fp32-safe).
SHIFT_BACKOFF = 60.0
LOG2E = 1.4426950408889634


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_valid: int):
    q = q_ref[0]                       # (BQ, D)
    k = k_ref[0]                       # (Sk, D)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * scale     # (BQ, Sk)
    if kv_valid < k.shape[0]:
        # ragged sequences arrive zero-padded; mask the padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_valid, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _default_shift() -> str:
    # default: unguarded bound shift WITH the 60-unit backoff — underflow
    # needs >186 log2-units of Cauchy-Schwarz slack, unreachable for
    # LN-bounded activations (reference-anchored goldens + pipeline goldens
    # validate numerics).  TVI_ATTN_SHIFT=bound restores the wrapper-guarded
    # mode (~50-110 ms/step tax), =row the classic row-max kernel.
    return os.environ.get("TVI_ATTN_SHIFT", "bound_unguarded")


def flash_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         scale: float, block_q: int = 0,
                         interpret: bool = False,
                         shift: str = "") -> jax.Array:
    """Differentiable wrapper: Pallas forward, reference-XLA backward
    (tvi/ops/diffable.py — the backward replays a query-block-chunked
    softmax attention under jax.checkpoint, so training never materializes
    the full (BH, Sq, Sk) probabilities)."""
    from tvi.ops.diffable import (
        chunked_sdpa_bh_reference,
        pallas_with_reference_vjp,
    )

    fused = functools.partial(_flash_self_attention_fwd, scale=scale,
                              block_q=block_q, interpret=interpret,
                              shift=shift)
    ref = functools.partial(chunked_sdpa_bh_reference, scale=scale)
    return pallas_with_reference_vjp(fused, ref, q, k, v)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret",
                                             "shift"))
def _flash_self_attention_fwd(q: jax.Array, k: jax.Array, v: jax.Array,
                              scale: float, block_q: int = 0,
                              interpret: bool = False,
                              shift: str = "") -> jax.Array:
    """q/k/v: (BH, S, D).  Ragged S is zero-padded to block multiples and
    the padded keys masked inside the kernel.  Returns (BH, Sq, D).

    shift: 'bound' (default; fused Cauchy-Schwarz shift, ~1.4x faster) or
    'row' (classic row-max softmax).  Override via TVI_ATTN_SHIFT.
    """
    shift = shift or _default_shift()
    bound_mode = shift in ("bound", "bound_unguarded")
    if not block_q:
        block_q = BLOCK_Q_BOUND if bound_mode else BLOCK_Q
    if q.shape[1] < block_q:
        block_q = BLOCK_Q  # short ragged seqs: don't pad past 128-blocks
    bh, sq_in, d = q.shape
    kv_valid = k.shape[1]
    pad_q = (-sq_in) % block_q
    pad_k = (-kv_valid) % 128
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    sq = q.shape[1]
    sk = k.shape[1]
    grid = (bh, sq // block_q)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * sq * sk * d,
            bytes_accessed=(bh * sq * d + 2 * bh * sk * d + bh * sq * d) * 2,
            transcendentals=bh * sq * sk,
        ),
        interpret=interpret,
    )
    qkv_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    def call_row(q, k, v, knorm):
        del knorm
        kernel = functools.partial(_flash_kernel, scale=scale,
                                   kv_valid=kv_valid)
        return pl.pallas_call(kernel, in_specs=qkv_specs, **common)(q, k, v)

    if not bound_mode:
        return call_row(q, k, v, None)[:, :sq_in]

    def call_bound(q, k, v, knorm):
        kernel = functools.partial(_flash_bound_kernel, scale=scale,
                                   kv_valid=kv_valid)
        return pl.pallas_call(
            kernel,
            in_specs=qkv_specs + [
                pl.BlockSpec((1, 1, 1), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM)],
            **common,
        )(q, k, v, knorm)

    knorm = jnp.max(
        jnp.sqrt(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)),
        axis=-1)[:, None, None]                            # (BH, 1, 1)
    if shift == "bound_unguarded":
        # no runtime fallback: fastest path (unet fwd 1969 vs 2112 ms row),
        # correct whenever c*log2e*max||q||*max||k|| stays under the
        # backed-off exp2 range (~186 log2 units) — comfortably true for
        # LN-bounded activations; DEFAULT since round 3.
        return call_bound(q, k, v, knorm)[:, :sq_in]
    # Default 'bound': wrapper-level underflow guard.  The slack proxy
    # c * max||q|| * max||k|| bounds shift - rowmax from above; if it
    # leaves less than half the fp32 exp2 budget, run the exact row-max
    # kernel instead.  A scalar lax.cond at the XLA level costs ~5% of the
    # step (~110 ms; both kernels compile, one executes) — measured far
    # cheaper than an in-kernel cond, which poisons Mosaic's schedule for
    # ~450 ms/step even when never taken (PERF.md round-2 session 2).
    qnorm_max = jnp.max(jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)),
                                         axis=-1)))
    slack_proxy = qnorm_max * jnp.max(knorm) * (abs(scale) * LOG2E)
    out = jax.lax.cond(slack_proxy < 120.0, call_bound, call_row,
                       q, k, v, knorm)
    return out[:, :sq_in]


def _flash_bound_kernel(q_ref, k_ref, v_ref, kn_ref, o_ref, *, scale: float,
                        kv_valid: int):
    """Softmax shifted by a PRE-COMPUTED per-row upper bound instead of the
    row max.

    Any row-wise shift cancels exactly in p_i/sum(p_i); the row max is only
    ever about fp32 range.  The Cauchy-Schwarz bound
        shift_i = scale*log2(e) * ||q_i||_2 * max_j ||k_j||_2 >= max_j logits_ij
    needs no post-matmul reduction, so Mosaic fuses the subtract+exp2 into
    the QK epilogue instead of spending an extra full VPU pass over the
    (BQ, Sk) logits tile.  Measured at the headline spatial shape
    (BH=250, S=9216, D=64): 89.5 TFLOP/s vs 63.6 for the row-max kernel
    (max |output diff| 9.8e-4 bf16 = 1 ulp); the post-matmul row max caps at
    65.9 even when reduced to a scalar (scripts/perf_lab.py round2b).

    Underflow safety margin: a row only degrades once
    shift_i - max_j logits_ij > ~126 (exp2 flushes below 2^-126) — a log2
    slack no sane attention operand reaches; the row-max kernel remains
    selectable via TVI_ATTN_SHIFT=row.
    """
    q = q_ref[0]                       # (BQ, D)
    k = k_ref[0]                       # (Sk, D)
    v = v_ref[0]
    c = scale * LOG2E
    qn = jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1,
                          keepdims=True))
    # BACKOFF: subtracting 60 log2-units from the bound leaves p values up
    # to 2^60 (l <= Sk * 2^60 ~ 1e22, safely inside fp32) and widens the
    # underflow margin from 126 to 186 log2-units — softmax is shift-
    # invariant so the result is bit-identical wherever both survive.
    shift = qn * (kn_ref[0, 0, 0] * c) - SHIFT_BACKOFF    # (BQ, 1)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * c          # (BQ, Sk) in log2
    masked = kv_valid < k.shape[0]
    p = jnp.exp2(logits - shift)
    if masked:
        # ragged sequences arrive zero-padded; padded keys give logits 0 ->
        # p = 2^-shift, so zero them after the exp
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        p = jnp.where(col < kv_valid, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _flash_streamed_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                           *, scale: float):
    """Online-softmax variant: grid (BH, nq, nk) with nk innermost; running
    max/denominator/accumulator live in VMEM scratch across the KV sweep
    (the classic flash-attention recurrence)."""
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * scale     # (BQ, BK)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    m_ref[:] = m_new

    @pl.when(k_idx == nk - 1)
    def _emit():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def flash_self_attention_streamed(q: jax.Array, k: jax.Array, v: jax.Array,
                                  scale: float, block_q: int = BLOCK_Q,
                                  block_k: int = 512,
                                  interpret: bool = False) -> jax.Array:
    """Differentiable wrapper (see flash_self_attention)."""
    from tvi.ops.diffable import (
        chunked_sdpa_bh_reference,
        pallas_with_reference_vjp,
    )

    fused = functools.partial(_flash_streamed_fwd, scale=scale,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret)
    ref = functools.partial(chunked_sdpa_bh_reference, scale=scale)
    return pallas_with_reference_vjp(fused, ref, q, k, v)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def _flash_streamed_fwd(q: jax.Array, k: jax.Array, v: jax.Array,
                        scale: float, block_q: int = BLOCK_Q,
                        block_k: int = 512,
                        interpret: bool = False) -> jax.Array:
    """K-streaming flash attention for K/V too large to keep resident
    (e.g. the VAE decoder's 1-head d=512 attention over 9216 tokens, which
    XLA would otherwise materialize as an (N, 9216, 9216) logits tensor).
    q/k/v: (BH, S, D), S % block == 0."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    grid = (bh, sq // block_q, sk // block_k)
    kernel = functools.partial(_flash_streamed_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(32 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * sq * sk * d,
            bytes_accessed=(bh * sq * d * 2 + 2 * bh * sk * d * (sq // block_q)) * 2,
            transcendentals=bh * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention_eligible(sq: int, sk: int, d: int,
                             has_bias: bool, want_stats: bool,
                             block_q: int = BLOCK_Q_BOUND) -> bool:
    """Resident-KV kernel eligibility (single softmax pass).  Ragged
    sequences are handled by padding+key-masking, so only a minimum length
    and the VMEM budget gate."""
    if has_bias or want_stats:
        return False
    if sq < BLOCK_Q or sk < 128:  # the wrapper drops to 128-blocks when short
        return False
    block_q = min(block_q, max(BLOCK_Q, sq))
    sk_pad = sk + ((-sk) % 128)
    # double-buffered K/V + fp32 logits tile + q/out blocks
    vmem = 4 * sk_pad * d * 2 + block_q * sk_pad * 4 + block_q * d * 8
    return vmem < 90 * 1024 * 1024  # 100MB compiler limit minus headroom


def flash_streamed_eligible(sq: int, sk: int, d: int,
                            has_bias: bool, want_stats: bool,
                            block_q: int = BLOCK_Q, block_k: int = 512) -> bool:
    """Streaming-KV kernel eligibility: any length, divisible blocks."""
    if has_bias or want_stats:
        return False
    return (sq >= block_q and sq % block_q == 0
            and sk >= block_k and sk % block_k == 0
            and d <= 1024)
