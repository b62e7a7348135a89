"""Spatial self-attention kernel v4: head-looped bound-shift flash with the
out-projection, output bias and sublayer residual fused into the epilogue.

Why: the v3 chain around the resident-KV flash kernel is four extra
M-passes over the (M = B*S, C) activation — the (B,S,H,d)->(BH,S,d)
head-split transposes in, the transpose back, the head-major out-projection
(a thin-N matmul on the ~15-25 TF/s input-streaming wall, PERF.md round-3
mmpN_* sweep: matmul time is FLAT in N; every HBM matmul pass costs
~max(FLOPs/149T, input_bytes/~55GB/s)), and the residual add.  This kernel
reads q/k/v in their natural (B, S, inner) layout (no head transposes
anywhere), loops the 64-wide heads in-kernel, and accumulates

    out = x_res + bo + sum_h softmax(q_h k_h^T * scale) v_h @ Wo[h]

into a single (BQ, C) tile written once.  The per-head softmax uses the
same backed-off Cauchy-Schwarz bound shift as tvi/ops/pallas_attention.py
(shift cancels exactly; see _flash_bound_kernel for the underflow margin
analysis) with max_j ||k_j|| precomputed per (batch, head) in XLA.

Replaces the reference's AttnProcessor2_0 spatial self-attention + to_out
+ the BasicTransformerBlock residual (vendored attention_processor.py:1178,
attention.py:84) on the TPU serving path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvi.ops.pallas_attention import LOG2E, SHIFT_BACKOFF

BLOCK_Q = 256


def _attn_out_kernel(q_ref, k_ref, v_ref, kn_ref, x_ref, wo_ref, bo_ref,
                     o_ref, *, heads: int, scale: float, kv_valid: int,
                     residual: bool, packed: bool = False):
    """``packed``: q_ref/k_ref/v_ref are views of ONE (…, 3*inner) fused
    QKV projection buffer (q block rows / full-S rows); per-head 64-lane
    slices at offsets h*d, inner + h*d, 2*inner + h*d are all tile-aligned,
    so the XLA-side split of the fused projection (3 full M-pass slice
    copies) never materializes."""
    q = q_ref[0]                        # (BQ, inner) or (BQ, 3*inner)
    k = k_ref[0]                        # (Sk, inner) or (Sk, 3*inner)
    v = v_ref[0]
    wo = wo_ref[:]                      # (inner, C)
    inner = wo.shape[0]
    d = inner // heads
    c = scale * LOG2E
    masked = kv_valid < k.shape[0]
    ohs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        if packed:
            qh = q[:, h * d:(h + 1) * d]
            kh = k[:, inner + h * d:inner + (h + 1) * d]
            vh = v[:, 2 * inner + h * d:2 * inner + (h + 1) * d]
        else:
            qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        qn = jnp.sqrt(jnp.sum(jnp.square(qh.astype(jnp.float32)), axis=-1,
                              keepdims=True))
        shift = qn * (kn_ref[0, 0, h] * c) - SHIFT_BACKOFF  # (BQ, 1)
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) * c        # (BQ, Sk) log2
        p = jnp.exp2(logits - shift)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            p = jnp.where(col < kv_valid, p, 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)            # (BQ, d) fp32
        ohs.append((oh / l).astype(q.dtype))
    # one full-K out-projection dot instead of `heads` thin-K=64 dots: the
    # lane-concat of the 64-wide head outputs is a 160 KB relayout, far
    # cheaper than the MXU issue overhead of 5 quarter-depth dots
    o_cat = ohs[0] if heads == 1 else jnp.concatenate(ohs, axis=1)
    acc = jax.lax.dot_general(
        o_cat, wo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)                # (BQ, C)
    acc = acc + bo_ref[:].astype(jnp.float32)
    if residual:
        acc = acc + x_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def attention_out_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                            x_res: jax.Array, wo: jax.Array, bo: jax.Array,
                            heads: int, scale: float,
                            residual: bool = True) -> jax.Array:
    """Pure-XLA math of _attn_out_kernel — backward path + parity oracle.
    q/k/v: (B, S, inner); x_res: (B, S, C); wo: (inner, C); bo: (C,)."""
    b, s, inner = q.shape
    d = inner // heads
    qh = q.reshape(b, s, heads, d)
    kh = k.reshape(b, k.shape[1], heads, d)
    vh = v.reshape(b, k.shape[1], heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32) * scale,
                        kh.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), vh,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    out = jnp.dot(o.reshape(b * s, inner), wo,
                  preferred_element_type=jnp.float32)
    out = out + bo.astype(jnp.float32)
    out = out.reshape(b, s, wo.shape[-1])
    if residual:
        out = out + x_res.astype(jnp.float32)
    return out.astype(q.dtype)


def _attn_out_kernel_packed(qkvq_ref, qkvfull_ref, kn_ref, x_ref, wo_ref,
                            bo_ref, o_ref, *, heads: int, scale: float,
                            kv_valid: int, residual: bool):
    _attn_out_kernel(qkvq_ref, qkvfull_ref, qkvfull_ref, kn_ref, x_ref,
                     wo_ref, bo_ref, o_ref, heads=heads, scale=scale,
                     kv_valid=kv_valid, residual=residual, packed=True)


def flash_attention_out_packed(qkv: jax.Array, x_res: jax.Array,
                               wo: jax.Array, bo: jax.Array,
                               heads: int, scale: float,
                               residual: bool = True, block_q: int = 0,
                               interpret: bool = False) -> jax.Array:
    """v4 on the FUSED (B, S, 3*inner) QKV projection buffer directly —
    the XLA split into q/k/v (3 full M-pass slice copies feeding the
    kernel operands) never happens; per-head slices are taken in-kernel
    at 64-lane-aligned offsets.  Differentiable via the same chunked
    reference (which splits in the rematerialized backward)."""
    from tvi.ops.diffable import (
        chunked_attention_out_reference,
        pallas_with_reference_vjp,
    )

    inner = wo.shape[0]

    def ref(qkv, x_res, wo, bo):
        q = qkv[..., :inner]
        k = qkv[..., inner:2 * inner]
        v = qkv[..., 2 * inner:]
        return chunked_attention_out_reference(q, k, v, x_res, wo, bo,
                                               heads=heads, scale=scale,
                                               residual=residual)

    fused = functools.partial(_flash_attention_out_packed_fwd, heads=heads,
                              scale=scale, residual=residual,
                              block_q=block_q, interpret=interpret)
    return pallas_with_reference_vjp(fused, ref, qkv, x_res, wo, bo)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "residual",
                                             "block_q", "interpret"))
def _flash_attention_out_packed_fwd(qkv: jax.Array, x_res: jax.Array,
                                    wo: jax.Array, bo: jax.Array,
                                    heads: int, scale: float,
                                    residual: bool = True, block_q: int = 0,
                                    interpret: bool = False) -> jax.Array:
    b, s, three_inner = qkv.shape
    inner = three_inner // 3
    c_out = wo.shape[-1]
    d = inner // heads
    if not block_q:
        block_q = _pick_block_q(s)
    knorm = jnp.max(jnp.sqrt(jnp.sum(jnp.square(
        qkv[..., inner:2 * inner].astype(jnp.float32)
        .reshape(b, s, heads, d)), axis=-1)), axis=1)[:, None, :]
    grid = (b, s // block_q)
    kernel = functools.partial(_attn_out_kernel_packed, heads=heads,
                               scale=scale, kv_valid=s, residual=residual)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, three_inner), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, three_inner), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, heads), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, c_out), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wo.shape, lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c_out), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c_out), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * s * s * inner + 2 * b * s * inner * c_out,
            bytes_accessed=(2 * b * s * three_inner + 2 * b * s * c_out) * 2,
            transcendentals=b * heads * s * s,
        ),
        interpret=interpret,
    )(qkv, qkv, knorm, x_res, wo, bo.reshape(1, c_out))


def attention_out_packed_eligible(b: int, s: int, inner: int, c_out: int,
                                  heads: int) -> bool:
    """Packed variant needs unpadded S: whole blocks and 128-lane K/V."""
    if not attention_out_eligible(b, s, s, inner, c_out, heads):
        return False
    # Round-4 chip sweep: at S>=4608 the packed kernel is bq-flat and ~8
    # ms/call slower than the split kernel at bq128 (71.7 vs 63.8 ms at
    # (50,9216,i320)) — more than the ~3.5 ms/call XLA qkv-split tax the
    # packed layout avoids.  Prefer the split kernel at large S; packed
    # stays the winner at S=2304 (11.65 packed vs 11.25+1.75 split+tax).
    if s >= 4608:
        return False
    bq = _pick_block_q(s)
    if s % 128 or bq % 128:
        return False
    # resident full-S qkv block (3x wider than split K/V)
    return (s * 3 * inner * 2 + bq * s * 4 * 2) < 80 * 1024 * 1024


def flash_attention_out(q: jax.Array, k: jax.Array, v: jax.Array,
                        x_res: jax.Array, wo: jax.Array, bo: jax.Array,
                        heads: int, scale: float, residual: bool = True,
                        block_q: int = 0, knorm: jax.Array | None = None,
                        interpret: bool = False) -> jax.Array:
    """Differentiable wrapper: Pallas forward, reference-XLA backward with
    query-block-chunked attention (tvi/ops/diffable.py — the naive
    reference's backward materializes (B,H,S,S) fp32 probabilities).
    ``knorm``: optional precomputed (B, 1, heads) max ||k|| (e.g. from
    ln_qkv_split) — skips this wrapper's own XLA k-norm reduction; its
    cotangent is zero (the bound shift cancels in the softmax)."""
    from tvi.ops.diffable import (
        chunked_attention_out_reference,
        pallas_with_reference_vjp,
    )

    fused = functools.partial(_flash_attention_out_fwd, heads=heads,
                              scale=scale, residual=residual,
                              block_q=block_q, interpret=interpret)
    ref = functools.partial(chunked_attention_out_reference, heads=heads,
                            scale=scale, residual=residual)
    ref7 = lambda q, k, v, x_res, wo, bo, kn: ref(q, k, v, x_res, wo, bo)
    return pallas_with_reference_vjp(fused, ref7, q, k, v, x_res, wo, bo,
                                     knorm)


def _pick_block_q(s: int) -> int:
    # Round-4 chip sweep (PERF.md r4 session 4): at large S the (BQ, S)
    # fp32 logits/p tiles dominate VMEM pipelining — at S=9216 bq128 runs
    # 8% faster than bq256 (86.7 vs 79.6 TF/s); at S=2304 bq256 and S=576
    # bq192 stay the winners.
    ladder = ((128, 96, 64, 32, 16, 8) if s >= 4608
              else (BLOCK_Q, 192, 128, 96, 64, 32, 16, 8))
    for bq in ladder:
        if s % bq == 0:
            return bq
    return 0


@functools.partial(jax.jit, static_argnames=("heads", "scale", "residual",
                                             "block_q", "interpret"))
def _flash_attention_out_fwd(q: jax.Array, k: jax.Array, v: jax.Array,
                             x_res: jax.Array, wo: jax.Array, bo: jax.Array,
                             knorm: jax.Array | None = None,
                             heads: int = 1, scale: float = 1.0,
                             residual: bool = True, block_q: int = 0,
                             interpret: bool = False) -> jax.Array:
    b, sq, inner = q.shape
    sk_in = k.shape[1]
    c_out = wo.shape[-1]
    d = inner // heads
    if not block_q:
        block_q = _pick_block_q(sq)
    pad_k = (-sk_in) % 128
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    sk = k.shape[1]
    if knorm is None:
        # max_j ||k_j|| per (batch, head) — tiny XLA reduction, fuses
        # upstream.  Shaped (B, 1, heads) so the per-b block is
        # (1, 1, heads) with both trailing dims equal to the array's
        # (Mosaic block-shape rule).
        knorm = jnp.max(jnp.sqrt(jnp.sum(jnp.square(
            k.astype(jnp.float32).reshape(b, sk, heads, d)), axis=-1)),
            axis=1)[:, None, :]                             # (B, 1, heads)
    grid = (b, sq // block_q)
    kernel = functools.partial(_attn_out_kernel, heads=heads, scale=scale,
                               kv_valid=sk_in, residual=residual)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, inner), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, inner), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, inner), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, heads), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, c_out), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wo.shape, lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c_out), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq, c_out), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * sq * sk * inner + 2 * b * sq * inner * c_out,
            bytes_accessed=(3 * b * sq * inner + 2 * b * sk * inner
                            + 2 * b * sq * c_out) * 2,
            transcendentals=b * heads * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v, knorm, x_res, wo, bo.reshape(1, c_out))
    return out


# ---------------------------------------------------------------------------
# LN + fused-QKV + split + k-norm streaming kernel (round-4 session 4).
#
# The split v4 kernel is the fastest spatial-attention kernel at large S
# (bq128 chip sweep) but its XLA feed chain is four serial M-passes on a
# single-core chip: norm1 (read+write), the fused (C, 3*inner) projection
# dot, the THREE slice copies splitting the qkv buffer, and the k-norm
# reduction's extra k read.  This kernel streams row blocks of the RAW
# hidden states and emits q, k, v as separate outputs plus the per-(batch,
# head) max k-norm the bound shift needs — ~2.9 GB of level-0 chain traffic
# becomes ~1.2 GB (one read of x, one write of q/k/v).  Parallel row grid:
# no v5-style per-batch KV scratch serialization (the construct that cost
# +236 ms and retired v5).  Replaces the reference's norm1 + to_q/to_k/to_v
# (vendored attention.py:84, attention_processor.py:1178) feed chain on the
# TPU serving path.
# ---------------------------------------------------------------------------

BLOCK_M_QKV = 1024


def _pick_block_m_qkv(s: int) -> int:
    for bm in (BLOCK_M_QKV, 768, 576, 512, 384, 288, 256, 128, 64):
        if s % bm == 0:
            return bm
    return 0


def _ln_qkv_kernel(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
                   q_ref, k_ref, v_ref, kn_ref, *, heads: int, eps: float):
    i = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)                       # (bm, C)
    # fast-variance LayerNorm — bit-matches tvi.models.layers.layer_norm
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    nb = y.astype(q_ref.dtype)
    dot = lambda w: jax.lax.dot_general(
        nb, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    q_ref[0] = dot(wq_ref[:]).astype(q_ref.dtype)
    kb = dot(wk_ref[:]).astype(k_ref.dtype)
    k_ref[0] = kb
    v_ref[0] = dot(wv_ref[:]).astype(v_ref.dtype)
    # per-head row norms of the bf16-rounded k (what the attention kernel
    # will read back), reduced to a per-(batch, head) running max across
    # the sequential row grid
    ksq = jnp.square(kb.astype(jnp.float32))                # (bm, inner)
    d = kb.shape[-1] // heads
    cols = [jnp.sum(ksq[:, h * d:(h + 1) * d], axis=-1, keepdims=True)
            for h in range(heads)]
    hsum = cols[0] if heads == 1 else jnp.concatenate(cols, axis=1)
    part = jnp.max(jnp.sqrt(hsum), axis=0, keepdims=True)   # (1, heads)

    @pl.when(i == 0)
    def _():
        kn_ref[0] = part

    @pl.when(i > 0)
    def _():
        kn_ref[0] = jnp.maximum(kn_ref[0], part)


def ln_qkv_reference(x: jax.Array, lns: jax.Array, lnb: jax.Array,
                     wq: jax.Array, wk: jax.Array, wv: jax.Array,
                     heads: int, eps: float = 1e-5):
    """Pure-XLA math of _ln_qkv_kernel — backward path + parity oracle."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * lns.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(x.dtype)
    proj = lambda w: jnp.dot(
        y.reshape(-1, y.shape[-1]), w,
        preferred_element_type=jnp.float32).astype(x.dtype).reshape(
            x.shape[:-1] + (w.shape[-1],))
    q, k, v = proj(wq), proj(wk), proj(wv)
    b, s, inner = k.shape
    knorm = jnp.max(jnp.sqrt(jnp.sum(jnp.square(
        k.astype(jnp.float32).reshape(b, s, heads, inner // heads)),
        axis=-1)), axis=1)[:, None, :]                      # (B, 1, heads)
    return q, k, v, knorm


def ln_qkv_split(x: jax.Array, lns: jax.Array, lnb: jax.Array,
                 wq: jax.Array, wk: jax.Array, wv: jax.Array,
                 heads: int, eps: float = 1e-5, block_m: int = 0,
                 interpret: bool = False):
    """Differentiable wrapper: Pallas forward, reference-XLA backward.
    Returns (q, k, v, knorm); knorm is a bound-shift aid whose cotangent is
    zero (the shift cancels in the softmax)."""
    from tvi.ops.diffable import pallas_with_reference_vjp

    fused = functools.partial(_ln_qkv_split_fwd, heads=heads, eps=eps,
                              block_m=block_m, interpret=interpret)
    ref = functools.partial(ln_qkv_reference, heads=heads, eps=eps)
    return pallas_with_reference_vjp(fused, ref, x, lns, lnb, wq, wk, wv)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "block_m",
                                             "interpret"))
def _ln_qkv_split_fwd(x: jax.Array, lns: jax.Array, lnb: jax.Array,
                      wq: jax.Array, wk: jax.Array, wv: jax.Array,
                      heads: int, eps: float = 1e-5, block_m: int = 0,
                      interpret: bool = False):
    b, s, c = x.shape
    inner = wq.shape[-1]
    if not block_m:
        block_m = _pick_block_m_qkv(s)
    grid = (b, s // block_m)
    kernel = functools.partial(_ln_qkv_kernel, heads=heads, eps=eps)
    row_spec = lambda width: pl.BlockSpec(
        (1, block_m, width), lambda bi, i: (bi, i, 0),
        memory_space=pltpu.VMEM)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    q, k, v, kn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(c),
            const_spec((1, c)), const_spec((1, c)),
            const_spec(wq.shape), const_spec(wk.shape), const_spec(wv.shape),
        ],
        out_specs=[
            row_spec(inner), row_spec(inner), row_spec(inner),
            pl.BlockSpec((1, 1, heads), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, inner), x.dtype),
            jax.ShapeDtypeStruct((b, s, inner), x.dtype),
            jax.ShapeDtypeStruct((b, s, inner), x.dtype),
            jax.ShapeDtypeStruct((b, 1, heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            # the kn output block is revisited (running max) -> the row
            # dimension must be sequential ("arbitrary"); batches parallel
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * b * s * c * inner,
            bytes_accessed=(b * s * c + 3 * b * s * inner) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, lns.reshape(1, c), lnb.reshape(1, c), wq, wk, wv)
    return q, k, v, kn


def ln_qkv_eligible(b: int, s: int, c: int, inner: int, heads: int) -> bool:
    """Row blocks + the three resident weights must fit VMEM; head width 64
    keeps the k-norm slices lane-aligned."""
    if inner % heads or (inner // heads) != 64:
        return False
    bm = _pick_block_m_qkv(s)
    if not bm:
        return False
    vmem = (bm * c * 2 * 3              # x block bf16 (+ double buffer)
            + 2 * bm * c * 4            # fp32 x / normed
            + 3 * c * inner * 2         # resident weights
            + 3 * bm * inner * 4        # fp32 accumulators
            + 3 * bm * inner * 2 * 2)   # q/k/v out blocks (+ double buffer)
    return vmem < 80 * 1024 * 1024


# ---------------------------------------------------------------------------
# GN-affine + proj_in prologue for the LN+QKV streaming kernel (round-4
# session 6).  After the ln_qkv_split flip the ONLY XLA passes still feeding
# spatial attention are the transformer's GN apply + proj_in matmul (the
# (C, C) dot the reference runs as TransformerSpatioTemporalModel.proj_in,
# transformer_temporal.py:305,318) — a ~6.4 ms M-pass per level-0 call on
# the input-streaming wall, plus the proj_in output read this kernel's
# predecessor pays.  This variant reads the RAW post-GN-stats hidden rows,
# applies the per-instance GN affine (a Pallas consumer cannot absorb an
# XLA producer fusion — the affine would otherwise materialize), computes
# y = GN(x) @ W_in + b_in (written out: the attention sublayer's residual),
# then LN(y) @ Wq/Wk/Wv + the k-norm running max exactly like ln_qkv_split.
# Parallel row grid, no KV scratch — structurally unlike the v5 proj_in
# fold that lost +66 ms (PERF.md round-4 session 1).
# DEFAULT-ON after the r4 s7 chip A/B (unet_fwd −19.4 ms/fwd); kill switch
# TVI_DISABLE_QKV_PROJIN=1.
# ---------------------------------------------------------------------------


def _ln_qkv_projin_kernel(x_ref, ga_ref, gb_ref, win_ref, bin_ref,
                          lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
                          y_ref, q_ref, k_ref, v_ref, kn_ref,
                          *, heads: int, eps: float):
    i = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)                   # (bm, C_in)
    # per-instance GN affine (fp32), then the bf16 cast the unfused path
    # applies before its proj_in matmul
    xg = (xf * ga_ref[0] + gb_ref[0]).astype(y_ref.dtype)
    y = jax.lax.dot_general(
        xg, win_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)            # (bm, C) fp32
    y = y + bin_ref[:].astype(jnp.float32)
    yb = y.astype(y_ref.dtype)
    y_ref[0] = yb                                       # sublayer residual
    # LN of the bf16-rounded y — matches what ln_qkv_split would read back
    yf = yb.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf), axis=-1, keepdims=True) - jnp.square(mean)
    nrm = (yf - mean) * jax.lax.rsqrt(var + eps)
    nb = (nrm * lns_ref[0].astype(jnp.float32)
          + lnb_ref[0].astype(jnp.float32)).astype(q_ref.dtype)
    dot = lambda w: jax.lax.dot_general(
        nb, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    q_ref[0] = dot(wq_ref[:]).astype(q_ref.dtype)
    kb = dot(wk_ref[:]).astype(k_ref.dtype)
    k_ref[0] = kb
    v_ref[0] = dot(wv_ref[:]).astype(v_ref.dtype)
    ksq = jnp.square(kb.astype(jnp.float32))            # (bm, inner)
    d = kb.shape[-1] // heads
    cols = [jnp.sum(ksq[:, h * d:(h + 1) * d], axis=-1, keepdims=True)
            for h in range(heads)]
    hsum = cols[0] if heads == 1 else jnp.concatenate(cols, axis=1)
    part = jnp.max(jnp.sqrt(hsum), axis=0, keepdims=True)   # (1, heads)

    @pl.when(i == 0)
    def _():
        kn_ref[0] = part

    @pl.when(i > 0)
    def _():
        kn_ref[0] = jnp.maximum(kn_ref[0], part)


def ln_qkv_projin_reference(x: jax.Array, ga: jax.Array, gb: jax.Array,
                            win: jax.Array, bin_: jax.Array,
                            lns: jax.Array, lnb: jax.Array,
                            wq: jax.Array, wk: jax.Array, wv: jax.Array,
                            heads: int, eps: float = 1e-5):
    """Pure-XLA math of _ln_qkv_projin_kernel — backward path + oracle."""
    b, s, c_in = x.shape
    xg = (x.astype(jnp.float32) * ga + gb).astype(x.dtype)
    y = jnp.dot(xg.reshape(-1, c_in), win,
                preferred_element_type=jnp.float32)
    y = (y + bin_.astype(jnp.float32)).astype(x.dtype)
    y = y.reshape(b, s, win.shape[-1])
    q, k, v, kn = ln_qkv_reference(y, lns, lnb, wq, wk, wv,
                                   heads=heads, eps=eps)
    return y, q, k, v, kn


def ln_qkv_projin(x: jax.Array, ga: jax.Array, gb: jax.Array,
                  win: jax.Array, bin_: jax.Array,
                  lns: jax.Array, lnb: jax.Array,
                  wq: jax.Array, wk: jax.Array, wv: jax.Array,
                  heads: int, eps: float = 1e-5, block_m: int = 0,
                  interpret: bool = False):
    """Differentiable wrapper: Pallas forward, reference-XLA backward.
    Returns (y, q, k, v, knorm): y is the proj_in output the attention
    sublayer uses as its residual."""
    from tvi.ops.diffable import pallas_with_reference_vjp

    fused = functools.partial(_ln_qkv_projin_fwd, heads=heads, eps=eps,
                              block_m=block_m, interpret=interpret)
    ref = functools.partial(ln_qkv_projin_reference, heads=heads, eps=eps)
    return pallas_with_reference_vjp(fused, ref, x, ga, gb, win, bin_,
                                     lns, lnb, wq, wk, wv)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "block_m",
                                             "interpret"))
def _ln_qkv_projin_fwd(x: jax.Array, ga: jax.Array, gb: jax.Array,
                       win: jax.Array, bin_: jax.Array,
                       lns: jax.Array, lnb: jax.Array,
                       wq: jax.Array, wk: jax.Array, wv: jax.Array,
                       heads: int, eps: float = 1e-5, block_m: int = 0,
                       interpret: bool = False):
    b, s, c_in = x.shape
    c = win.shape[-1]
    inner = wq.shape[-1]
    if not block_m:
        block_m = _pick_block_m_qkv(s)
    grid = (b, s // block_m)
    kernel = functools.partial(_ln_qkv_projin_kernel, heads=heads, eps=eps)
    row_spec = lambda width: pl.BlockSpec(
        (1, block_m, width), lambda bi, i: (bi, i, 0),
        memory_space=pltpu.VMEM)
    inst_spec = pl.BlockSpec((1, 1, c_in), lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    y, q, k, v, kn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(c_in),
            inst_spec, inst_spec,
            const_spec(win.shape), const_spec((1, c)),
            const_spec((1, c)), const_spec((1, c)),
            const_spec(wq.shape), const_spec(wk.shape), const_spec(wv.shape),
        ],
        out_specs=[
            row_spec(c),
            row_spec(inner), row_spec(inner), row_spec(inner),
            pl.BlockSpec((1, 1, heads), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), x.dtype),
            jax.ShapeDtypeStruct((b, s, inner), x.dtype),
            jax.ShapeDtypeStruct((b, s, inner), x.dtype),
            jax.ShapeDtypeStruct((b, s, inner), x.dtype),
            jax.ShapeDtypeStruct((b, 1, heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            # the kn output block is revisited (running max) -> the row
            # dimension must be sequential ("arbitrary"); batches parallel
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * c_in * c + 2 * 3 * b * s * c * inner,
            bytes_accessed=(b * s * c_in + b * s * c
                            + 3 * b * s * inner) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, ga, gb, win, bin_.reshape(1, c), lns.reshape(1, c),
      lnb.reshape(1, c), wq, wk, wv)
    return y, q, k, v, kn


def ln_qkv_projin_eligible(b: int, s: int, c_in: int, c: int, inner: int,
                           heads: int) -> bool:
    """Row blocks + proj_in/QKV resident weights must fit VMEM; head width
    64 keeps the k-norm slices lane-aligned."""
    if inner % heads or (inner // heads) != 64:
        return False
    if c_in % 8 or c % 8:
        # GN-affine (1, 1, C_in) blocks + y tiles want sublane-aligned
        # widths; every UNet level (320/640/1280) satisfies this
        return False
    bm = _pick_block_m_qkv(s)
    if not bm:
        return False
    vmem = (bm * c_in * 2 * 2           # x block bf16 (+ double buffer)
            + 2 * bm * c_in * 4         # fp32 x / GN-applied
            + c_in * c * 2              # resident proj_in weight
            + bm * c * 4                # y fp32 accumulator
            + 2 * bm * c * 4            # LN fp32 intermediates
            + bm * c * 2 * 2            # y out block (+ double buffer)
            + 3 * c * inner * 2         # resident QKV weights
            + 3 * bm * inner * 4        # fp32 accumulators
            + 3 * bm * inner * 2 * 2)   # q/k/v out blocks (+ double buffer)
    return vmem < 80 * 1024 * 1024


def attention_out_eligible(b: int, sq: int, sk: int, inner: int, c_out: int,
                           heads: int) -> bool:
    """Spatial self-attention shapes: d=64 heads, KV + logits fit VMEM."""
    if inner % heads or (inner // heads) != 64:
        return False
    if c_out % 8:
        return False
    bq = _pick_block_q(sq)
    if not bq or bq < 64 or sq < 2 * bq or sk < 128:
        return False
    sk_pad = sk + (-sk) % 128
    vmem = (2 * sk_pad * inner * 2            # resident K/V
            + bq * sk_pad * 4 * 2             # logits + p (fp32, per head)
            + bq * inner * 2 * 3              # q block + slices
            + 2 * bq * c_out * 4              # accumulator + out
            + inner * c_out * 2)              # Wo
    return vmem < 88 * 1024 * 1024
