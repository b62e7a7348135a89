"""Spatial self-attention kernel v5: the whole sublayer — (optional input
projection +) LayerNorm + QKV projections + bound-shift flash +
out-projection + residual — in ONE kernel.

Why: on a single-core chip only async DMA hides; every XLA op that occupies
the core is serial wall time.  After v4 (tvi/ops/pallas_attention_out.py)
fused the out-projection/residual epilogue, the spatial sublayer still pays
two core-occupying XLA passes per layer: the LayerNorm pass and the fused
(C, 3*inner) QKV projection pass — each bound by the ~55 GB/s matmul
input-stream law (PERF.md round-3 session 3), ~7 ms at the level-0 M=460800
shape.  v5 moves both inside the attention kernel:

  - grid (B, q-blocks) executes sequentially ("arbitrary" semantics); the
    per-batch (S, C) input block is resident in VMEM (constant index map).
  - at q-block 0 of each batch the kernel computes LN(x) @ Wkv into a VMEM
    scratch that PERSISTS across the batch's remaining q-blocks, plus the
    per-head max ||k|| row the bound shift needs.  When S is not 128-lane
    aligned (the 1280 level's S=576) the scratch is padded and the padded
    key columns masked out of the softmax.
  - every q-block recomputes LN on its own rows (VPU-cheap) and projects Q
    in-kernel; attention + out-projection + bias + residual run exactly as
    in v4 (same backed-off Cauchy-Schwarz shift, see pallas_attention.py).

With ``w_in``/``b_in`` the kernel additionally absorbs the transformer's
proj_in (TransformerSpatioTemporalModel: GN -> proj_in -> first block,
reference transformer_temporal.py:306-318): q-block 0 projects the raw
(S, C_in) input once into an xp VMEM scratch (bf16, bit-matching the XLA
path's bf16 proj_in output), and the attention consumes/residuals xp — the
standalone proj_in M-pass disappears for the cost of one in-kernel dot.
With ``gn_a``/``gn_b`` the transformer's GroupNorm APPLY folds in as well,
as a precomputed per-(batch, channel) affine (stats stay in XLA —
tvi/ops/groupnorm.py::group_norm_affine_params): a Pallas consumer cannot
absorb an XLA producer fusion, so without this the GN apply would
materialize as its own pass in front of the kernel.

HBM traffic per sublayer drops from read x + [proj_in write/read] + LN
write/read + qkv write/read + q-block reads + x_res read + out write to
read x (resident, once per batch) + out write.

Replaces the reference's [proj_in +] norm1 + AttnProcessor2_0
self-attention + to_out + residual (vendored attention.py:84,
attention_processor.py:1178) on the TPU serving path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvi.ops.pallas_attention import LOG2E, SHIFT_BACKOFF
from tvi.ops.pallas_attention_out import _pick_block_q


def _pick_kv_chunk(s: int, c: int) -> int:
    """Row chunk for the in-kernel KV projection loop (static unroll):
    bounds the fp32 LN temporaries to ~4 MB of VMEM."""
    for nch in (1, 2, 4, 8, 16, 32):
        if s % nch == 0 and (s // nch) * c * 4 <= 4 * 1024 * 1024:
            return s // nch
    return 0


def _ln_rows(xf: jax.Array, lns: jax.Array, lnb: jax.Array,
             eps: float) -> jax.Array:
    """fp32 LayerNorm over lanes, matching tvi.models.layers.layer_norm
    (use_fast_variance: var = E[x^2] - E[x]^2)."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * lns + lnb


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


def _v5_kernel(*refs, heads: int, scale: float, eps: float, residual: bool,
               kv_chunk: int, in_proj: bool, block_q: int,
               with_gn: bool = False):
    ga_ref = gb_ref = None
    if in_proj:
        if with_gn:
            (x_ref, lns_ref, lnb_ref, wq_ref, wkv_ref, wo_ref, bo_ref,
             win_ref, bin_ref, ga_ref, gb_ref, o_ref, kv_ref, kn_ref,
             xp_ref) = refs
        else:
            (x_ref, lns_ref, lnb_ref, wq_ref, wkv_ref, wo_ref, bo_ref,
             win_ref, bin_ref, o_ref, kv_ref, kn_ref, xp_ref) = refs
    else:
        (x_ref, xq_ref, lns_ref, lnb_ref, wq_ref, wkv_ref, wo_ref, bo_ref,
         o_ref, kv_ref, kn_ref) = refs
    i = pl.program_id(1)
    inner = wq_ref.shape[-1]
    d = inner // heads
    s = x_ref.shape[1]
    s_pad = kv_ref.shape[0]          # S padded to 128 lanes for the logits
    lns = lns_ref[:].astype(jnp.float32)
    lnb = lnb_ref[:].astype(jnp.float32)
    cst = scale * LOG2E

    @pl.when(i == 0)
    def _project_kv():
        # [proj_in +] LN(x) @ Wkv into the persistent scratch, chunked so
        # the fp32 temporaries stay ~4 MB; per-head max ||k|| tracked
        # across chunks.
        if s_pad != s:
            kv_ref[s:, :] = jnp.zeros((s_pad - s, 2 * inner), kv_ref.dtype)
        kmax = [jnp.float32(0.0)] * heads
        for ci in range(s // kv_chunk):
            rows = slice(ci * kv_chunk, (ci + 1) * kv_chunk)
            if in_proj:
                xc = x_ref[0, rows, :]
                if with_gn:
                    # GroupNorm APPLY folded in (stats precomputed XLA-side
                    # as a per-(batch, channel) affine): xc*a + b == GN(xc)
                    xc = (xc.astype(jnp.float32) * ga_ref[0]
                          + gb_ref[0]).astype(xc.dtype)
                xpc = (_dot(xc, win_ref[:])
                       + bin_ref[:].astype(jnp.float32)).astype(xp_ref.dtype)
                xp_ref[rows, :] = xpc           # bf16 round-trip == XLA path
                xf = xpc.astype(jnp.float32)
            else:
                xf = x_ref[0, rows, :].astype(jnp.float32)
            xn = _ln_rows(xf, lns, lnb, eps).astype(kv_ref.dtype)
            kvc = _dot(xn, wkv_ref[:])                      # (chunk, 2*inner)
            kv_ref[rows, :] = kvc.astype(kv_ref.dtype)
            for h in range(heads):
                kh = kvc[:, h * d:(h + 1) * d]
                kmax[h] = jnp.maximum(
                    kmax[h],
                    jnp.max(jnp.sum(kh * kh, axis=-1, keepdims=True)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.zeros((1, 128), jnp.float32)
        for h in range(heads):
            row = jnp.where(lane == h, jnp.sqrt(kmax[h]), row)
        kn_ref[:] = row

    if in_proj:
        xq = xp_ref[pl.ds(i * block_q, block_q), :]         # (BQ, C) bf16
        xqf = xq.astype(jnp.float32)
    else:
        xqf = xq_ref[0].astype(jnp.float32)                 # (BQ, C)
    xn_q = _ln_rows(xqf, lns, lnb, eps).astype(kv_ref.dtype)
    q = _dot(xn_q, wq_ref[:]).astype(kv_ref.dtype)
    wo = wo_ref[:]
    ohs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl]
        kh = kv_ref[:, sl]
        vh = kv_ref[:, inner + h * d:inner + (h + 1) * d]
        qn = jnp.sqrt(jnp.sum(jnp.square(qh.astype(jnp.float32)), axis=-1,
                              keepdims=True))
        shift = qn * (kn_ref[0, h] * cst) - SHIFT_BACKOFF   # (BQ, 1)
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) * cst      # (BQ, S_pad) log2
        p = jnp.exp2(logits - shift)
        if s_pad != s:
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
            p = jnp.where(col < s, p, 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        oh = _dot(p.astype(vh.dtype), vh)                   # (BQ, d) fp32
        ohs.append((oh / l).astype(q.dtype))
    o_cat = ohs[0] if heads == 1 else jnp.concatenate(ohs, axis=1)
    acc = _dot(o_cat, wo)                                   # (BQ, C_out)
    acc = acc + bo_ref[:].astype(jnp.float32)
    if residual:
        acc = acc + xqf
    o_ref[0] = acc.astype(o_ref.dtype)


def ln_attention_out_reference(x: jax.Array, lns: jax.Array, lnb: jax.Array,
                               wq: jax.Array, wkv: jax.Array, wo: jax.Array,
                               bo: jax.Array, w_in=None, b_in=None,
                               gn_a=None, gn_b=None,
                               heads: int = 1, scale: float = 1.0,
                               eps: float = 1e-5,
                               residual: bool = True) -> jax.Array:
    """Pure-XLA math of _v5_kernel — backward path + parity oracle.
    ``gn_a``/``gn_b``: (B, 1, C) per-instance GroupNorm affine applied
    before the input projection."""
    from tvi.models.layers import layer_norm
    from tvi.ops.diffable import chunked_attention_out_reference

    inner = wq.shape[-1]
    if gn_a is not None:
        x = (x.astype(jnp.float32) * gn_a + gn_b).astype(x.dtype)
    if w_in is not None:
        x = (jnp.einsum("bsc,ci->bsi", x, w_in.astype(x.dtype),
                        preferred_element_type=jnp.float32)
             + b_in.astype(jnp.float32)).astype(x.dtype)
    xn = layer_norm(x, lns, lnb, eps)
    q = jnp.einsum("bsc,ci->bsi", xn, wq,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    kv = jnp.einsum("bsc,ci->bsi", xn, wkv,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    return chunked_attention_out_reference(
        q, kv[..., :inner], kv[..., inner:], x, wo, bo,
        heads=heads, scale=scale, residual=residual)


def fused_ln_attention_out(x: jax.Array, lns: jax.Array, lnb: jax.Array,
                           wq: jax.Array, wkv: jax.Array, wo: jax.Array,
                           bo: jax.Array, w_in=None, b_in=None,
                           gn_a=None, gn_b=None,
                           heads: int = 1, scale: float = 1.0,
                           eps: float = 1e-5, residual: bool = True,
                           block_q: int = 0,
                           interpret: bool = False) -> jax.Array:
    """Differentiable wrapper: Pallas forward, reference-XLA backward
    (rematerialized, query-block-chunked attention — tvi/ops/diffable.py)."""
    from tvi.ops.diffable import pallas_with_reference_vjp

    fused = functools.partial(_fused_ln_attention_out_fwd, heads=heads,
                              scale=scale, eps=eps, residual=residual,
                              block_q=block_q, interpret=interpret)
    ref = functools.partial(ln_attention_out_reference, heads=heads,
                            scale=scale, eps=eps, residual=residual)
    return pallas_with_reference_vjp(fused, ref, x, lns, lnb, wq, wkv, wo,
                                     bo, w_in, b_in, gn_a, gn_b)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "eps",
                                             "residual", "block_q",
                                             "interpret"))
def _fused_ln_attention_out_fwd(x: jax.Array, lns: jax.Array, lnb: jax.Array,
                                wq: jax.Array, wkv: jax.Array, wo: jax.Array,
                                bo: jax.Array, w_in=None, b_in=None,
                                gn_a=None, gn_b=None,
                                heads: int = 1, scale: float = 1.0,
                                eps: float = 1e-5, residual: bool = True,
                                block_q: int = 0,
                                interpret: bool = False) -> jax.Array:
    b, s, c_in = x.shape
    in_proj = w_in is not None
    with_gn = gn_a is not None
    c = w_in.shape[-1] if in_proj else c_in
    inner = wq.shape[-1]
    c_out = wo.shape[-1]
    if not block_q:
        block_q = _pick_block_q(s)
    kv_chunk = _pick_kv_chunk(s, max(c, c_in))
    s_pad = s + (-s) % 128           # K/V rows padded for the logits lanes
    grid = (b, s // block_q)
    kernel = functools.partial(_v5_kernel, heads=heads, scale=scale, eps=eps,
                               residual=residual, kv_chunk=kv_chunk,
                               in_proj=in_proj, block_q=block_q,
                               with_gn=with_gn)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    # whole-batch x: constant index per b -> fetched once, resident
    in_specs = [pl.BlockSpec((1, s, c_in), lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [x]
    if not in_proj:
        in_specs.append(pl.BlockSpec((1, block_q, c), lambda bi, i: (bi, i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(x)
    in_specs += [const((1, c)), const((1, c)), const(wq.shape),
                 const(wkv.shape), const(wo.shape), const((1, c_out))]
    operands += [lns.reshape(1, c), lnb.reshape(1, c), wq, wkv, wo,
                 bo.reshape(1, c_out)]
    if in_proj:
        in_specs += [const(w_in.shape), const((1, c))]
        operands += [w_in, b_in.reshape(1, c)]
        if with_gn:
            # per-batch GN affine rows: block (1, 1, C_in) at (bi, 0, 0)
            in_specs += [pl.BlockSpec((1, 1, c_in), lambda bi, i: (bi, 0, 0),
                                      memory_space=pltpu.VMEM)] * 2
            operands += [gn_a.astype(jnp.float32),
                         gn_b.astype(jnp.float32)]
    scratch = [
        pltpu.VMEM((s_pad, 2 * inner), x.dtype),        # K | V (padded)
        pltpu.VMEM((1, 128), jnp.float32),              # max ||k|| / head
    ]
    if in_proj:
        scratch.append(pltpu.VMEM((s, c), x.dtype))     # projected input
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, c_out), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c_out), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            # scratch carries per-batch state across q-blocks: sequential
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * s * c_in * c * int(in_proj)    # input projection
                   + 2 * b * s * c * 3 * inner            # QKV projections
                   + 2 * 2 * b * s * s * inner            # QK^T + PV
                   + 2 * b * s * inner * c_out),          # out-projection
            bytes_accessed=(b * s * c_in + b * s * c_out) * 2,
            transcendentals=b * heads * s * s,
        ),
        interpret=interpret,
    )(*operands)


def ln_attention_out_eligible(b: int, s: int, c: int, inner: int, c_out: int,
                              heads: int, c_in: int = 0) -> bool:
    """v5 shapes: d=64 heads, whole blocks, resident x + KV scratch +
    fp32 logits fit VMEM.  ``c_in``: input-projection variant (c_in -> c)."""
    if inner % heads or (inner // heads) != 64:
        return False
    if c % 8 or c_out % 8 or s % 8 or (c_in and c_in % 8):
        return False
    bq = _pick_block_q(s)
    if not bq or bq < 64 or s < 2 * bq:
        return False
    if not _pick_kv_chunk(s, max(c, c_in)):
        return False
    s_pad = s + (-s) % 128
    vmem = (2 * s * (c_in or c) * 2    # resident x + prefetch double buffer
            + s_pad * 2 * inner * 2    # KV scratch (padded)
            + (s * c * 2 if c_in else 0)            # xp scratch
            + 2 * bq * s_pad * 4       # logits + p (fp32)
            + 3 * bq * max(c, c_in) * 4             # LN/proj fp32 temps
            + (3 * c * inner + inner * c_out + c_in * c) * 2)  # weights
    return vmem < 80 * 1024 * 1024
