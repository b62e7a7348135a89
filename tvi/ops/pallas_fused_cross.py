"""Fused small-context cross-attention Pallas kernel: LN -> Q-projection ->
S_ctx-token attention -> out-projection -> +residual in ONE kernel.

Why: both cross-attentions in the SVD transformer blocks attend to a tiny
context — 3 CLIP/projector tokens spatially (BasicTransformerBlock.attn2)
and the 2 first-frame tokens temporally (TemporalBasicTransformerBlock
.attn2, reference src/models/transformer_temporal.py:279-297).  The
attention itself is trivial, but the q- and out-projections are (M, C, C)
thin-N matmuls sitting on XLA's ~17.6 TF/s cliff (PERF.md round-3
mm_bf16_proj320), plus an LN pass and a residual pass — ~14 ms per call at
the 320-wide headline shapes.  This kernel keeps a row block resident:

    y = x + Wo( softmax(ln(x) Wq . K_ctx^T) V_ctx ) + bo

with K_ctx/V_ctx precomputed (tiny: G groups x S_ctx tokens) and resident
per program, and the thin matmuls as in-VMEM dots.

Context grouping: rows of x are grouped — all ``rows_per_group``
consecutive rows share one context (spatially the group is a batch-frame,
temporally a whole CFG-batch of pixels).  The kernel picks its group's K/V
via the BlockSpec index map, so the broadcast context never materializes.

Replaces the reference's attn2 + norm2 pairs (vendored attention.py:206-229
and :455-460; attention math AttnProcessor2_0, attention_processor.py:1178)
at serving shapes.  Exact softmax (row max over S_ctx), fp32 stats.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 512


def _ln_rows(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


# context tokens are padded host-side to this many rows: Mosaic's lowering
# of dot_general with a tiny non-contracted rhs dim (N = 2-3 real tokens)
# fails verification ('vector.broadcast' bf16->f32); a 128-wide N is the
# same shape class as the flash kernels' logits and rides the MXU.  The
# extra FLOPs are noise next to the (BM, C, inner) projections.
CTX_PAD = 128


def _fused_cross_kernel(x_ref, lns_ref, lnb_ref, wq_ref, ck_ref, cv_ref,
                        wo_ref, bo_ref, *refs, heads: int, scale: float,
                        eps: float, with_ln: bool, residual: bool,
                        ctx_valid: int, with_ff: bool = False):
    if with_ff:
        (fls_ref, flb_ref, wh_ref, wg_ref, bh_ref, bg_ref, w2_ref, b2_ref,
         o_ref) = refs
    else:
        (o_ref,) = refs
    x = x_ref[:]                                    # (BM, C)
    h = (_ln_rows(x, lns_ref[0], lnb_ref[0], eps).astype(x.dtype)
         if with_ln else x)
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
    q = mm(h, wq_ref[:])                            # (BM, inner) fp32
    inner = q.shape[-1]
    d = inner // heads
    wo = wo_ref[:]
    acc = None
    for hh in range(heads):
        qh = q[:, hh * d:(hh + 1) * d].astype(x.dtype)      # (BM, d)
        kh = ck_ref[0, hh]                                  # (CTX_PAD, d)
        vh = cv_ref[0, hh]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) * scale    # (BM, CTX_PAD)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < ctx_valid, logits, -1e30)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)            # (BM, d)
        contrib = mm(oh.astype(x.dtype), wo[hh * d:(hh + 1) * d, :])
        acc = contrib if acc is None else acc + contrib
    acc = acc + bo_ref[:].astype(jnp.float32)
    if residual:
        acc = acc + x.astype(jnp.float32)
    if with_ff:
        # the block's norm3 + GEGLU FF + residual folded as an epilogue
        # (the FF consumes attn2's output directly — the y write/read
        # kernel boundary disappears); math == pallas_fused_ff.
        from tvi.ops.pallas_geglu import _erf

        y = acc.astype(x.dtype)                     # bf16 round-trip == chain
        h_in = _ln_rows(y, fls_ref[0], flb_ref[0], eps).astype(x.dtype)
        h2 = mm(h_in, wh_ref[:]) + bh_ref[:].astype(jnp.float32)
        g2 = mm(h_in, wg_ref[:]) + bg_ref[:].astype(jnp.float32)
        gated = (h2 * (0.5 * g2 * (1.0 + _erf(g2 * 0.7071067811865476)))
                 ).astype(x.dtype)
        acc = mm(gated, w2_ref[:]) + b2_ref[:].astype(jnp.float32) \
            + y.astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def fused_cross_reference(x2: jax.Array, ln_scale, ln_bias, wq: jax.Array,
                          ctx_k: jax.Array, ctx_v: jax.Array, wo: jax.Array,
                          bo: jax.Array, heads: int, scale: float,
                          rows_per_group: int, eps: float = 1e-5,
                          residual: bool = True) -> jax.Array:
    """Pure-XLA math of _fused_cross_kernel on the grouped layout —
    backward path + parity oracle."""
    m, c = x2.shape
    g, _, s_ctx, d = ctx_k.shape
    h = x2
    if ln_scale is not None:
        h = _ln_rows(x2, ln_scale, ln_bias, eps).astype(x2.dtype)
    q = jnp.dot(h, wq, preferred_element_type=jnp.float32).astype(x2.dtype)
    qg = q.reshape(g, rows_per_group, heads, d)
    logits = jnp.einsum("grhd,ghsd->ghrs", qg.astype(jnp.float32),
                        ctx_k.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("ghrs,ghsd->grhd", p.astype(ctx_v.dtype), ctx_v,
                   preferred_element_type=jnp.float32).astype(x2.dtype)
    out = jnp.dot(o.reshape(m, heads * d), wo,
                  preferred_element_type=jnp.float32)
    out = out + bo.astype(jnp.float32)
    if residual:
        out = out + x2.astype(jnp.float32)
    return out.astype(x2.dtype)


def fused_cross_attention(x2: jax.Array, ln_scale, ln_bias, wq: jax.Array,
                          ctx_k: jax.Array, ctx_v: jax.Array, wo: jax.Array,
                          bo: jax.Array, heads: int, scale: float,
                          rows_per_group: int, eps: float = 1e-5,
                          residual: bool = True, bm: int = 0,
                          ff_params=None,
                          interpret: bool = False) -> jax.Array:
    """Differentiable wrapper: Pallas forward, reference-XLA backward
    (tvi/ops/diffable.py).  ``ff_params``: optional
    (ff_lns, ff_lnb, w1, b1, w2, b2) — the block's norm3 + GEGLU FF +
    residual fold into the kernel's epilogue."""
    from tvi.ops.diffable import pallas_with_reference_vjp

    fused = functools.partial(_fused_cross_fwd, heads=heads, scale=scale,
                              rows_per_group=rows_per_group, eps=eps,
                              residual=residual, bm=bm, interpret=interpret)
    ref = functools.partial(cross_ff_reference, heads=heads, scale=scale,
                            rows_per_group=rows_per_group, eps=eps,
                            residual=residual)
    fp = ff_params if ff_params is not None else (None,) * 6
    return pallas_with_reference_vjp(fused, ref, x2, ln_scale, ln_bias, wq,
                                     ctx_k, ctx_v, wo, bo, *fp)


def cross_ff_reference(x2, ln_scale, ln_bias, wq, ctx_k, ctx_v, wo, bo,
                       ff_lns=None, ff_lnb=None, fw1=None, fb1=None,
                       fw2=None, fb2=None, heads: int = 1, scale: float = 1.0,
                       rows_per_group: int = 1, eps: float = 1e-5,
                       residual: bool = True) -> jax.Array:
    """fused_cross_reference optionally chained with the FF epilogue —
    backward path + parity oracle for the merged kernel."""
    y = fused_cross_reference(x2, ln_scale, ln_bias, wq, ctx_k, ctx_v, wo,
                              bo, heads=heads, scale=scale,
                              rows_per_group=rows_per_group, eps=eps,
                              residual=residual)
    if fw1 is None:
        return y
    from tvi.ops.diffable import chunked_ff_reference

    return chunked_ff_reference(y, ff_lns, ff_lnb, fw1, fb1, fw2, fb2,
                                eps=eps, residual=True)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "eps",
                                             "rows_per_group", "residual",
                                             "bm", "interpret"))
def _fused_cross_fwd(x2: jax.Array, ln_scale, ln_bias, wq: jax.Array,
                     ctx_k: jax.Array, ctx_v: jax.Array, wo: jax.Array,
                     bo: jax.Array, ff_lns=None, ff_lnb=None, fw1=None,
                     fb1=None, fw2=None, fb2=None, heads: int = 1,
                     scale: float = 1.0, rows_per_group: int = 1,
                     eps: float = 1e-5,
                     residual: bool = True, bm: int = 0,
                     interpret: bool = False) -> jax.Array:
    """x2: (M, C) with M = G * rows_per_group; ln_scale/bias: (C,) or None;
    wq: (C, inner); ctx_k/ctx_v: (G, heads, S_ctx, d) head-major projected
    context; wo: (inner, C_out); bo: (C_out,); fw1/fb1/fw2/fb2 + ff_lns/
    ff_lnb: optional norm3 + GEGLU FF epilogue."""
    m, c = x2.shape
    g, _, s_ctx, d = ctx_k.shape
    c_out = wo.shape[-1]
    with_ln = ln_scale is not None
    with_ff = fw1 is not None
    if not with_ln:
        ln_scale = jnp.ones((c,), jnp.float32)
        ln_bias = jnp.zeros((c,), jnp.float32)
    lns = ln_scale.reshape(1, c)
    lnb = ln_bias.reshape(1, c)
    if s_ctx < CTX_PAD:  # see CTX_PAD: lane-wide N for the logits dot
        pad = ((0, 0), (0, 0), (0, CTX_PAD - s_ctx), (0, 0))
        ctx_k = jnp.pad(ctx_k, pad)
        ctx_v = jnp.pad(ctx_v, pad)
    if not bm:
        bm = next(b for b in (BM, 256, 192, 128, 64, 32, 16, 8)
                  if rows_per_group % b == 0)
    grid = (m // bm,)
    row_spec = pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ctx_spec = pl.BlockSpec((1, heads, ctx_k.shape[2], d),
                            lambda i: ((i * bm) // rows_per_group, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
    operands = [x2, lns, lnb, wq, ctx_k, ctx_v, wo, bo.reshape(1, c_out)]
    in_specs = [row_spec, w_spec(lns), w_spec(lnb), w_spec(wq),
                ctx_spec, ctx_spec, w_spec(wo),
                w_spec(bo.reshape(1, c_out))]
    ff_flops = 0
    if with_ff:
        f_inner = fw2.shape[0]
        wh, wg = fw1[:, :f_inner], fw1[:, f_inner:]
        bh = fb1[:f_inner].reshape(1, f_inner)
        bg = fb1[f_inner:].reshape(1, f_inner)
        ff_ops = [ff_lns.reshape(1, c_out), ff_lnb.reshape(1, c_out),
                  wh, wg, bh, bg, fw2, fb2.reshape(1, c_out)]
        operands += ff_ops
        in_specs += [w_spec(a) for a in ff_ops]
        ff_flops = 2 * m * c_out * 3 * f_inner
    out = pl.pallas_call(
        functools.partial(_fused_cross_kernel, heads=heads, scale=scale,
                          eps=eps, with_ln=with_ln, residual=residual,
                          ctx_valid=s_ctx, with_ff=with_ff),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c_out), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * (wq.shape[-1] + c_out)
            + 4 * m * wq.shape[-1] * s_ctx + ff_flops,
            bytes_accessed=(m * c + m * c_out) * 2,
            transcendentals=m * heads * s_ctx,
        ),
        interpret=interpret,
    )(*operands)
    return out


def fused_cross_eligible(m: int, c: int, inner: int, c_out: int, s_ctx: int,
                         rows_per_group: int, residual: bool,
                         ff_inner: int = 0) -> bool:
    """``ff_inner``: GEGLU epilogue inner width (0 = no FF fold).  The FF
    fold is gated to weight sets <= 20 MB (the fused whole-FF kernel's
    measured crowding threshold, PERF.md fff_1280) plus the fp32 GEGLU
    block temporaries."""
    if s_ctx > 8 or inner % 64 or c % 8 or c_out % 8:
        return False
    if residual and c_out != c:
        return False
    if m % rows_per_group:
        return False
    bm = next((b for b in (BM, 256, 192, 128, 64, 32, 16, 8)
               if rows_per_group % b == 0), None)
    if bm is None or bm < 64 or m < 2 * bm:
        return False
    weights = (c * inner + inner * c_out) * 2
    if ff_inner:
        ff_weights = (c_out * 2 * ff_inner + ff_inner * c_out) * 2
        if ff_weights > 20 * 1024 * 1024:
            return False
        weights += ff_weights
        weights += 2 * bm * 2 * ff_inner * 4      # h/g fp32 block temps
    return weights < 44 * 1024 * 1024


def to_head_major_ctx(k: jax.Array, heads: int) -> jax.Array:
    """(G, S_ctx, inner) -> (G, heads, S_ctx, d) for the kernel's per-head
    context blocks (Mosaic rejects 64-lane slices of a wider array)."""
    g, s, inner = k.shape
    return jnp.transpose(k.reshape(g, s, heads, inner // heads), (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# out4d variant: the TEMPORAL attn2+FF kernel additionally writes the
# transformer's FINAL output — alpha blend with the spatial branch, proj_out
# and the outer residual fold into the epilogue, and the output is written
# as (1, F, bp, C) blocks of the (B, F, S, C) spatial view (in-VMEM inverse
# transpose).  The XLA temporal->spatial relayout, the blend pass and the
# thin-N proj_out M-pass all disappear.  Opt-in via TVI_TEMPORAL_4D=1 at
# the dispatch site (tvi/models/transformer_temporal.py).
# ---------------------------------------------------------------------------


def _pick_ff_chunk(rows: int, ff_inner: int) -> int:
    for nch in (1, 2, 4, 8, 16, 32):
        if rows % nch == 0 and (rows // nch) * ff_inner * 8 <= 8 * 1024 * 1024:
            return rows // nch
    return 0


def _cross_ff_out4d_kernel(x_ref, lns_ref, lnb_ref, wq_ref, ck_ref, cv_ref,
                           wo_ref, bo_ref, fls_ref, flb_ref, wh_ref, wg_ref,
                           bh_ref, bg_ref, w2_ref, b2_ref, wpo_ref, bpo_ref,
                           alpha_ref, sp_ref, res_ref, o_ref, *, heads: int,
                           scale: float, eps: float, ctx_valid: int,
                           f: int, fp: int, ff_chunk: int):
    from tvi.ops.pallas_geglu import _erf

    # (bp, F, C) temporal-view block; real Mosaic rejects sublane reshapes
    # whose split/merge factor is not a multiple of the 16-sublane tile
    # (the round-4 chip run failed on the old flat block's
    # (bp*25, C)->(bp, 25, C) cast), so every 2D<->3D move below happens at
    # the padded fp (multiple of 16) or with the 128-pixel bp as the merged
    # minor — both tile-preserving.
    x3 = x_ref[:]
    bp = x3.shape[0]
    c = x3.shape[-1]
    if fp != f:  # in-VMEM frame pad; padded rows are discarded post-slice
        x3 = jnp.concatenate(
            [x3, jnp.zeros((bp, fp - f, c), x3.dtype)], axis=1)
    x = x3.reshape(bp * fp, c)                      # tile-aligned collapse
    bm = bp * fp
    h = _ln_rows(x, lns_ref[0], lnb_ref[0], eps).astype(x.dtype)
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
    q = mm(h, wq_ref[:])                            # (BM, inner) fp32
    inner = q.shape[-1]
    d = inner // heads
    wo = wo_ref[:]
    acc = None
    for hh in range(heads):
        qh = q[:, hh * d:(hh + 1) * d].astype(x.dtype)
        kh = ck_ref[0, hh]
        vh = cv_ref[0, hh]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < ctx_valid, logits, -1e30)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        contrib = mm(oh.astype(x.dtype), wo[hh * d:(hh + 1) * d, :])
        acc = contrib if acc is None else acc + contrib
    acc = acc + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
    y = acc.astype(x.dtype)                         # attn2 out (BM, C)

    # norm3 + GEGLU FF + residual, chunked (fp32 h/g temps bounded)
    chunks = []
    for ci in range(bm // ff_chunk):
        rows = slice(ci * ff_chunk, (ci + 1) * ff_chunk)
        yc = y[rows]
        h_in = _ln_rows(yc, fls_ref[0], flb_ref[0], eps).astype(x.dtype)
        h2 = mm(h_in, wh_ref[:]) + bh_ref[:].astype(jnp.float32)
        g2 = mm(h_in, wg_ref[:]) + bg_ref[:].astype(jnp.float32)
        gated = (h2 * (0.5 * g2 * (1.0 + _erf(g2 * 0.7071067811865476)))
                 ).astype(x.dtype)
        chunks.append((mm(gated, w2_ref[:]) + b2_ref[:].astype(jnp.float32)
                       + yc.astype(jnp.float32)).astype(x.dtype))
    t_out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)

    # temporal -> spatial inverse transpose + alpha blend + proj_out +
    # the transformer's outer residual.  Split sublanes at the padded fp
    # (multiple of 16), transpose, then drop the pad on the major axis.
    tt = jnp.swapaxes(t_out.reshape(bp, fp, c), 0, 1)[:f]  # (F, bp, C)
    # scalar blend factors in fp32: Mosaic cannot legalize scalar bf16
    # arith (the round-4 re-gate failed on the bf16 `1.0 - a` subf)
    a32 = alpha_ref[0, 0]
    a = a32.astype(x.dtype)
    om = (1.0 - a32).astype(x.dtype)
    z = (a * sp_ref[0] + om * tt).reshape(f * bp, c)
    o = mm(z, wpo_ref[:]) + bpo_ref[:].astype(jnp.float32)
    o = o + res_ref[0].reshape(f * bp, -1).astype(jnp.float32)
    o_ref[0] = o.reshape(f, bp, -1).astype(o_ref.dtype)


def cross_ff_out4d_reference(x2, lns, lnb, wq, ctx_k, ctx_v, wo, bo,
                             ff_lns, ff_lnb, fw1, fb1, fw2, fb2, wpo, bpo,
                             alpha, spatial4, res4, heads: int = 1,
                             scale: float = 1.0, rows_per_group: int = 1,
                             eps: float = 1e-5) -> jax.Array:
    """Materialized chain — backward path + parity oracle.  x2: (B*S*F, C)
    pixel-major; spatial4/res4: (B, F, S, C*); returns (B, F, S, C_out)."""
    b, f, s, c = spatial4.shape
    y = cross_ff_reference(x2, lns, lnb, wq, ctx_k, ctx_v, wo, bo,
                           ff_lns, ff_lnb, fw1, fb1, fw2, fb2, heads=heads,
                           scale=scale, rows_per_group=rows_per_group,
                           eps=eps, residual=True)
    y4 = jnp.swapaxes(y.reshape(b, s, f, c), 1, 2)        # (B, F, S, C)
    a = alpha.astype(y4.dtype)
    z = a * spatial4 + (1.0 - a) * y4
    o = jnp.dot(z.reshape(-1, c), wpo,
                preferred_element_type=jnp.float32)
    o = o + bpo.astype(jnp.float32)
    o = o.reshape(b, f, s, -1) + res4.astype(jnp.float32)
    return o.astype(x2.dtype)


def fused_cross_ff_out4d(x2, lns, lnb, wq, ctx_k, ctx_v, wo, bo, ff_params,
                         wpo, bpo, alpha, spatial4, res4, heads: int,
                         scale: float, eps: float = 1e-5,
                         interpret: bool = False) -> jax.Array:
    """Differentiable wrapper (Pallas forward, materialized reference
    backward).  ``ctx_k/ctx_v``: (B, heads, S_ctx, d) — one context group
    per CFG batch (the temporal attn2 contract)."""
    from tvi.ops.diffable import pallas_with_reference_vjp

    fused = functools.partial(_cross_ff_out4d_fwd, heads=heads, scale=scale,
                              eps=eps, interpret=interpret)
    b, f, s, c = spatial4.shape
    ref = functools.partial(cross_ff_out4d_reference, heads=heads,
                            scale=scale, rows_per_group=s * f, eps=eps)
    return pallas_with_reference_vjp(fused, ref, x2, lns, lnb, wq, ctx_k,
                                     ctx_v, wo, bo, *ff_params, wpo, bpo,
                                     alpha, spatial4, res4)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "eps",
                                             "interpret"))
def _cross_ff_out4d_fwd(x2, lns, lnb, wq, ctx_k, ctx_v, wo, bo, ff_lns,
                        ff_lnb, fw1, fb1, fw2, fb2, wpo, bpo, alpha,
                        spatial4, res4, heads: int = 1, scale: float = 1.0,
                        eps: float = 1e-5,
                        interpret: bool = False) -> jax.Array:
    b, f, s, c = spatial4.shape
    c_out = wpo.shape[-1]
    g, _, s_ctx, d = ctx_k.shape
    f_inner = fw2.shape[0]
    if s_ctx < CTX_PAD:
        pad = ((0, 0), (0, 0), (0, CTX_PAD - s_ctx), (0, 0))
        ctx_k = jnp.pad(ctx_k, pad)
        ctx_v = jnp.pad(ctx_v, pad)
    from tvi.ops.pallas_fused_temporal import _pad_f

    fp = _pad_f(f)
    bp = next(p for p in (128, 64, 32, 16) if s % p == 0)
    n_sb = s // bp
    grid = (b, n_sb)
    ff_chunk = _pick_ff_chunk(bp * fp, f_inner)
    # 3D temporal view: (B*S, F, C) blocks of (bp, F, C) — the trailing two
    # block dims equal the array dims, which Mosaic allows; the frame pad to
    # the 16-sublane tile happens in VMEM only (same construct as the fused
    # temporal kernel's in-kernel pad).
    x3 = x2.reshape(b * s, f, c)
    x_spec = pl.BlockSpec((bp, f, c), lambda bi, si: (bi * n_sb + si, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = lambda a_: pl.BlockSpec(a_.shape, lambda bi, si: (0,) * a_.ndim,
                                     memory_space=pltpu.VMEM)
    wh, wg = fw1[:, :f_inner], fw1[:, f_inner:]
    bh = fb1[:f_inner].reshape(1, f_inner)
    bg = fb1[f_inner:].reshape(1, f_inner)
    alpha_row = jnp.broadcast_to(
        alpha.reshape(1, 1).astype(jnp.float32), (1, 128))
    sp4_spec = pl.BlockSpec((1, f, bp, c), lambda bi, si: (bi, 0, si, 0),
                            memory_space=pltpu.VMEM)
    res_spec = pl.BlockSpec((1, f, bp, c_out), lambda bi, si: (bi, 0, si, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_cross_ff_out4d_kernel, heads=heads, scale=scale,
                          eps=eps, ctx_valid=s_ctx, f=f, fp=fp,
                          ff_chunk=ff_chunk),
        grid=grid,
        in_specs=[
            x_spec,
            w_spec(lns.reshape(1, c)), w_spec(lnb.reshape(1, c)),
            w_spec(wq),
            pl.BlockSpec((1, heads, ctx_k.shape[2], d),
                         lambda bi, si: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, ctx_k.shape[2], d),
                         lambda bi, si: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec(wo), w_spec(bo.reshape(1, c)),
            w_spec(ff_lns.reshape(1, c)), w_spec(ff_lnb.reshape(1, c)),
            w_spec(wh), w_spec(wg), w_spec(bh), w_spec(bg),
            w_spec(fw2), w_spec(fb2.reshape(1, c)),
            w_spec(wpo), w_spec(bpo.reshape(1, c_out)),
            w_spec(alpha_row), sp4_spec, res_spec,
        ],
        out_specs=pl.BlockSpec((1, f, bp, c_out),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, s, c_out), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * f * c * (wq.shape[-1] + c + 3 * f_inner + c_out)
            + 4 * b * s * f * wq.shape[-1] * s_ctx,
            bytes_accessed=(3 * b * s * f * c + b * s * f * c_out) * 2,
            transcendentals=b * s * f * (heads * s_ctx + 2 * f_inner),
        ),
        interpret=interpret,
    )(x3, lns.reshape(1, c), lnb.reshape(1, c), wq, ctx_k, ctx_v, wo,
      bo.reshape(1, c), ff_lns.reshape(1, c), ff_lnb.reshape(1, c),
      wh, wg, bh, bg, fw2, fb2.reshape(1, c), wpo,
      bpo.reshape(1, c_out), alpha_row, spatial4, res4)


def cross_ff_out4d_eligible(b: int, f: int, s: int, c: int, inner: int,
                            c_out: int, s_ctx: int, ff_inner: int) -> bool:
    """Temporal attn2 + FF + blend + proj_out + residual in one kernel:
    per-CFG-batch context, whole-pixel blocks, FF weights <= 20 MB.
    F is padded in VMEM to the 16-sublane tile (any F <= 64 works)."""
    if s_ctx > 8 or inner % 64 or c % 8 or c_out % 8 or f > 64:
        return False
    from tvi.ops.pallas_fused_temporal import _pad_f

    fp = _pad_f(f)
    bp = next((p for p in (128, 64, 32, 16) if s % p == 0), None)
    if bp is None or bp % 16:
        return False
    bm = bp * fp
    if not _pick_ff_chunk(bm, ff_inner):
        return False
    ff_w = (c * 2 * ff_inner + ff_inner * c) * 2
    if ff_w > 20 * 1024 * 1024:
        return False
    weights = ff_w + (c * inner + inner * c + c * c_out) * 2
    tiles = (bm * c * 2 * 4          # x(padded), y, t_out, z
             + 2 * f * bp * max(c, c_out) * 2    # spatial + residual blocks
             + bm * c_out * 4)
    return weights + tiles + 16 * 1024 * 1024 < 88 * 1024 * 1024
