"""Fused QKV-projection + frame-attention + out-projection Pallas kernel.

Why: round-1 profiling (PERF.md) proved the temporal self-attention's cost is
NOT the attention core (the dedicated rows kernel runs 8.8 ms/call at the
headline shape) but the HBM traffic *around* it: the q/k/v projections, the
attention output, and the out-projection each round-trip the full
(R=B*H*W, F, C) activation through HBM — ~10 tensor passes per temporal
block.  This kernel holds one row-block of the activation in VMEM and runs

    q,k,v = x @ Wq, x @ Wk, x @ Wv          (one MXU pass each)
    o_h   = softmax(q_h k_h^T / sqrt(d)) v_h  per 64-wide head, logits in VMEM
    out   = sum_h o_h @ Wo[h] + bo           (accumulated out-projection)

in one pass: HBM traffic drops to read x + write out (+ the tiny weights,
resident across the row grid).

Replaces the unfused sequence in tvi/models/layers.py::Attention for the
frame-axis self-attention of TemporalBasicTransformerBlock (the reference's
diffusers TemporalBasicTransformerBlock self-attn, imported at reference
src/models/transformer_temporal.py:22; attention math =
AttnProcessor2_0, src/models/attention_processor.py:1178).

Layout notes (Mosaic constraints, found the hard way):
  - the in-kernel collapse (BR, F, C) -> (BR*F, C) for the projection
    matmuls is only a supported shape cast when F is a multiple of the bf16
    sublane tile (16) — Mosaic rejects 'vector<256x25x320> -> 6400x320'.
    The wrapper therefore zero-pads frames to the next multiple of 16 and
    the kernel masks the padded KEY frames out of the softmax (padded QUERY
    frames produce finite garbage rows that the wrapper slices off).
  - per-head lane slices are 64-wide (d_head=64 for every SVD temporal
    layer); the out-projection is accumulated per head (o_h @ Wo-rows)
    instead of concatenating heads, which keeps every intermediate
    MXU-shaped and avoids lane-concat relayouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 16  # bf16 sublane tile; fp32 inputs also pad to this (8 | 16)


def _pad_f(f: int) -> int:
    return f + (-f) % _SUBLANE


# Rows per grouped-attention block (see _fused_kernel).  Measured on the
# chip: grouping LOSES (ft320_g1 14.4 ms / g8 15.3 / g16 17.9 — perf_lab),
# i.e. Mosaic's BR-batched tiny (Fp,d)x(d,Fp) dots are NOT the limiter;
# the kernel sits at the in-kernel thin-N dot rate (~27 TF/s, still 2x the
# unfused chain).  Default stays 1; TVI_TEMPORAL_GROUP keeps the A/B alive.
GROUP = 1


def _pick_block_r(f: int, c: int, c_out: int, group: int = GROUP,
                  ffin: bool = False) -> int:
    """Largest row block whose working set fits the VMEM budget."""
    for block_r in (512, 256, 128, 64):
        if _vmem_bytes(block_r, f, c, c_out, group, ffin) < 72 * 1024 * 1024:
            return block_r
    return 32


def _vmem_bytes(block_r: int, f: int, c: int, c_out: int,
                group: int = GROUP, ffin: bool = False) -> int:
    fp = _pad_f(f)
    tile = block_r * fp * c * 2
    qkv = 3 * tile
    acc = block_r * fp * c_out * 4
    out = block_r * fp * c_out * 2 * 2
    weights = (3 * c * c + c * c_out) * 2
    logits = block_r * fp * (group * fp) * 4 * 2  # logits + softmax copy
    total = 2 * tile + qkv + acc + out + weights + logits
    if ffin:
        # t1 scratch + GEGLU weights + bounded fp32 prologue temps
        total += tile + (c * 8 * c + 4 * c * c) * 2 + 8 * 1024 * 1024
    return total


def _fused_kernel(x_ref, *refs, heads: int, scale: float, f_valid: int,
                  group: int, with_ln: bool, residual: bool,
                  with_ffin: bool = False, ffin_chunk: int = 0,
                  fp_pad: int = 0, in_4d: bool = False):
    """Grouped frame attention: a per-row (Fp, d) x (d, Fp) logits dot is a
    32x32 output with K=64 — 1/16th of the MXU, and Mosaic serializes the
    BR-batched form into thousands of such dots (measured 36 TF/s for the
    whole sublayer).  Instead, ``group`` consecutive rows share ONE
    (G*Fp, d) x (d, G*Fp) MXU-shaped dot and a block-diagonal mask kills
    the cross-row products.  G=8 wastes 8x the attention-core FLOPs (~5% of
    the kernel's total) to run them at MXU rate instead of 1/16th rate.

    ``with_ffin``: the block's ff_in (norm_in + GEGLU + out-proj +
    residual) runs as a chunked prologue into a VMEM scratch — the ff_in
    output never round-trips HBM before the attention consumes it."""
    if in_4d:
        emb_ref, *refs = refs
    if with_ffin:
        (fls_ref, flb_ref, fwh_ref, fwg_ref, fbh_ref, fbg_ref, fw2_ref,
         fb2_ref, *refs) = refs
    if with_ln:
        (lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
         o_ref, *scratch) = refs
    else:
        wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref, *scratch = refs
    if in_4d:
        # untransposed input: block (1, F, bp, C) of the (B, F, S, C) view;
        # frame-pos embedding added and the (F, bp) transpose done in VMEM
        # — the XLA emb-add + transpose relayout pass never materializes
        x4 = x_ref[0] + emb_ref[0]                 # (F, bp, C) + (F, 1, C)
        x = jnp.swapaxes(x4, 0, 1)                 # (bp, F, C)
    else:
        x = x_ref[:]                               # (BR, F or Fp, C)
    br, f_in, c = x.shape
    fp = fp_pad or f_in
    if f_in != fp:
        # in-kernel frame padding: the HBM block streams only the real F
        # frames (the (…, F, C) trailing block dims equal the array dims,
        # which Mosaic allows) — the 16-sublane zero-pad lives in VMEM only
        x = jnp.concatenate(
            [x, jnp.zeros((br, fp - f_in, c), x.dtype)], axis=1)
    wq, wk, wv, wo = wq_ref[:], wk_ref[:], wv_ref[:], wo_ref[:]

    x2 = x.reshape(br * fp, c)                     # sublane-aligned collapse
    if with_ffin:
        from tvi.ops.pallas_geglu import _erf

        t1_ref = scratch[0]
        mmf = functools.partial(jax.lax.dot_general,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        fls = fls_ref[:].astype(jnp.float32)
        flb = flb_ref[:].astype(jnp.float32)
        for ci in range((br * fp) // ffin_chunk):
            rows = slice(ci * ffin_chunk, (ci + 1) * ffin_chunk)
            xc = x2[rows]
            xf = xc.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) \
                - jnp.square(mean)
            h_in = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * fls
                    + flb).astype(x.dtype)
            h2 = mmf(h_in, fwh_ref[:]) + fbh_ref[:].astype(jnp.float32)
            g2 = mmf(h_in, fwg_ref[:]) + fbg_ref[:].astype(jnp.float32)
            gated = (h2 * (0.5 * g2 * (1.0 + _erf(g2 * 0.7071067811865476)))
                     ).astype(x.dtype)
            t1_ref[rows, :] = (mmf(gated, fw2_ref[:])
                               + fb2_ref[:].astype(jnp.float32)
                               + xf).astype(t1_ref.dtype)
        x2 = t1_ref[:]
    if with_ln:
        # norm1 folded in: q/k/v project the normalized rows, the residual
        # epilogue adds the raw ones (TemporalBasicTransformerBlock attn1)
        xf = x2.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) \
            - jnp.square(mean)
        xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)
              * lns_ref[:].astype(jnp.float32)
              + lnb_ref[:].astype(jnp.float32)).astype(x.dtype)
    else:
        xn = x2
    mm2 = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
    inner = wq.shape[-1]
    q = mm2(xn, wq).astype(x.dtype)                # (BR*Fp, inner)
    k = mm2(xn, wk).astype(x.dtype)
    v = mm2(xn, wv).astype(x.dtype)

    d = inner // heads
    g = group
    gfp = g * fp
    nb = br // g
    # queries attend only keys of their own row block and only valid frames
    row = jax.lax.broadcasted_iota(jnp.int32, (gfp, gfp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (gfp, gfp), 1)
    keep = (row // fp == col // fp) & (col % fp < f_valid)
    acc = None
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl].reshape(nb, gfp, d)
        kh = k[:, sl].reshape(nb, gfp, d)
        vh = v[:, sl].reshape(nb, gfp, d)
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) * scale   # (nb, gfp, gfp)
        logits = jnp.where(keep[None], logits, -1e30)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            (p / l).astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # (nb, gfp, d)
        # accumulate the out-projection per head: oh @ Wo[h*d:(h+1)*d, :]
        contrib = mm2(oh.astype(x.dtype).reshape(br * fp, d),
                      wo[h * d:(h + 1) * d, :])            # (BR*Fp, C_out)
        acc = contrib if acc is None else acc + contrib

    acc = acc + bo_ref[:].astype(jnp.float32)[None, :]
    if residual:
        acc = acc + x2.astype(jnp.float32)
    out3 = acc.reshape(br, fp, wo.shape[-1]).astype(o_ref.dtype)
    # write only the real frames (padded query frames never leave VMEM)
    o_ref[:] = out3 if o_ref.shape[1] == fp else out3[:, :o_ref.shape[1], :]


def _flat_kernel(x_ref, *refs, heads: int, scale: float, f: int,
                 with_ln: bool, residual: bool, with_ffin: bool = False,
                 ffin_chunk: int = 0):
    """Flat-F variant: the block is P whole pixels x F frames = (BM, C)
    rows with NO frame padding (the collapsed (BR,F,C)->(BR*F,C) reshape
    of _fused_kernel needs F % 16; flat blocks only need BM % 8, so F=25
    streams 25 rows/pixel instead of 32 — a 28% M-traffic saving).  Each
    head runs ONE (BM, d) x (d, BM) logits dot; an F-block-diagonal mask
    kills cross-pixel products; the out-projection is one full-K dot on
    the lane-concat of head outputs.

    ``with_ffin``: ff_in GEGLU prologue into a t1 scratch (see
    _fused_kernel) — the flat layout needs no frame padding."""
    if with_ffin:
        (fls_ref, flb_ref, fwh_ref, fwg_ref, fbh_ref, fbg_ref, fw2_ref,
         fb2_ref, *refs) = refs
    if with_ln:
        (lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
         o_ref, *scratch) = refs
    else:
        wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref, *scratch = refs
    x2 = x_ref[:]                                   # (BM, C)
    bm = x2.shape[0]
    wq, wk, wv, wo = wq_ref[:], wk_ref[:], wv_ref[:], wo_ref[:]
    if with_ffin:
        from tvi.ops.pallas_geglu import _erf

        t1_ref = scratch[0]
        mmf = functools.partial(jax.lax.dot_general,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        fls = fls_ref[:].astype(jnp.float32)
        flb = flb_ref[:].astype(jnp.float32)
        for ci in range(bm // ffin_chunk):
            rows = slice(ci * ffin_chunk, (ci + 1) * ffin_chunk)
            xc = x2[rows]
            xf = xc.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) \
                - jnp.square(mean)
            h_in = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * fls
                    + flb).astype(x2.dtype)
            h2 = mmf(h_in, fwh_ref[:]) + fbh_ref[:].astype(jnp.float32)
            g2 = mmf(h_in, fwg_ref[:]) + fbg_ref[:].astype(jnp.float32)
            gated = (h2 * (0.5 * g2 * (1.0 + _erf(g2 * 0.7071067811865476)))
                     ).astype(x2.dtype)
            t1_ref[rows, :] = (mmf(gated, fw2_ref[:])
                               + fb2_ref[:].astype(jnp.float32)
                               + xf).astype(t1_ref.dtype)
        x2 = t1_ref[:]
    if with_ln:
        xf = x2.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) \
            - jnp.square(mean)
        xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)
              * lns_ref[:].astype(jnp.float32)
              + lnb_ref[:].astype(jnp.float32)).astype(x2.dtype)
    else:
        xn = x2
    mm2 = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
    inner = wq.shape[-1]
    d = inner // heads
    q = mm2(xn, wq).astype(x2.dtype)                # (BM, inner)
    k = mm2(xn, wk).astype(x2.dtype)
    v = mm2(xn, wv).astype(x2.dtype)
    # grouped batching: 8 pixels share one (8F, d) x (d, 8F) dot — 8F is a
    # sublane multiple for any F, and the masked-FLOP waste stays 8x the
    # tiny attention core (a whole-block BMxBM dot would waste P x)
    gfp = 8 * f
    nb = bm // gfp
    row = jax.lax.broadcasted_iota(jnp.int32, (gfp, gfp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (gfp, gfp), 1)
    keep = (row // f) == (col // f)
    ohs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl].reshape(nb, gfp, d)
        kh = k[:, sl].reshape(nb, gfp, d)
        vh = v[:, sl].reshape(nb, gfp, d)
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) * scale   # (nb, gfp, gfp)
        logits = jnp.where(keep[None], logits, -1e30)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            (p / l).astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # (nb, gfp, d)
        ohs.append(oh.reshape(bm, d).astype(x2.dtype))
    o_cat = ohs[0] if heads == 1 else jnp.concatenate(ohs, axis=1)
    acc = mm2(o_cat, wo) + bo_ref[:].astype(jnp.float32)
    if residual:
        acc = acc + x2.astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _pick_flat_pixels(f: int, c: int, c_out: int) -> int:
    """Pixels per program: BM = f*P rows, BM % 8 == 0, logits fp32 in
    budget (~2048-row blocks)."""
    p = 8  # grouped dots take 8 pixels each (gfp = 8F)
    while f * p * 2 <= 2048:
        p *= 2
    return p


def fused_temporal_reference(x: jax.Array, lns, lnb, wq: jax.Array,
                             wk: jax.Array, wv: jax.Array, wo: jax.Array,
                             bo: jax.Array, heads: int, scale: float,
                             residual: bool = False) -> jax.Array:
    """Pure-XLA math of _fused_kernel: [LN +] QKV projection, per-head frame
    attention, out-projection [+ residual].  Backward path + parity oracle."""
    r, f, c = x.shape
    inner = wq.shape[-1]
    d = inner // heads
    x_res = x
    if lns is not None:
        from tvi.models.layers import layer_norm

        x = layer_norm(x, lns, lnb)
    x2 = x.reshape(r * f, c)
    proj = lambda w: jnp.dot(x2, w, preferred_element_type=jnp.float32) \
        .astype(x.dtype).reshape(r, f, heads, d)
    q, k, v = proj(wq), proj(wk), proj(wv)
    logits = jnp.einsum("rfhd,rghd->rhfg", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("rhfg,rghd->rfhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    out = jnp.dot(o.reshape(r * f, inner), wo,
                  preferred_element_type=jnp.float32)
    out = out + bo.astype(jnp.float32)
    out = out.reshape(r, f, wo.shape[-1])
    if residual:
        out = out + x_res.astype(jnp.float32)
    return out.astype(x.dtype)


def temporal_block_reference(x, fls, flb, lns, lnb, wq, wk, wv, wo, bo,
                             fwh=None, fb1=None, fw2=None, fb2=None,
                             heads: int = 1, scale: float = 1.0,
                             residual: bool = True) -> jax.Array:
    """ff_in -> [LN + frame attention + residual] reference chain for the
    with_ffin kernel — backward path + parity oracle."""
    r, f, c = x.shape
    if fwh is not None:
        from tvi.ops.diffable import chunked_ff_reference

        t1 = chunked_ff_reference(x.reshape(r * f, c), fls, flb, fwh, fb1,
                                  fw2, fb2, residual=True).reshape(r, f, c)
    else:
        t1 = x
    return fused_temporal_reference(t1, lns, lnb, wq, wk, wv, wo, bo,
                                    heads=heads, scale=scale,
                                    residual=residual)


def fused_temporal_self_attention(x: jax.Array, wq: jax.Array, wk: jax.Array,
                                  wv: jax.Array, wo: jax.Array, bo: jax.Array,
                                  heads: int, scale: float,
                                  lns=None, lnb=None, residual: bool = False,
                                  ffin_params=None,
                                  block_r: int = 0, group: int = 0,
                                  interpret: bool = False) -> jax.Array:
    """Differentiable wrapper: Pallas forward, reference-XLA backward.
    ``group`` (rows per grouped-attention dot) defaults to GROUP; the
    TVI_TEMPORAL_GROUP env A/B knob is resolved HERE at call time and
    passed as a static argument (never read inside the jitted fn)."""
    import os

    from tvi.ops.diffable import pallas_with_reference_vjp

    if not group:
        group = int(os.environ.get("TVI_TEMPORAL_GROUP") or 0) or GROUP
    # flat-F path (TVI_TEMPORAL_FLAT=1, opt-in): removes the 28% frame-pad
    # M-traffic at F=25 and WINS the standalone unet_fwd A/B (-51 ms) but
    # LOSES the full denoise-pipeline bench (+75 ms/step: 1.863 vs 1.787)
    # — the larger whole-pixel blocks crowd the bigger program's schedule.
    # The decision-grade metric is the pipeline (PERF.md in-context rule).
    flat_env = os.environ.get("TVI_TEMPORAL_FLAT", "")
    f = x.shape[1]
    use_flat = flat_env == "1"
    # in-kernel frame padding (default): HBM blocks stream only the real F
    # frames; =0 restores XLA-side padding for A/B.  Resolved HERE at call
    # time and passed as a static arg (never read inside the jitted fn).
    ik_pad = os.environ.get("TVI_TEMPORAL_INKERNEL_PAD", "1") != "0"
    if use_flat and x.shape[0] >= _pick_flat_pixels(f, x.shape[2],
                                                    wo.shape[-1]):
        fused = functools.partial(_flat_temporal_fwd, heads=heads,
                                  scale=scale, residual=residual,
                                  interpret=interpret)
    else:
        fused = functools.partial(_fused_temporal_fwd, heads=heads,
                                  scale=scale, residual=residual,
                                  block_r=block_r, group=group,
                                  inkernel_pad=ik_pad,
                                  interpret=interpret)
    if ffin_params is not None:
        # ff_in prologue variant (flat or padded follows the same dispatch
        # as above; ineligible shapes fall back to a separate whole-FF
        # kernel at the caller)
        if use_flat and x.shape[0] >= _pick_flat_pixels(f, x.shape[2],
                                                        wo.shape[-1]):
            fused_base = functools.partial(_flat_temporal_fwd, heads=heads,
                                           scale=scale, residual=residual,
                                           interpret=interpret)
        else:
            fused_base = functools.partial(_fused_temporal_fwd, heads=heads,
                                           scale=scale, residual=residual,
                                           block_r=block_r, group=group,
                                           inkernel_pad=ik_pad,
                                           interpret=interpret)
        fused_ff = fused_base
        ref_ff = functools.partial(temporal_block_reference, heads=heads,
                                   scale=scale, residual=residual)
        fls, flb, fw1, fb1, fw2, fb2 = ffin_params
        return pallas_with_reference_vjp(
            lambda x_, fls_, flb_, lns_, lnb_, wq_, wk_, wv_, wo_, bo_,
            fw1_, fb1_, fw2_, fb2_: fused_ff(
                x_, lns_, lnb_, wq_, wk_, wv_, wo_, bo_,
                ffin=(fls_, flb_, fw1_, fb1_, fw2_, fb2_)),
            ref_ff, x, fls, flb, lns, lnb, wq, wk, wv, wo, bo,
            fw1, fb1, fw2, fb2)
    ref = functools.partial(fused_temporal_reference, heads=heads,
                            scale=scale, residual=residual)
    return pallas_with_reference_vjp(fused, ref, x, lns, lnb, wq, wk, wv,
                                     wo, bo)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "residual",
                                             "interpret"))
def _flat_temporal_fwd(x: jax.Array, lns, lnb, wq: jax.Array, wk: jax.Array,
                       wv: jax.Array, wo: jax.Array, bo: jax.Array,
                       heads: int, scale: float, residual: bool = False,
                       ffin=None,
                       interpret: bool = False) -> jax.Array:
    """Flat-F dispatch: x (R, F, C) -> (R*F, C) with whole-pixel blocks
    (see _flat_kernel).  R is zero-padded to the per-program pixel count;
    padded pixels produce finite garbage sliced off here."""
    r, f, c = x.shape
    c_out = wo.shape[-1]
    with_ln = lns is not None
    with_ffin = ffin is not None
    p = _pick_flat_pixels(f, c, c_out)
    pad_r = (-r) % p
    if pad_r:
        x = jnp.pad(x, ((0, pad_r), (0, 0), (0, 0)))
    rp = x.shape[0]
    bm = f * p
    x2 = x.reshape(rp * f, c)
    grid = (rp // p,)
    w_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    ffin_ops = []
    scratch = []
    ffin_chunk = 0
    if with_ffin:
        fls, flb, fw1, fb1, fw2, fb2 = ffin
        f_inner = fw2.shape[0]
        ffin_ops = [fls.reshape(1, c), flb.reshape(1, c),
                    fw1[:, :f_inner], fw1[:, f_inner:],
                    fb1[:f_inner].reshape(1, f_inner),
                    fb1[f_inner:].reshape(1, f_inner),
                    fw2, fb2.reshape(1, c)]
        scratch = [pltpu.VMEM((bm, c), x.dtype)]
        ffin_chunk = _pick_ffin_chunk(bm, f_inner)
    kernel = functools.partial(_flat_kernel, heads=heads, scale=scale, f=f,
                               with_ln=with_ln, residual=residual,
                               with_ffin=with_ffin, ffin_chunk=ffin_chunk)
    ln_ops = [lns.reshape(1, c), lnb.reshape(1, c)] if with_ln else []
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [w_spec(a.shape) for a in ffin_ops]
        + [w_spec((1, c)) for _ in ln_ops] + [
            w_spec(wq.shape), w_spec(wk.shape), w_spec(wv.shape),
            w_spec(wo.shape), w_spec(bo.reshape(1, c_out).shape),
        ],
        out_specs=pl.BlockSpec((bm, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp * f, c_out), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("arbitrary",) if with_ffin else ("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * f * c * (3 * wq.shape[-1] + c_out)
            + 4 * rp * heads * f * bm * (wq.shape[-1] // heads)
            + (2 * rp * f * c * 3 * ffin[4].shape[0] if with_ffin else 0),
            bytes_accessed=2 * rp * f * (c + c_out) * 2,
            transcendentals=rp * heads * f * bm,
        ),
        interpret=interpret,
    )(x2, *ffin_ops, *ln_ops, wq, wk, wv, wo, bo.reshape(1, c_out))
    return out[:r * f].reshape(r, f, c_out)


def _pick_ffin_chunk(rows: int, ff_inner: int) -> int:
    """Prologue GEGLU row chunk: fp32 h+g temporaries <= ~8 MB."""
    for nch in (1, 2, 4, 8, 16, 32):
        if rows % nch == 0 and (rows // nch) * ff_inner * 8 <= 8 * 1024 * 1024:
            return rows // nch
    return 0


@functools.partial(jax.jit, static_argnames=("heads", "scale", "residual",
                                             "block_r", "group",
                                             "inkernel_pad", "interpret"))
def _fused_temporal_fwd(x: jax.Array, lns, lnb, wq: jax.Array, wk: jax.Array,
                        wv: jax.Array, wo: jax.Array, bo: jax.Array,
                        heads: int, scale: float, residual: bool = False,
                        block_r: int = 0, group: int = GROUP,
                        ffin=None, inkernel_pad: bool = True,
                        interpret: bool = False) -> jax.Array:
    """x: (R, F, C); wq/wk/wv: (C, inner); wo: (inner, C_out); bo: (C_out,).
    Returns to_out(attention([LN]([ff_in](x))@Wq, ...)) [+ ff_in(x)] of
    shape (R, F, C_out).  Rows are zero-padded to tile; with
    ``inkernel_pad`` (default) the 16-sublane frame padding happens INSIDE
    the kernel — the HBM blocks stream only the real F frames (28% less
    x/out traffic at F=25) and the XLA pad + slice copy passes disappear;
    TVI_TEMPORAL_INKERNEL_PAD=0 restores the XLA-side padding for A/B.
    ``ffin``: (fls, flb, w1, b1, w2, b2) GEGLU prologue params."""
    r, f, c = x.shape
    c_out = wo.shape[-1]
    with_ln = lns is not None
    with_ffin = ffin is not None
    if not block_r:
        block_r = _pick_block_r(f, c, c_out, group, ffin=with_ffin)
    while block_r % group:
        group //= 2
    fp = _pad_f(f)
    f_io = f if inkernel_pad else fp          # frames in the HBM blocks
    pad_r = (-r) % block_r
    if pad_r or fp != f_io:
        x = jnp.pad(x, ((0, pad_r), (0, f_io - f), (0, 0)))
    rp = x.shape[0]
    grid = (rp // block_r,)
    d = wq.shape[-1] // heads

    w_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    ffin_ops = []
    scratch = []
    ffin_chunk = 0
    if with_ffin:
        fls, flb, fw1, fb1, fw2, fb2 = ffin
        f_inner = fw2.shape[0]
        ffin_ops = [fls.reshape(1, c), flb.reshape(1, c),
                    fw1[:, :f_inner], fw1[:, f_inner:],
                    fb1[:f_inner].reshape(1, f_inner),
                    fb1[f_inner:].reshape(1, f_inner),
                    fw2, fb2.reshape(1, c)]
        scratch = [pltpu.VMEM((block_r * fp, c), x.dtype)]
        ffin_chunk = _pick_ffin_chunk(block_r * fp, f_inner)
    kernel = functools.partial(_fused_kernel, heads=heads, scale=scale,
                               f_valid=f, group=group, with_ln=with_ln,
                               residual=residual, with_ffin=with_ffin,
                               ffin_chunk=ffin_chunk, fp_pad=fp)
    ln_ops = [lns.reshape(1, c), lnb.reshape(1, c)] if with_ln else []
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, f_io, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [w_spec(a.shape) for a in ffin_ops]
        + [w_spec((1, c)) for _ in ln_ops] + [
            w_spec(wq.shape), w_spec(wk.shape), w_spec(wv.shape),
            w_spec(wo.shape), w_spec(bo.shape),
        ],
        out_specs=pl.BlockSpec((block_r, f_io, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, f_io, c_out), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("arbitrary",) if with_ffin else ("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * fp * c * (3 * wq.shape[-1] + c_out)
            + 4 * rp * heads * fp * (group * fp) * d
            + (2 * rp * fp * c * 3 * (ffin[4].shape[0]) if with_ffin else 0),
            bytes_accessed=2 * rp * f_io * (c + c_out) * 2,
            transcendentals=rp * heads * fp * (group * fp),
        ),
        interpret=interpret,
    )(x, *ffin_ops, *ln_ops, wq, wk, wv, wo, bo)
    return out[:r] if f_io == f else out[:r, :f]


def fused_temporal_ffin_eligible(r: int, f: int, c: int, inner: int,
                                 c_out: int, qkv_bias: bool,
                                 ff_inner: int) -> bool:
    """ff_in-prologue variant: base eligibility + GEGLU weights <= 20 MB +
    the chunked prologue fits next to the t1 scratch."""
    if not fused_temporal_eligible(r, f, c, inner, c_out, qkv_bias):
        return False
    if (c * 2 * ff_inner + ff_inner * c) * 2 > 20 * 1024 * 1024:
        return False
    block_r = _pick_block_r(f, c, c_out, ffin=True)
    return (block_r >= 64
            and _pick_ffin_chunk(block_r * _pad_f(f), ff_inner) > 0
            and _vmem_bytes(block_r, f, c, c_out,
                            ffin=True) < 72 * 1024 * 1024)


def fused_temporal_eligible(r: int, f: int, c: int, inner: int, c_out: int,
                            qkv_bias: bool) -> bool:
    """Frame-axis self-attention shapes only: tiny F, 64-aligned heads,
    enough rows to tile, VMEM fit."""
    if qkv_bias or f > 64 or inner % 64 != 0 or r < 256:
        return False
    if c % 64 != 0 or c_out % 64 != 0:
        return False
    block_r = _pick_block_r(f, c, c_out)
    return (block_r >= 64
            and _vmem_bytes(block_r, f, c, c_out) < 72 * 1024 * 1024)


def temporal_block_4d_reference(x4, emb4, fls, flb, lns, lnb, wq, wk, wv,
                                wo, bo, fw1=None, fb1=None, fw2=None,
                                fb2=None, heads: int = 1, scale: float = 1.0,
                                residual: bool = True) -> jax.Array:
    """Materialize the spatial->temporal relayout + frame-pos embedding,
    then the ff_in -> LN -> frame-attention -> residual chain — backward
    path + parity oracle for the 4D kernel.  x4: (B, F, S, C);
    emb4: (B, F, 1, C).  Returns temporal layout (B*S, F, C_out)."""
    b, f, s, c = x4.shape
    mix = x4 + emb4
    mix = jnp.swapaxes(mix, 1, 2).reshape(b * s, f, c)
    return temporal_block_reference(mix, fls, flb, lns, lnb, wq, wk, wv,
                                    wo, bo, fw1, fb1, fw2, fb2, heads=heads,
                                    scale=scale, residual=residual)


def fused_temporal_4d_eligible(b: int, f: int, s: int, c: int, inner: int,
                               c_out: int, qkv_bias: bool,
                               ff_inner: int = 0) -> bool:
    """4D (untransposed-input) variant: S must tile into whole-pixel
    blocks; base/ffin eligibility on the equivalent (B*S, F, C) shape."""
    if not any(s % br == 0 for br in (512, 256, 128, 64)):
        return False
    if ff_inner:
        return fused_temporal_ffin_eligible(b * s, f, c, inner, c_out,
                                            qkv_bias, ff_inner)
    return fused_temporal_eligible(b * s, f, c, inner, c_out, qkv_bias)


def fused_temporal_self_attention_4d(x4: jax.Array, emb4: jax.Array,
                                     wq: jax.Array, wk: jax.Array,
                                     wv: jax.Array, wo: jax.Array,
                                     bo: jax.Array, heads: int, scale: float,
                                     lns=None, lnb=None,
                                     residual: bool = True, ffin_params=None,
                                     interpret: bool = False) -> jax.Array:
    """Differentiable wrapper for the 4D variant (opt-in TVI_TEMPORAL_4D=1
    at the dispatch site): consumes the UNTRANSPOSED (B, F, S, C) hidden +
    (B, F, 1, C) frame-pos embedding; emb-add and the spatial->temporal
    relayout happen inside the kernel.  Output is temporal layout
    (B*S, F, C_out) like fused_temporal_self_attention."""
    from tvi.ops.diffable import pallas_with_reference_vjp

    ref = functools.partial(temporal_block_4d_reference, heads=heads,
                            scale=scale, residual=residual)
    fused = functools.partial(_fused_temporal_4d_fwd, heads=heads,
                              scale=scale, residual=residual,
                              interpret=interpret)
    fp = ffin_params if ffin_params is not None else (None,) * 6
    fls, flb, fw1, fb1, fw2, fb2 = fp
    return pallas_with_reference_vjp(fused, ref, x4, emb4, fls, flb, lns,
                                     lnb, wq, wk, wv, wo, bo, fw1, fb1,
                                     fw2, fb2)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "residual",
                                             "interpret"))
def _fused_temporal_4d_fwd(x4, emb4, fls, flb, lns, lnb, wq, wk, wv, wo, bo,
                           fw1=None, fb1=None, fw2=None, fb2=None,
                           heads: int = 1, scale: float = 1.0,
                           residual: bool = True,
                           interpret: bool = False) -> jax.Array:
    b, f, s, c = x4.shape
    c_out = wo.shape[-1]
    with_ln = lns is not None
    with_ffin = fw1 is not None
    # block_r must both tile S exactly and FIT: unlike the 3D kernel this
    # variant additionally holds the untransposed (1, f, block_r, c) input
    # block and its in-VMEM transpose — the round-4 chip run OOM'd at
    # block_r=512 (153 M > 128 M) because the pick ignored VMEM entirely.
    extra = lambda br: 2 * br * f * c * 2   # 4D input block + transposed copy
    block_r = next(
        (br for br in (512, 256, 128, 64)
         if s % br == 0
         and _vmem_bytes(br, f, c, c_out, 1, ffin=with_ffin) + extra(br)
         < 72 * 1024 * 1024),
        64 if s % 64 == 0 else s)
    fp = _pad_f(f)
    grid = (b, s // block_r)
    d = wq.shape[-1] // heads
    w_spec = lambda shape: pl.BlockSpec(shape, lambda bi, si: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    ffin_ops = []
    scratch = []
    ffin_chunk = 0
    if with_ffin:
        f_inner = fw2.shape[0]
        ffin_ops = [fls.reshape(1, c), flb.reshape(1, c),
                    fw1[:, :f_inner], fw1[:, f_inner:],
                    fb1[:f_inner].reshape(1, f_inner),
                    fb1[f_inner:].reshape(1, f_inner),
                    fw2, fb2.reshape(1, c)]
        scratch = [pltpu.VMEM((block_r * fp, c), x4.dtype)]
        ffin_chunk = _pick_ffin_chunk(block_r * fp, f_inner)
    ln_ops = [lns.reshape(1, c), lnb.reshape(1, c)] if with_ln else []
    kernel = functools.partial(_fused_kernel, heads=heads, scale=scale,
                               f_valid=f, group=1, with_ln=with_ln,
                               residual=residual, with_ffin=with_ffin,
                               ffin_chunk=ffin_chunk, fp_pad=fp, in_4d=True)
    n_sb = s // block_r
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f, block_r, c), lambda bi, si: (bi, 0, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, 1, c), lambda bi, si: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [w_spec(a.shape) for a in ffin_ops]
        + [w_spec((1, c)) for _ in ln_ops] + [
            w_spec(wq.shape), w_spec(wk.shape), w_spec(wv.shape),
            w_spec(wo.shape), w_spec(bo.shape),
        ],
        out_specs=pl.BlockSpec(
            (block_r, f, c_out),
            lambda bi, si: (bi * n_sb + si, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * s, f, c_out), x4.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
            dimension_semantics=("arbitrary", "arbitrary") if with_ffin
            else ("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * fp * c * (3 * wq.shape[-1] + c_out)
            + 4 * b * s * heads * fp * fp * d
            + (2 * b * s * fp * c * 3 * fw2.shape[0] if with_ffin else 0),
            bytes_accessed=2 * b * s * f * (c + c_out) * 2,
            transcendentals=b * s * heads * fp * fp,
        ),
        interpret=interpret,
    )(x4, emb4, *ffin_ops, *ln_ops, wq, wk, wv, wo, bo)
    return out
