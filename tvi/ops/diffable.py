"""Reference-backward VJPs for the Pallas forward kernels.

The fused Pallas kernels (flash attention, fused temporal/cross sublayers,
whole-FF, GEGLU) are forward-only Mosaic programs — reverse-mode autodiff
cannot linearize through a ``pallas_call``.  Training (src/train.py-style
loops rebuilt in tvi/train/trainer.py) differentiates the same UNet the
serving path runs, so every kernel dispatch site would either have to be
disabled under ``jax.grad`` or made differentiable.

This module makes them differentiable the TPU-idiomatic way: a
``jax.custom_vjp`` whose

  - primal/forward runs the Pallas kernel (fast path, unchanged), and
  - backward REPLAYS a pure-XLA reference implementation of the same math
    and pulls its VJP (rematerialization — nothing extra is saved from the
    forward; the residuals are just the operands).

The reference implementations live next to each kernel and are asserted
against the kernels by tests/test_pallas_kernels.py, so the gradients are
gradients of the math the kernel actually computes (up to bf16 rounding of
the kernel's fused epilogues).  This mirrors how hand-written flash
attention backward passes are validated, without maintaining a second
Mosaic kernel per op.

For long-sequence attention the naive reference would materialize the full
(BH, Sq, Sk) fp32 probability tensor inside the backward; ``chunked_sdpa``
bounds that by mapping over query blocks with ``jax.checkpoint`` around
each block (residuals per block = q-block only; probabilities are
recomputed blockwise in the block's own backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pallas_with_reference_vjp(fused_fn, reference_fn, *operands):
    """Run ``fused_fn(*operands)``; differentiate via ``reference_fn``.

    Both callables must accept exactly ``operands`` (statics pre-bound with
    functools.partial) and agree on the math.  Operands may include None
    (empty pytree — its cotangent is None).
    """

    @jax.custom_vjp
    def f(*ops):
        return fused_fn(*ops)

    def fwd(*ops):
        return fused_fn(*ops), ops

    def bwd(ops, g):
        _, vjp = jax.vjp(reference_fn, *ops)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f(*operands)


def sdpa_bh_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                      scale: float) -> jax.Array:
    """Plain softmax attention on the flash kernels' (BH, S, D) layout —
    fp32 logits/softmax, bf16 PV, matching _flash_kernel up to rounding."""
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def chunked_sdpa_bh_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                              scale: float, block_q: int = 0) -> jax.Array:
    """(BH, S, D) attention mapped over query blocks, each block wrapped in
    ``jax.checkpoint``: the VJP's live set stays one block's probabilities
    (vs the full Sq x Sk tensor), which is what keeps the full-size train
    step's attention backward inside 16 GB.

    TVI_VJP_BLOCK_Q tunes the block (trace-time read, same semantics as
    TVI_ABLATE: set it before the train step is traced; probe/A-B knob,
    never flipped mid-process).  0 = skip chunking (full reference bwd)."""
    import os

    if not block_q:
        block_q = int(os.environ.get("TVI_VJP_BLOCK_Q", "512"))
    bh, sq, d = q.shape
    if not block_q or sq % block_q or sq == block_q:
        return sdpa_bh_reference(q, k, v, scale)

    @jax.checkpoint
    def att_block(qc, k, v):
        return sdpa_bh_reference(qc, k, v, scale)

    qb = jnp.moveaxis(q.reshape(bh, sq // block_q, block_q, d), 1, 0)
    out = jax.lax.map(lambda qc: att_block(qc, k, v), qb)
    return jnp.moveaxis(out, 0, 1).reshape(bh, sq, d)


def _row_chunks(m: int, target: int = 0) -> int:
    """Largest row-block <= ~target that divides m (>=1024, else 0).
    TVI_VJP_FF_TARGET tunes the target (trace-time probe knob, like
    TVI_VJP_BLOCK_Q); 0 disables FF-backward chunking entirely."""
    import os

    if not target:
        # default 32768 since r5: interleaved same-container A/B at the
        # full 512x320x14f batch-2 train geometry read 2.58 s/step vs the
        # 2.71-2.77 baseline band (-5.8%) at 14.99 GB of 15.75 (PERF.md
        # round-5 remat/VJP ladder); 16384 was the pre-ladder default.
        target = int(os.environ.get("TVI_VJP_FF_TARGET", "32768"))
    if not target:
        return 0
    nb = -(-m // target)
    while m % nb:
        nb += 1
    block = m // nb
    return block if block >= 1024 else 0


def chunked_ff_reference(x: jax.Array, ln_scale, ln_bias, w1, b1, w2, b2,
                         eps: float = 1e-5, residual: bool = True) -> jax.Array:
    """fused_ff_reference mapped over row blocks under ``jax.checkpoint``:
    the FF backward's live set drops from the full (M, 2*inner) fp32 GEGLU
    intermediates (~2 GB at the train geometry) to one block's — weight
    cotangents accumulate across the lax.map scan."""
    from tvi.ops.pallas_fused_ff import fused_ff_reference

    m, c = x.shape
    block_m = _row_chunks(m)
    if not block_m or block_m == m:
        return fused_ff_reference(x, ln_scale, ln_bias, w1, b1, w2, b2,
                                  eps=eps, residual=residual)

    @jax.checkpoint
    def blk(xc):
        return fused_ff_reference(xc, ln_scale, ln_bias, w1, b1, w2, b2,
                                  eps=eps, residual=residual)

    out = jax.lax.map(blk, x.reshape(m // block_m, block_m, c))
    return out.reshape(m, c)


def chunked_attention_out_reference(q, k, v, x_res, wo, bo, heads: int,
                                    scale: float,
                                    residual: bool = True) -> jax.Array:
    """attention_out_reference with the attention part routed through
    chunked_sdpa_bh_reference: the naive reference materializes the full
    (B, H, S, S) fp32 probabilities in its backward (~3.7 GB at the train
    geometry's level-0 spatial shape); this bounds it to one query block."""
    b, s, inner = q.shape
    d = inner // heads
    to_bh = lambda t: jnp.swapaxes(
        t.reshape(b, t.shape[1], heads, d), 1, 2).reshape(b * heads, -1, d)
    o = chunked_sdpa_bh_reference(to_bh(q), to_bh(k), to_bh(v), scale)
    o = jnp.swapaxes(o.reshape(b, heads, s, d), 1, 2).reshape(b * s, inner)
    out = jnp.dot(o.astype(q.dtype), wo, preferred_element_type=jnp.float32)
    out = (out + bo.astype(jnp.float32)).reshape(b, s, wo.shape[-1])
    if residual:
        out = out + x_res.astype(jnp.float32)
    return out.astype(q.dtype)
