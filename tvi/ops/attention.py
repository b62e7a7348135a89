"""Attention ops — XLA path with functional aux statistics.

Replaces two reference mechanisms at once:

1. ``AttnProcessor2_0`` / SDPA (src/models/attention_processor.py:1178) —
   the plain fused attention path.
2. ``register_attention_control`` (src/train_decouples.py:375-516 and
   src/test.py:112-480), which monkey-patches temporal ``Attention.forward``
   to (a) add a linspace temporal bias mask over the 2 conditioning-token
   keys and (b) record per-frame means of the *pre-softmax* similarity to
   the first-image vs end-image key halves.  In JAX both are explicit,
   functional options of this op: pass ``bias`` and set ``want_stats=True``
   and per-frame stats flow back through the call graph — no mutation.

Layout: q (..., Sq, H, D), k/v (..., Sk, H, D) — batch dims leading, heads
folded next to the feature dim so XLA keeps the matmuls MXU-shaped.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Pallas flash path for long self-attention sequences.  Toggled off for the
# CPU test suite (interpret mode is exact but slow); auto-enabled on TPU.
_USE_FLASH = None  # None: decide from backend; True/False: forced


def set_flash_attention(enabled: Optional[bool]):
    global _USE_FLASH
    _USE_FLASH = enabled


def _flash_enabled() -> bool:
    if _USE_FLASH is not None:
        return _USE_FLASH
    return jax.default_backend() not in ("cpu",)


def temporal_4d_enabled() -> bool:
    """Transposed-IO temporal kernels (4D in / out4d): DEFAULT-ON on
    accelerators after the round-4 chip A/B (unet_fwd −17 ms/fwd, chip
    parity gates green — PERF.md r4 session 3/4); kill switch
    TVI_TEMPORAL_4D=0 (sub-knob TVI_TEMPORAL_OUT4D=0 keeps only the
    input-side kernel).  Stays OFF on CPU unless explicitly opted in, so
    the golden/interpret test path is bit-identical even when tests force
    flash on (set_flash_attention(True))."""
    v = os.environ.get("TVI_TEMPORAL_4D")
    if v is not None:
        return v == "1"
    return jax.default_backend() not in ("cpu",)


class AttnStats(NamedTuple):
    """Per-query-frame mean pre-softmax similarity to the first-image vs
    end-image halves of the key sequence.

    Reference: train_decouples.py:466-476 — ``attn_weight`` is the scaled
    (and bias-shifted, if enabled) logits *before* softmax;
    ``first_frame_sim = attn_weight[..., :S/2].mean()`` per frame, likewise
    ``end_frame_sim`` for the second half."""

    first: jax.Array  # (..., Sq)  mean logit vs keys [0, Sk/2)
    end: jax.Array    # (..., Sq)  mean logit vs keys [Sk/2, Sk)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    want_stats: bool = False,
):
    """Multi-head attention.

    Args:
      q: (..., Sq, H, D)
      k, v: (..., Sk, H, D)
      bias: optional additive bias broadcastable to (..., H, Sq, Sk), added
        to the scaled logits before softmax (reference
        train_decouples.py:455-460).
      scale: defaults to 1/sqrt(D)
      want_stats: also return AttnStats (pre-softmax logits averaged over
        heads and key halves, reduced over leading batch dims).

    Returns:
      out (..., Sq, H, D) [, AttnStats]
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5

    if _flash_enabled():
        from tvi.ops.pallas_attention import (
            flash_attention_eligible,
            flash_self_attention,
            flash_self_attention_streamed,
            flash_streamed_eligible,
        )
        from tvi.ops.pallas_temporal_attention import (
            temporal_rows_attention,
            temporal_rows_eligible,
        )

        sq, sk = q.shape[-3], k.shape[-3]
        # temporal frame-axis self-attention: tiny seq, huge row batch —
        # dedicated kernel keeps the per-row logits in VMEM
        if (bias is None and not want_stats and q.ndim == 4
                and sq == sk and sq <= 64
                and temporal_rows_eligible(q.shape[0], sq, d, q.shape[2])):
            return temporal_rows_attention(q, k, v, float(scale))
        resident = flash_attention_eligible(sq, sk, d, bias is not None, want_stats)
        streamed = (not resident and
                    flash_streamed_eligible(sq, sk, d, bias is not None, want_stats))
        if resident or streamed:
            h = q.shape[-2]
            batch = q.shape[:-3]
            def to_bh(x, s):
                x = jnp.swapaxes(x, -2, -3)          # (..., H, S, D)
                return x.reshape((-1, s, d))
            if resident:
                # resolve the TVI_ATTN_SHIFT env knob HERE (call/trace time)
                # and pass it as a static arg: flash_self_attention is a
                # module-level jit, so an env read inside it would be baked
                # into the first trace and silently reused by later calls
                # with a different env (invalidates A/B switching).
                from tvi.ops.pallas_attention import _default_shift
                out = flash_self_attention(to_bh(q, sq), to_bh(k, sk),
                                           to_bh(v, sk), float(scale),
                                           shift=_default_shift())
            else:
                out = flash_self_attention_streamed(
                    to_bh(q, sq), to_bh(k, sk), to_bh(v, sk), float(scale))
            out = out.reshape(batch + (h, sq, d))
            return jnp.swapaxes(out, -2, -3)

    qf = jnp.swapaxes(q, -2, -3)  # (..., H, Sq, D)
    kf = jnp.swapaxes(k, -2, -3)
    vf = jnp.swapaxes(v, -2, -3)

    logits = jnp.einsum(
        "...hqd,...hkd->...hqk", qf * scale, kf,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)

    out = jnp.einsum(
        "...hqk,...hkd->...hqd", probs.astype(vf.dtype), vf,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    out = jnp.swapaxes(out, -2, -3)  # (..., Sq, H, D)

    if not want_stats:
        return out

    sk = k.shape[-3]
    half = sk // 2
    # mean over heads and all leading batch dims -> (Sq,) per-frame scalars,
    # matching the reference's .mean() over (B, H, Sk-half) at :470-471.
    # Guard the 1-token-context case: the reference slices [..., :0].mean()
    # which is NaN (latent bug when the temporal context is the single
    # projector token, train_decouples.py:908-911); we emit zeros for the
    # empty half instead so downstream losses stay finite.
    reduce_axes = tuple(range(logits.ndim - 2)) + (logits.ndim - 1,)
    sq = q.shape[-3]
    first = (logits[..., :half].mean(axis=reduce_axes) if half > 0
             else jnp.zeros((sq,), logits.dtype))
    stats = AttnStats(first=first, end=logits[..., half:].mean(axis=reduce_axes))
    return out, stats


def temporal_bias_mask(num_frames: int, num_keys: int = 2, dtype=jnp.float32) -> jax.Array:
    """The reference's additive temporal cross-attention bias
    (train_decouples.py:440-447): for query frame f with weight
    w = linspace(0,1,F)[f], keys in the first half (the first-image token)
    get bias (1-w) and keys in the second half (the end-image token) get w.
    Returns (F, num_keys), broadcastable to (..., H, Sq=F, Sk=num_keys)."""
    w = jnp.linspace(0.0, 1.0, num_frames, dtype=dtype)
    key_second = (jnp.arange(num_keys) >= num_keys // 2).astype(dtype)
    return (1.0 - w)[:, None] * (1.0 - key_second)[None, :] + w[:, None] * key_second[None, :]
