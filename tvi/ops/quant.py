"""int8 (W8A8) matmul building blocks for the opt-in quantized serving mode.

Why: PERF.md's FLOP budget puts the headline pipeline's bf16 single-chip
speed-of-light at ~1.18 f/s on v5e (197 TFLOP/s peak); the 3x-A100 target
(1.875 f/s) is above that wall.  The v5e MXU doubles throughput for
int8 x int8 -> int32 (~394 TOPS), so the only single-chip route past bf16
SOL is quantized compute.  This module provides the numerics:

  - symmetric per-row dynamic activation quantization (abs-max over the
    contraction dim, fp32 scale per row),
  - symmetric per-column (per-output-feature) static weight quantization,
  - int8_matmul: int8 x int8 MXU matmul with int32 accumulation, rescaled
    by the outer product of the two scale vectors.

Accuracy contract: W8A8 with per-row/per-col symmetric scales keeps dense
projections within ~1% relative error (standard SmoothQuant-style serving
practice); the pipeline exposes it as an explicit opt-in
(``TVI_SERVE_INT8=1``) and it is NOT used for training or for the headline
benchmark unless requested.

The reference has no quantized path (pure fp16/bf16 torch); this is a
TPU-capability extension, kept separate so bf16 parity paths are untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization over the last (contraction) dim.

    x: (..., K) float -> (int8 (..., K), fp32 scale (..., 1)) with
    x ~= x_i8 * scale.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xi = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xi, scale


def quantize_cols(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-column int8 quantization for a (K, N) weight:
    w ~= w_i8 * scale with scale (1, N) fp32.  Static — do once at load."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wi = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wi, scale


def int8_matmul(x_i8: jax.Array, x_scale: jax.Array,
                w_i8: jax.Array, w_scale: jax.Array,
                out_dtype=jnp.bfloat16) -> jax.Array:
    """(..., K) int8 @ (K, N) int8 -> (..., N) out_dtype.

    The int8 x int8 contraction accumulates in int32 on the MXU; the fp32
    rescale (x_scale * w_scale outer product) fuses into the epilogue.
    """
    acc = jax.lax.dot_general(
        x_i8, w_i8, (((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


def dense_w8a8(x: jax.Array, w_i8: jax.Array, w_scale: jax.Array,
               bias=None, out_dtype=None) -> jax.Array:
    """Drop-in quantized Dense: dynamic per-row activation quant + static
    per-col weights.  x: (..., K); w_i8: (K, N)."""
    out_dtype = out_dtype or x.dtype
    xi, sx = quantize_rows(x)
    y = int8_matmul(xi, sx, w_i8, w_scale, out_dtype=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def quantize_param_tree(params, predicate) -> dict:
    """Walk a flax param tree; for every 'kernel' leaf where
    predicate(path, leaf) is True, replace it with a dict
    {kernel_i8, kernel_scale}.  Standalone load-time pre-quantization
    utility (tested in tests/test_quant.py); NOT wired into the serving
    path — TVI_SERVE_INT8 quantizes weights on the fly inside the traced
    call, and the corrected roofline (PERF.md round 3: int8 96-153 TOPS vs
    149 TF/s bf16 on this chip) removed the motivation to integrate it."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for path, leaf in flat.items():
        if path.endswith("/kernel") and leaf.ndim == 2 and predicate(path, leaf):
            wi, ws = quantize_cols(leaf)
            out[path + "_i8"] = wi
            out[path + "_scale"] = ws
        else:
            out[path] = leaf
    return traverse_util.unflatten_dict(out, sep="/")
