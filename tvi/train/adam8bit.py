"""Blockwise 8-bit-state AdamW — the TPU-native counterpart of the
reference's ``--use_8bit_adam`` (bitsandbytes AdamW8bit, src/train.py:392-397).

bitsandbytes is CUDA-only; this reimplements the idea as a pure optax
``GradientTransformation``: both Adam moments live as int8 tensors with
per-block fp32 absmax scales (block = 256 elements over the flattened
tensor, linear symmetric quantization — bitsandbytes' dynamic-tree
quantile map is approximated by small blocks, which bound the
quantization error to each block's local dynamic range).

Memory per parameter: 2 bytes of moment state + 8/BLOCK bytes of scales
(~2.03 B) vs 8 B for fp32 Adam — the difference is what lets the whole-
ControlNet trainer (0.68B params) fit one 16 GB chip at the reference
512x320x14f geometry (fp32 moments need 18.6 GB total; see PERF.md
round-5 config-5 entry).

The quantize/dequantize math runs inside the jitted train step; XLA fuses
it into the update elementwise chain, so the cost is bandwidth only (and
moment state traffic *drops* 4x).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


class _Q(NamedTuple):
    q: jax.Array       # int8, padded flat (nb*BLOCK,)
    scale: jax.Array   # fp32 (nb,) per-block absmax


def _quantize(x_flat_pad: jax.Array) -> _Q:
    b = x_flat_pad.reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(b), axis=1)
    denom = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(b / denom[:, None] * 127.0), -127, 127)
    return _Q(q.astype(jnp.int8).reshape(-1), scale.astype(jnp.float32))


def _dequantize(s: _Q) -> jax.Array:
    b = s.q.reshape(-1, BLOCK).astype(jnp.float32)
    return (b * (s.scale[:, None] / 127.0)).reshape(-1)


def _flat_pad(x: jax.Array) -> jax.Array:
    f = x.reshape(-1).astype(jnp.float32)
    pad = (-f.shape[0]) % BLOCK
    return jnp.pad(f, (0, pad)) if pad else f


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array
    mu: object          # pytree of _Q
    nu: object


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8) -> optax.GradientTransformation:
    """optax.scale_by_adam with int8 blockwise moment storage."""

    def init_fn(params):
        def zq(p):
            n = -(-p.size // BLOCK)
            return _Q(jnp.zeros((n * BLOCK,), jnp.int8),
                      jnp.zeros((n,), jnp.float32))

        return ScaleByAdam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(zq, params),
            nu=jax.tree.map(zq, params),
        )

    def update_fn(updates, state, params=None):  # noqa: ARG001
        count = optax.safe_increment(state.count)

        def upd(g, mq, nq):
            gf = _flat_pad(g)
            m = b1 * _dequantize(mq) + (1 - b1) * gf
            # nu is stored as sqrt(v): v spans the square of the gradient
            # dynamic range, and linear int8 within a block floors small
            # entries to 0 (divergent mhat/eps steps — observed).  sqrt
            # halves the log-range, so the per-block representable ratio
            # is 127^2 in v terms.
            n = b2 * _dequantize(nq) ** 2 + (1 - b2) * gf * gf
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            nhat = n / (1 - b2 ** count.astype(jnp.float32))
            step = (mhat / (jnp.sqrt(nhat) + eps))[:g.size].reshape(g.shape)
            return step.astype(g.dtype), _quantize(m), _quantize(jnp.sqrt(n))

        flat_u, tdef = jax.tree.flatten(updates)
        flat_m = tdef.flatten_up_to(state.mu)
        flat_n = tdef.flatten_up_to(state.nu)
        out = [upd(g, mq, nq) for g, mq, nq in zip(flat_u, flat_m, flat_n)]
        new_updates = tdef.unflatten([o[0] for o in out])
        new_mu = tdef.unflatten([o[1] for o in out])
        new_nu = tdef.unflatten([o[2] for o in out])
        return new_updates, ScaleByAdam8bitState(count, new_mu, new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


class ScaleByAdam8bitFlatState(NamedTuple):
    count: jax.Array
    mu: _Q              # ONE flat _Q over the concatenation of all leaves
    nu: _Q


def scale_by_adam_8bit_flat(b1: float = 0.9, b2: float = 0.999,
                            eps: float = 1e-8) -> optax.GradientTransformation:
    """scale_by_adam_8bit with the moments of ALL leaves stored in ONE
    flat int8 buffer.

    The per-leaf variant emits a handful of kernels per tensor; over the
    ~700-tensor ControlNet tree that is thousands of tiny kernel launches
    per step and measured 28 s/step at 0.68B params (PERF.md r5 config-5).
    Here the update runs as a few BIG elementwise kernels over one
    contiguous buffer: leaves are flattened once per step (XLA concatenate),
    updated, and the per-leaf steps sliced back out."""

    def _layout(params):
        leaves = jax.tree.leaves(params)
        sizes = [p.size for p in leaves]
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        total = offs[-1]
        pad = (-total) % BLOCK
        return sizes, offs, total, pad

    def init_fn(params):
        _, _, total, pad = _layout(params)
        n = (total + pad) // BLOCK

        def zq():
            # distinct buffers for mu and nu: sharing one zeros array
            # donates the same buffer twice in the donated train step
            return _Q(jnp.zeros((n * BLOCK,), jnp.int8),
                      jnp.zeros((n,), jnp.float32))

        return ScaleByAdam8bitFlatState(jnp.zeros((), jnp.int32), zq(), zq())

    def update_fn(updates, state, params=None):  # noqa: ARG001
        count = optax.safe_increment(state.count)
        leaves, tdef = jax.tree.flatten(updates)
        sizes, offs, total, pad = _layout(updates)
        gf = jnp.concatenate(
            [g.reshape(-1).astype(jnp.float32) for g in leaves])
        if pad:
            gf = jnp.pad(gf, (0, pad))
        m = b1 * _dequantize(state.mu) + (1 - b1) * gf
        n = b2 * _dequantize(state.nu) ** 2 + (1 - b2) * gf * gf
        mhat = m / (1 - b1 ** count.astype(jnp.float32))
        nhat = n / (1 - b2 ** count.astype(jnp.float32))
        step = mhat / (jnp.sqrt(nhat) + eps)
        outs = [
            jax.lax.dynamic_slice_in_dim(step, o, s).reshape(g.shape)
            .astype(g.dtype)
            for g, o, s in zip(leaves, offs, sizes)
        ]
        return tdef.unflatten(outs), ScaleByAdam8bitFlatState(
            count, _quantize(m), _quantize(jnp.sqrt(n)))

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 1e-2,
               flat: bool = True) -> optax.GradientTransformation:
    """AdamW with 8-bit moment state (reference AdamW8bit semantics).

    ``flat=True`` (default) stores all moments in one contiguous buffer —
    same math as the per-leaf variant (identical update values; only the
    storage layout differs), minus the thousands-of-tiny-kernels launch
    tax measured at 0.68B params."""
    scaler = (scale_by_adam_8bit_flat(b1=b1, b2=b2, eps=eps) if flat
              else scale_by_adam_8bit(b1=b1, b2=b2, eps=eps))
    return optax.chain(
        scaler,
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
