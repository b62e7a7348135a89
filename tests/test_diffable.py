"""Gradients through the Pallas kernels (tvi/ops/diffable.py).

Training (reference src/train.py / train_svd.py loops rebuilt in
tvi/train/trainer.py) differentiates the same UNet the serving path runs,
so every fused-kernel dispatch site must be differentiable.  Each kernel's
public wrapper runs the Pallas forward and pulls the backward from a
pure-XLA reference of the same math (jax.custom_vjp).  These tests check,
in interpret mode on CPU:

  - the wrapped forward still matches the reference (kernel parity is
    covered more deeply in test_pallas_kernels.py), and
  - jax.grad through the wrapper equals jax.grad through the reference,
    including None LN operands (empty-pytree cotangents) and the
    query-block-chunked attention backward.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_enable_x64", False)


def _rand(key, *shape):
    return jax.random.normal(key, shape, dtype=jnp.float32) * 0.3


def _grad_check(wrapped, reference, operands, atol=2e-3, rtol=2e-3):
    """sum-loss gradient of the wrapper vs the pure reference."""
    out_w = wrapped(*operands)
    out_r = reference(*operands)
    np.testing.assert_allclose(out_w, out_r, atol=atol, rtol=rtol)

    def loss(fn):
        def f(*ops):
            return jnp.sum(jnp.square(fn(*ops).astype(jnp.float32)))
        return f

    argnums = tuple(i for i, o in enumerate(operands) if o is not None)
    gw = jax.grad(loss(wrapped), argnums=argnums)(*operands)
    gr = jax.grad(loss(reference), argnums=argnums)(*operands)
    for a, b in zip(gw, gr):
        assert jnp.all(jnp.isfinite(a))
        np.testing.assert_allclose(a, b, atol=atol, rtol=rtol)


def test_flash_self_attention_grad():
    from tvi.ops.diffable import chunked_sdpa_bh_reference
    from tvi.ops.pallas_attention import flash_self_attention

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = _rand(k0, 2, 128, 64), _rand(k1, 2, 128, 64), _rand(k2, 2, 128, 64)
    wrapped = functools.partial(flash_self_attention, scale=0.125,
                                interpret=True, shift="row")
    ref = functools.partial(chunked_sdpa_bh_reference, scale=0.125)
    _grad_check(wrapped, ref, (q, k, v))


def test_flash_streamed_grad():
    from tvi.ops.diffable import chunked_sdpa_bh_reference
    from tvi.ops.pallas_attention import flash_self_attention_streamed

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = _rand(k0, 1, 256, 64), _rand(k1, 1, 256, 64), _rand(k2, 1, 256, 64)
    wrapped = functools.partial(flash_self_attention_streamed, scale=0.125,
                                block_q=128, block_k=128, interpret=True)
    ref = functools.partial(chunked_sdpa_bh_reference, scale=0.125)
    _grad_check(wrapped, ref, (q, k, v))


def test_chunked_sdpa_matches_plain():
    """The chunked (jax.checkpoint per q-block) backward must equal the
    unchunked softmax-attention backward."""
    from tvi.ops.diffable import chunked_sdpa_bh_reference, sdpa_bh_reference

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = _rand(k0, 2, 1024, 32), _rand(k1, 2, 1024, 32), _rand(k2, 2, 1024, 32)
    chunked = functools.partial(chunked_sdpa_bh_reference, scale=0.2,
                                block_q=256)
    plain = functools.partial(sdpa_bh_reference, scale=0.2)
    _grad_check(chunked, plain, (q, k, v), atol=1e-4, rtol=1e-4)


def test_temporal_rows_grad():
    from tvi.ops.pallas_temporal_attention import (
        temporal_rows_attention,
        temporal_rows_reference,
    )

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (_rand(k0, 16, 8, 2, 64), _rand(k1, 16, 8, 2, 64),
               _rand(k2, 16, 8, 2, 64))
    wrapped = functools.partial(temporal_rows_attention, scale=0.125,
                                block_r=8, interpret=True)
    ref = functools.partial(temporal_rows_reference, scale=0.125)
    _grad_check(wrapped, ref, (q, k, v))


def test_fused_temporal_grad():
    from tvi.ops.pallas_fused_temporal import (
        fused_temporal_reference,
        fused_temporal_self_attention,
    )

    keys = jax.random.split(jax.random.PRNGKey(4), 6)
    c, inner = 64, 128
    x = _rand(keys[0], 16, 8, c)
    wq, wk, wv = (_rand(keys[1], c, inner), _rand(keys[2], c, inner),
                  _rand(keys[3], c, inner))
    wo, bo = _rand(keys[4], inner, c), _rand(keys[5], c)
    wrapped = functools.partial(fused_temporal_self_attention, heads=2,
                                scale=0.125, block_r=8, interpret=True)
    ref = lambda x, wq, wk, wv, wo, bo: fused_temporal_reference(
        x, None, None, wq, wk, wv, wo, bo, heads=2, scale=0.125)
    _grad_check(wrapped, ref, (x, wq, wk, wv, wo, bo))


def test_geglu_grad():
    from tvi.ops.pallas_geglu import geglu_project, geglu_reference

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(5), 3)
    x, w, b = _rand(k0, 256, 64), _rand(k1, 64, 256), _rand(k2, 256)
    wrapped = functools.partial(geglu_project, interpret=True, bm=128)
    _grad_check(wrapped, geglu_reference, (x, w, b))


@pytest.mark.parametrize("with_ln,residual", [(True, True), (False, False)])
def test_fused_ff_grad(with_ln, residual):
    from tvi.ops.pallas_fused_ff import fused_feedforward, fused_ff_reference

    keys = jax.random.split(jax.random.PRNGKey(6), 7)
    c, inner = 64, 128
    x = _rand(keys[0], 256, c)
    lns = (jnp.ones((c,)) + 0.1 * _rand(keys[1], c)) if with_ln else None
    lnb = 0.1 * _rand(keys[2], c) if with_ln else None
    w1, b1 = _rand(keys[3], c, 2 * inner), _rand(keys[4], 2 * inner)
    w2, b2 = _rand(keys[5], inner, c), _rand(keys[6], c)
    wrapped = functools.partial(fused_feedforward, residual=residual,
                                bm=128, interpret=True)
    ref = functools.partial(fused_ff_reference, residual=residual)
    _grad_check(wrapped, ref, (x, lns, lnb, w1, b1, w2, b2))


@pytest.mark.parametrize("with_ln", [True, False])
def test_fused_cross_grad(with_ln):
    from tvi.ops.pallas_fused_cross import (
        fused_cross_attention,
        fused_cross_reference,
    )

    keys = jax.random.split(jax.random.PRNGKey(7), 7)
    c, heads, d, s_ctx, g, rpg = 64, 2, 32, 3, 2, 128
    inner = heads * d
    x = _rand(keys[0], g * rpg, c)
    lns = (jnp.ones((c,)) + 0.1 * _rand(keys[1], c)) if with_ln else None
    lnb = 0.1 * _rand(keys[2], c) if with_ln else None
    wq = _rand(keys[3], c, inner)
    ck, cv = _rand(keys[4], g, heads, s_ctx, d), _rand(keys[5], g, heads, s_ctx, d)
    wo, bo = _rand(keys[6], inner, c), jnp.zeros((c,))
    wrapped = functools.partial(fused_cross_attention, heads=heads,
                                scale=d ** -0.5, rows_per_group=rpg,
                                interpret=True)
    ref = functools.partial(fused_cross_reference, heads=heads,
                            scale=d ** -0.5, rows_per_group=rpg)
    _grad_check(wrapped, ref, (x, lns, lnb, wq, ck, cv, wo, bo))
