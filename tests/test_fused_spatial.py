"""Fused LN+QKV+flash spatial sublayer vs the unfused reference path
(interpret mode on CPU is exact)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.models.layers import layer_norm
from tvi.ops.attention import dot_product_attention
from tvi.ops.pallas_fused_spatial import (
    fused_spatial_eligible,
    fused_spatial_self_attention,
)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def _unfused(x, lns, lnb, wq, wk, wv, heads):
    h = layer_norm(x, lns, lnb) if lns is not None else x
    b, s, c = x.shape
    d = wq.shape[-1] // heads
    q = (h @ wq).reshape(b, s, heads, d)
    k = (h @ wk).reshape(b, s, heads, d)
    v = (h @ wv).reshape(b, s, heads, d)
    o = dot_product_attention(q, k, v)              # (b, s, heads, d)
    return jnp.transpose(o, (0, 2, 1, 3))           # head-major (b, h, s, d)


@pytest.mark.parametrize("b,s,c,heads", [
    (2, 1024, 320, 5),    # layer-0-like (lane-ragged C)
    (1, 2048, 128, 2),
])
@pytest.mark.parametrize("with_ln", [True, False])
def test_matches_unfused(rng, b, s, c, heads, with_ln):
    ks = jax.random.split(rng, 6)
    x = jax.random.normal(ks[0], (b, s, c), jnp.float32)
    lns = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0 if with_ln else None
    lnb = jax.random.normal(ks[2], (c,)) * 0.2 if with_ln else None
    wq = jax.random.normal(ks[3], (c, heads * 64)) * c ** -0.5
    wk = jax.random.normal(ks[4], (c, heads * 64)) * c ** -0.5
    wv = jax.random.normal(ks[5], (c, heads * 64)) * c ** -0.5

    want = _unfused(x, lns, lnb, wq, wk, wv, heads)
    got = fused_spatial_self_attention(x, lns, lnb, wq, wk, wv,
                                       heads=heads, scale=64 ** -0.5,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_ragged_seq_padding(rng):
    """S not a multiple of the KV block: padded keys must be masked."""
    b, s, c, heads = 1, 1300, 128, 2
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (b, s, c), jnp.float32)
    wq = jax.random.normal(ks[1], (c, heads * 64)) * c ** -0.5
    wk = jax.random.normal(ks[2], (c, heads * 64)) * c ** -0.5
    wv = jax.random.normal(ks[3], (c, heads * 64)) * c ** -0.5
    want = _unfused(x, None, None, wq, wk, wv, heads)
    got = fused_spatial_self_attention(x, None, None, wq, wk, wv,
                                       heads=heads, scale=64 ** -0.5,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_underflow_guard(rng):
    """Adversarial magnitudes: with guarded=True the in-kernel row-max
    fallback must recover tiles whose bound-shifted exp2 flushed to zero
    (default is guarded=False — the in-kernel cond costs ~450 ms/step on
    TPU even when never taken, PERF.md)."""
    b, s, c, heads = 1, 512, 128, 2
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (b, s, c), jnp.float32) * 40.0
    wq = jax.random.normal(ks[1], (c, heads * 64)) * 3.0
    wk = jax.random.normal(ks[2], (c, heads * 64)) * 3.0
    wv = jax.random.normal(ks[3], (c, heads * 64)) * c ** -0.5
    want = _unfused(x, None, None, wq, wk, wv, heads)
    got = fused_spatial_self_attention(x, None, None, wq, wk, wv,
                                       heads=heads, scale=64 ** -0.5,
                                       guarded=True, interpret=True)
    assert bool(jnp.all(jnp.isfinite(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-3)


def test_attention_module_routes_and_matches(rng):
    """tvi Attention with pre_ln: fused (interpret) vs flax-LN unfused path
    must agree; params tree must keep norm1 outside / to_* inside."""
    from tvi.models.layers import Attention, LayerNormParams
    from tvi.ops import attention as attn_mod
    from tvi.ops import pallas_fused_spatial as pfs

    b, s, c, heads = 1, 256, 128, 2
    x = jax.random.normal(rng, (b, s, c), jnp.float32)

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            lns, lnb = LayerNormParams(features=c, name="norm1")()
            return Attention(heads=heads, dim_head=64, name="attn1")(
                x, pre_ln=(lns, lnb))

    m = Block()
    v = m.init(jax.random.PRNGKey(1), x)
    assert set(v["params"]) == {"norm1", "attn1"}
    assert set(v["params"]["norm1"]) == {"scale", "bias"}

    unfused = m.apply(v, x)   # CPU: flash disabled -> functional LN path

    orig = pfs.fused_spatial_self_attention
    calls = []

    def spy(xx, lns, lnb, *a, **kw):
        calls.append(True)
        kw["interpret"] = True
        return orig(xx, lns, lnb, *a, **kw)

    import os
    os.environ["TVI_FUSED_SPATIAL"] = "1"
    attn_mod.set_flash_attention(True)
    pfs_orig = pfs.fused_spatial_self_attention
    pfs.fused_spatial_self_attention = spy
    # layers.py imports the symbol at call time from the module
    try:
        fused = m.apply(v, x)
    finally:
        pfs.fused_spatial_self_attention = pfs_orig
        attn_mod.set_flash_attention(None)
        os.environ.pop("TVI_FUSED_SPATIAL", None)
    assert calls, "fused spatial path was not taken"
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=2e-4, rtol=2e-4)


def test_guard_engages_on_adversarial_magnitudes(rng):
    """With guarded=True (the default) the in-kernel row-max fallback must
    keep outputs finite at magnitudes where the unguarded bound shift
    underflows (ADVICE r2: the fused path used to silently drop the guard)."""
    b, s, c, heads = 1, 512, 128, 2
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (b, s, c), jnp.float32) * 40.0  # huge LN-free operands
    wq = jax.random.normal(ks[1], (c, heads * 64)) * c ** -0.5 * 8.0
    wk = jax.random.normal(ks[2], (c, heads * 64)) * c ** -0.5 * 8.0
    wv = jax.random.normal(ks[3], (c, heads * 64)) * c ** -0.5

    guarded = fused_spatial_self_attention(x, None, None, wq, wk, wv,
                                           heads=heads, scale=64 ** -0.5,
                                           guarded=True, interpret=True)
    assert bool(jnp.isfinite(guarded).all()), "guarded kernel must stay finite"
    # At these magnitudes the softmax is near-one-hot; tiny logit rounding
    # flips argmax ties on a handful of rows — tolerate those.
    want = _unfused(x, None, None, wq, wk, wv, heads)
    err = np.abs(np.asarray(guarded) - np.asarray(want))
    assert (err < 1e-3).mean() > 0.998
    assert err.max() < 0.5
