"""Pallas nine-matmul 3x3 conv vs lax.conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.ops.pallas_conv import conv3x3_eligible, conv3x3_pallas


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def _ref(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


@pytest.mark.parametrize("n,h,w,c,co,bh", [
    (2, 16, 32, 8, 12, 0),     # default block
    (1, 24, 16, 4, 4, 8),      # multi-block rows, explicit bh
    (1, 10, 16, 4, 4, 8),      # H not a multiple of the block (pad+slice)
    (2, 8, 48, 6, 10, 0),
])
def test_matches_lax_conv(rng, n, h, w, c, co, bh):
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (n, h, w, c))
    wt = jax.random.normal(k2, (3, 3, c, co)) * 0.2
    b = jax.random.normal(k3, (co,))
    want = _ref(x, wt, b)
    got = conv3x3_pallas(x, wt, b, block_rows=bh, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_silu(rng):
    x = jax.random.normal(rng, (1, 16, 16, 8))
    wt = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 8, 8)) * 0.2
    b = jnp.zeros((8,))
    want = jax.nn.silu(_ref(x, wt, b))
    got = conv3x3_pallas(x, wt, b, apply_silu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_bf16_io(rng):
    x = jax.random.normal(rng, (1, 16, 32, 8), jnp.bfloat16)
    wt = (jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 8, 8))
          * 0.2).astype(jnp.bfloat16)
    b = jnp.zeros((8,), jnp.bfloat16)
    got = conv3x3_pallas(x, wt, b, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _ref(x.astype(jnp.float32), wt.astype(jnp.float32),
                b.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=0.1, rtol=0.1)


def test_eligibility_gates():
    assert conv3x3_eligible((5, 576, 1024, 128), 128)
    assert conv3x3_eligible((5, 288, 512, 256), 256)
    assert not conv3x3_eligible((5, 72, 128, 512), 512)  # small-W: XLA wins
    assert not conv3x3_eligible((5, 72, 9, 128), 128)    # W % 16
    assert not conv3x3_eligible((2, 4, 256, 8), 8)       # H too small


def test_module_tree_and_fallback_match_nn_conv(rng):
    import flax.linen as nn

    from tvi.models.layers import PallasConv3x3

    x = jax.random.normal(rng, (2, 12, 16, 6))
    m = PallasConv3x3(10)
    v = m.init(jax.random.PRNGKey(1), x)
    assert set(v["params"]) == {"kernel", "bias"}
    assert v["params"]["kernel"].shape == (3, 3, 6, 10)
    want = nn.Conv(10, (3, 3), padding=1).apply(
        {"params": dict(v["params"])}, x)
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(want),
                               atol=1e-6)


class TestConvV3:
    """v3 single-contraction kernel (k9/k3 tap layouts) + fused GN prologue."""

    @pytest.mark.parametrize("taps", ["k9", "k3"])
    @pytest.mark.parametrize("n,h,w,c,co,bh", [
        (1, 16, 32, 8, 16, 8),
        (2, 24, 16, 16, 8, 8),    # ragged H -> padded rows
        (1, 8, 48, 24, 8, 8),
    ])
    def test_matches_lax_conv(self, rng, taps, n, h, w, c, co, bh):
        from tvi.ops.pallas_conv import conv3x3_pallas_v3
        import flax.linen as nn
        ks = jax.random.split(rng, 3)
        x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32)
        wt = jax.random.normal(ks[1], (3, 3, c, co)) * 0.1
        b = jax.random.normal(ks[2], (co,)) * 0.1
        conv = nn.Conv(co, (3, 3), padding=1)
        want = conv.apply({"params": {"kernel": wt, "bias": b}}, x)
        got = conv3x3_pallas_v3(x, wt, b, taps=taps, block_rows=bh,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("taps", ["k9", "k3"])
    def test_gn_silu_prologue(self, rng, taps):
        """conv(silu(gn(x))) fused == unfused reference, incl. correct
        zero-padding semantics (pad AFTER the norm, not before)."""
        from tvi.ops.groupnorm import group_norm_silu
        from tvi.ops.pallas_conv import group_norm_silu_conv3x3
        import flax.linen as nn
        n, h, w, c, co, groups = 2, 16, 32, 16, 8, 4
        ks = jax.random.split(rng, 5)
        x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32) * 2 + 1
        gamma = jax.random.normal(ks[1], (c,)) * 0.3 + 1.0
        beta = jax.random.normal(ks[2], (c,)) * 0.3
        wt = jax.random.normal(ks[3], (3, 3, c, co)) * 0.1
        b = jax.random.normal(ks[4], (co,)) * 0.1
        conv = nn.Conv(co, (3, 3), padding=1)
        want = conv.apply({"params": {"kernel": wt, "bias": b}},
                          group_norm_silu(x, gamma, beta, groups))
        got = group_norm_silu_conv3x3(x, gamma, beta, groups, wt, b,
                                      taps=taps, block_rows=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_bf16_io(self, rng):
        from tvi.ops.pallas_conv import conv3x3_pallas_v3
        import flax.linen as nn
        x = jax.random.normal(rng, (1, 16, 32, 16), jnp.bfloat16)
        wt = jax.random.normal(rng, (3, 3, 16, 16), jnp.bfloat16) * 0.1
        b = jnp.zeros((16,), jnp.bfloat16)
        conv = nn.Conv(16, (3, 3), padding=1, dtype=jnp.bfloat16)
        want = conv.apply({"params": {"kernel": wt, "bias": b}}, x)
        got = conv3x3_pallas_v3(x, wt, b, block_rows=8, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=3e-2, rtol=3e-2)
