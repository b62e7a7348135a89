"""Row-Winograd F(2,3) conv vs lax.conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.ops.pallas_winograd import conv3x3_winograd_row


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
    (1, 7, 16, 4, 4, 8),       # odd H (pad covers the ragged row pair)
    (2, 8, 48, 6, 10, 0),
])
def test_matches_lax_conv(rng, n, h, w, c, co, bh):
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (n, h, w, c))
    wt = jax.random.normal(k2, (3, 3, c, co)) * 0.2
    b = jax.random.normal(k3, (co,))
    want = _ref(x, wt, b)
    got = conv3x3_winograd_row(x, wt, b, block_rows=bh, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_silu(rng):
    x = jax.random.normal(rng, (1, 16, 16, 8))
    wt = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 8, 8)) * 0.2
    b = jnp.zeros((8,))
    want = jax.nn.silu(_ref(x, wt, b))
    got = conv3x3_winograd_row(x, wt, b, apply_silu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_gn_silu_prologue(rng):
    from tvi.ops.groupnorm import group_norm_silu
    from tvi.ops.pallas_winograd import group_norm_silu_winograd_row

    n, h, w, c, co, groups = 2, 12, 32, 8, 12, 4
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    x = jax.random.normal(k1, (n, h, w, c))
    gamma = 1.0 + 0.3 * jax.random.normal(k2, (c,))
    beta = 0.2 * jax.random.normal(k3, (c,))
    wt = jax.random.normal(k4, (3, 3, c, co)) * 0.2
    b = jax.random.normal(k5, (co,))
    want = _ref(group_norm_silu(x, gamma, beta, groups), wt, b)
    got = group_norm_silu_winograd_row(x, gamma, beta, groups, wt, b,
                                       block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


def test_bf16_io(rng):
    x = jax.random.normal(rng, (1, 16, 32, 8), jnp.bfloat16)
    wt = (jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 8, 8))
          * 0.2).astype(jnp.bfloat16)
    b = jnp.zeros((8,), jnp.bfloat16)
    got = conv3x3_winograd_row(x, wt, b, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _ref(x.astype(jnp.float32), wt.astype(jnp.float32),
                b.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=0.1, rtol=0.1)
