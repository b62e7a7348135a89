"""Streaming Pallas GroupNorm(+SiLU) parity vs the XLA formulation
(interpret mode on CPU is exact)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tvi.ops.groupnorm import group_norm_silu
from tvi.ops.pallas_groupnorm import (
    pallas_gn_eligible,
    pallas_group_norm_silu,
)


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 16, 128), 32),   # VAE decoder head geometry (group size 4)
    ((3, 4, 8, 8, 128), 32),  # 5-D temporal resnet input (B,F,H,W,C)
    ((2, 48, 128), 16),       # already-flat (N, S, C)
])
@pytest.mark.parametrize("silu", [False, True])
def test_matches_xla_formulation(shape, groups, silu):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 3 + 0.5)
    scale = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))

    want = group_norm_silu(x, scale, bias, groups, apply_silu=silu)
    bs = pallas_gn_eligible(x.shape, groups)
    assert bs > 0
    got = pallas_group_norm_silu(x, scale, bias, groups, apply_silu=silu,
                                 block_rows=bs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_multi_block_accumulation():
    """S spanning several blocks must accumulate stats across the sweep."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 128).astype(np.float32))
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    want = group_norm_silu(x, scale, bias, 32, apply_silu=False)
    got = pallas_group_norm_silu(x, scale, bias, 32, apply_silu=False,
                                 block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_bf16_io_fp32_stats():
    rng = np.random.RandomState(2)
    x32 = rng.randn(2, 32, 128).astype(np.float32) * 5
    x16 = jnp.asarray(x32, jnp.bfloat16)
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    got = pallas_group_norm_silu(x16, scale, bias, 32, apply_silu=False,
                                 interpret=True)
    assert got.dtype == jnp.bfloat16
    want = group_norm_silu(x16, scale, bias, 32, apply_silu=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=0.05)


def test_eligibility_gates():
    assert pallas_gn_eligible((2, 16, 16, 128), 32) > 0
    assert pallas_gn_eligible((2, 16, 16, 320), 32) == 0   # 320 % 128 != 0
    assert pallas_gn_eligible((2, 7, 9, 24), 8) == 0       # lane-ragged
    # block rows must divide S exactly
    bs = pallas_gn_eligible((2, 48, 128), 16)
    assert bs > 0 and 48 % bs == 0
