"""FusedGroupNorm parity vs flax nn.GroupNorm (+SiLU) — the TPU-friendly
per-channel-first formulation must be numerically identical."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.ops.groupnorm import group_norm_silu


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 16, 32), 32),   # standard NHWC, group size 1
    ((2, 16, 16, 128), 32),  # group size 4 (SVD VAE decoder head)
    ((3, 4, 8, 8, 64), 16),  # 5-D temporal resnet input (B,F,H,W,C)
    ((2, 7, 9, 24), 8),      # ragged spatial dims
])
def test_matches_flax_groupnorm(shape, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 3 + 0.5)
    scale = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))

    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)

    got = group_norm_silu(x, scale, bias, groups, eps=1e-5, apply_silu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    got_silu = group_norm_silu(x, scale, bias, groups, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got_silu),
                               np.asarray(nn.silu(want)),
                               atol=1e-5, rtol=1e-5)


def test_bf16_stats_in_fp32():
    rng = np.random.RandomState(1)
    x32 = rng.randn(2, 8, 8, 64).astype(np.float32) * 5
    x16 = jnp.asarray(x32, jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    got = group_norm_silu(x16, scale, bias, 16, apply_silu=False)
    assert got.dtype == jnp.bfloat16
    want = group_norm_silu(jnp.asarray(x32), scale, bias, 16, apply_silu=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.05)


def test_module_param_structure_matches_nn_groupnorm():
    """FusedGroupNorm must expose the same {scale, bias} params so torch
    checkpoint key translation is unaffected."""
    from tvi.models.layers import FusedGroupNorm

    m = FusedGroupNorm(num_groups=4, use_silu=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
    assert set(v["params"]) == {"scale", "bias"}
    assert v["params"]["scale"].shape == (8,)


class TestTemporalConv311:
    def test_matmul_form_matches_xla_conv(self):
        """The frame-shifted-matmul formulation must equal nn.Conv's (3,1,1)
        convolution bit-for-bit in fp32 (same contraction, same padding)."""
        import os

        import flax.linen as nn
        import jax
        import jax.numpy as jnp
        import numpy as np

        from tvi.models.resnet import TemporalConv311

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4, 6, 8))
        m = TemporalConv311(12)
        params = m.init(jax.random.PRNGKey(1), x)
        ref = nn.Conv(12, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)))
        ref_params = {"params": {"kernel": params["params"]["kernel"],
                                 "bias": params["params"]["bias"]}}
        expect = ref.apply(ref_params, x)

        got_xla = m.apply(params, x)  # default path: XLA conv
        np.testing.assert_allclose(np.asarray(got_xla), np.asarray(expect),
                                   atol=1e-5, rtol=1e-5)
        os.environ["TVI_TEMPORAL_CONV"] = "matmul"
        try:
            got_mm = m.apply(params, x)
        finally:
            del os.environ["TVI_TEMPORAL_CONV"]
        np.testing.assert_allclose(np.asarray(got_mm), np.asarray(expect),
                                   atol=1e-5, rtol=1e-5)

    def test_param_tree_matches_nn_conv(self):
        import jax
        import jax.numpy as jnp

        from tvi.models.resnet import TemporalConv311

        m = TemporalConv311(12)
        params = m.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 2, 2, 8)))["params"]
        assert set(params.keys()) == {"kernel", "bias"}
        assert params["kernel"].shape == (3, 1, 1, 8, 12)
        assert params["bias"].shape == (12,)
