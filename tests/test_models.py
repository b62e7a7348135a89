"""Shape/behavior tests for the model zoo on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.core.config import (
    TINY_CLIP,
    TINY_UNET,
    TINY_VAE,
    ControlNetConfig,
    UNetConfig,
)
from tvi.models.clip_vision import CLIPVisionModelWithProjection
from tvi.models.controlnet import ControlNetSVDModel
from tvi.models.projector import FeatureProjector, MotionEncoder
from tvi.models.unet_st import UNetSpatioTemporalConditionModel
from tvi.models.vae import AutoencoderKLTemporalDecoder

B, F, H, W = 1, 4, 16, 16


@pytest.fixture(scope="module")
def unet_and_params(rng):
    m = UNetSpatioTemporalConditionModel(TINY_UNET)
    sample = jnp.zeros((B, F, H, W, 9))
    ctx = (jnp.ones((B, 2, 32)), jnp.ones((B, 1, 32)))
    ids = jnp.zeros((B, 3))
    variables = m.init(rng, sample, jnp.zeros((B,)), ctx, ids)
    return m, variables


class TestUNet:
    def test_forward_shapes(self, unet_and_params):
        m, variables = unet_and_params
        sample = jnp.ones((B, F, H, W, 9)) * 0.1
        ctx = (jnp.ones((B, 2, 32)), jnp.ones((B, 1, 32)))
        out, feats = m.apply(variables, sample, jnp.zeros((B,)), ctx, jnp.zeros((B, 3)))
        assert out.shape == (B, F, H, W, 4)
        assert len(feats) == len(TINY_UNET.up_block_types)

    def test_tuple_vs_single_context_differ(self, unet_and_params, rng):
        m, variables = unet_and_params
        sample = jax.random.normal(rng, (B, F, H, W, 9)) * 0.1
        ctx_t = (jnp.ones((B, 2, 32)), jnp.full((B, 1, 32), 2.0))
        out_t, _ = m.apply(variables, sample, jnp.zeros((B,)), ctx_t, jnp.zeros((B, 3)))
        ctx_s = jnp.ones((B, 2, 32))
        out_s, _ = m.apply(variables, sample, jnp.zeros((B,)), ctx_s, jnp.zeros((B, 3)))
        assert not np.allclose(np.asarray(out_t), np.asarray(out_s))

    def test_attn_stats_collected(self, unet_and_params):
        m, variables = unet_and_params
        sample = jnp.ones((B, F, H, W, 9)) * 0.1
        ctx = (jnp.ones((B, 2, 32)), jnp.ones((B, 1, 32)))
        out, state = m.apply(
            variables, sample, jnp.zeros((B,)), ctx, jnp.zeros((B, 3)),
            want_stats=True, mutable=["intermediates"],
        )
        flat = jax.tree.leaves(state["intermediates"])
        # every temporal cross-attn emitted per-frame stats
        assert len(flat) > 0
        for leaf in flat:
            assert leaf.shape[-1] == F

    def test_controlnet_residual_injection(self, unet_and_params, rng):
        m, variables = unet_and_params
        cn_cfg = ControlNetConfig.from_unet(TINY_UNET)
        cn = ControlNetSVDModel(cn_cfg)
        sample = jax.random.normal(rng, (B, F, H, W, 9)) * 0.1
        ctx = (jnp.ones((B, 2, 32)), jnp.ones((B, 1, 32)))
        ids = jnp.zeros((B, 3))
        cond = jnp.ones((B, F, H * 8, W * 8, 3))
        cn_vars = cn.init(rng, sample, jnp.zeros((B,)), ctx, ids, cond)
        down_res, mid_res = cn.apply(cn_vars, sample, jnp.zeros((B,)), ctx, ids, cond)
        # zero-init output convs -> residuals must be exactly zero at init
        for r in down_res:
            assert float(jnp.abs(r).max()) == 0.0
        assert float(jnp.abs(mid_res).max()) == 0.0
        out_plain, _ = m.apply(variables, sample, jnp.zeros((B,)), ctx, ids)
        out_res, _ = m.apply(variables, sample, jnp.zeros((B,)), ctx, ids,
                             down_block_residuals=down_res,
                             mid_block_residual=mid_res)
        np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_res), atol=1e-6)
        # skip-count invariant: conv_in + every down-block output
        n_skips = 1 + sum(
            TINY_UNET.layers_per_block + (1 if i < TINY_UNET.num_blocks - 1 else 0)
            for i in range(TINY_UNET.num_blocks)
        )
        assert len(down_res) == n_skips


class TestVAE:
    @pytest.fixture(scope="class")
    def vae_and_params(self, rng):
        m = AutoencoderKLTemporalDecoder(TINY_VAE)
        x = jnp.zeros((2, 16, 16, 3))
        variables = m.init(rng, x, 2)
        return m, variables

    def test_encode_decode_shapes(self, vae_and_params, rng):
        m, variables = vae_and_params
        x = jax.random.normal(rng, (4, 16, 16, 3))
        z = m.apply(variables, x, method=m.encode_mode)
        assert z.shape == (4, 8, 8, 4)  # one downsample in TINY_VAE
        y = m.apply(variables, z, 4, method=m.decode)
        assert y.shape == (4, 16, 16, 3)

    def test_encode_sample_uses_rng(self, vae_and_params, rng):
        m, variables = vae_and_params
        x = jax.random.normal(rng, (1, 16, 16, 3))
        z1 = m.apply(variables, x, jax.random.PRNGKey(1), method=m.encode_sample)
        z2 = m.apply(variables, x, jax.random.PRNGKey(2), method=m.encode_sample)
        assert not np.allclose(np.asarray(z1), np.asarray(z2))


class TestCLIP:
    def test_image_embeds_shape(self, rng):
        m = CLIPVisionModelWithProjection(TINY_CLIP)
        x = jnp.zeros((2, 32, 32, 3))
        variables = m.init(rng, x)
        out = m.apply(variables, x)
        assert out.shape == (2, TINY_CLIP.projection_dim)


class TestProjectors:
    def test_feature_projector(self, rng):
        m = FeatureProjector(output_dim=16)
        x = jnp.ones((2, 1, 64))
        variables = m.init(rng, x)
        assert m.apply(variables, x).shape == (2, 1, 16)

    def test_motion_encoder(self, rng):
        m = MotionEncoder(output_dim=16)
        x = jnp.ones((2, 32, 32, 1))
        variables = m.init(rng, x)
        assert m.apply(variables, x).shape == (2, 16)
