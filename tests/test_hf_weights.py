"""Weight-converter tests: round-trip through the torch-style naming for
every model family, surgery semantics, and a numerical forward check that
converted linear/conv layouts actually compute the same function."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from tvi.core.config import TINY_CLIP, TINY_UNET, TINY_VAE, ControlNetConfig
from tvi.io.hf_weights import (
    apply_interp_surgery,
    extract_mask_token,
    flax_to_state_dict,
    state_dict_to_flax,
    translate_torch_key,
)
from tvi.models.clip_vision import CLIPVisionModelWithProjection
from tvi.models.controlnet import ControlNetSVDModel
from tvi.models.unet_st import UNetSpatioTemporalConditionModel
from tvi.models.vae import AutoencoderKLTemporalDecoder


def _roundtrip(variables):
    sd = flax_to_state_dict(variables)
    back = state_dict_to_flax({k: np.asarray(v) for k, v in sd.items()})
    flat_a = traverse_util.flatten_dict(variables, sep="/")
    flat_b = traverse_util.flatten_dict(back, sep="/")
    assert set(flat_a) == set(flat_b), (
        set(flat_a) ^ set(flat_b))
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k], err_msg=k)


class TestRoundTrip:
    def test_unet(self, rng):
        m = UNetSpatioTemporalConditionModel(TINY_UNET)
        _roundtrip(m.init_params(rng))

    def test_vae(self, rng):
        m = AutoencoderKLTemporalDecoder(TINY_VAE)
        _roundtrip(m.init(rng, jnp.zeros((1, 16, 16, 3)), 1))

    def test_clip(self, rng):
        m = CLIPVisionModelWithProjection(TINY_CLIP)
        _roundtrip(m.init(rng, jnp.zeros((1, 32, 32, 3))))

    def test_controlnet(self, rng):
        cfg = ControlNetConfig.from_unet(TINY_UNET)
        m = ControlNetSVDModel(cfg)
        v = m.init(rng, jnp.zeros((1, 2, 8, 8, cfg.in_channels)), jnp.zeros(()),
                   (jnp.zeros((1, 2, cfg.cross_attention_dim)),
                    jnp.zeros((1, 1, cfg.cross_attention_dim))),
                   jnp.zeros((1, 3)), jnp.zeros((1, 2, 64, 64, 3)))
        _roundtrip(v)


class TestNaming:
    @pytest.mark.parametrize("torch_key,flax_path", [
        ("conv_in.weight", "conv_in/kernel"),
        ("down_blocks.0.resnets.1.spatial_res_block.norm1.weight",
         "down_blocks_0/resnets_1/spatial_res_block/norm1/scale"),
        ("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
         "down_blocks_0/attentions_0/transformer_blocks_0/attn1/to_q/kernel"),
        ("down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias",
         "down_blocks_0/attentions_0/transformer_blocks_0/attn2/to_out/bias"),
        ("down_blocks.0.attentions.0.temporal_transformer_blocks.0.ff_in.net.0.proj.weight",
         "down_blocks_0/attentions_0/temporal_transformer_blocks_0/ff_in/proj_geglu/kernel"),
        ("down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
         "down_blocks_0/attentions_0/transformer_blocks_0/ff/proj_out/kernel"),
        ("mid_block.resnets.0.temporal_res_block.conv1.weight",
         "mid_block/resnets_0/temporal_res_block/conv1/kernel"),
        ("mid_block.resnets.0.time_mixer.mix_factor",
         "mid_block/resnets_0/time_mixer/mix_factor"),
        ("up_blocks.1.upsamplers.0.conv.weight",
         "up_blocks_1/upsamplers_0/conv/kernel"),
        ("time_embedding.linear_1.weight", "time_embedding/linear_1/kernel"),
        ("mask_token", "mask_token"),
        # CLIP (transformers)
        ("vision_model.embeddings.patch_embedding.weight", "patch_embedding/kernel"),
        ("vision_model.embeddings.class_embedding", "class_embedding"),
        ("vision_model.embeddings.position_embedding.weight", "position_embedding"),
        ("vision_model.encoder.layers.3.self_attn.q_proj.weight", "layers_3/q_proj/kernel"),
        ("vision_model.encoder.layers.3.mlp.fc1.bias", "layers_3/fc1/bias"),
        ("vision_model.post_layernorm.weight", "post_layernorm/scale"),
        ("visual_projection.weight", "visual_projection/kernel"),
        # ControlNet extras
        ("controlnet_cond_embedding.blocks.3.weight",
         "controlnet_cond_embedding/blocks_3/kernel"),
        ("controlnet_down_blocks.2.weight", "controlnet_down_blocks_2/kernel"),
        ("controlnet_mid_block.bias", "controlnet_mid_block/bias"),
        # VAE
        ("decoder.time_conv_out.weight", "decoder/time_conv_out/kernel"),
        ("encoder.mid_block.attentions.0.group_norm.weight",
         "encoder/mid_block/attentions_0/group_norm/scale"),
        ("quant_conv.weight", "quant_conv/kernel"),
        ("encoder.down_blocks.0.downsamplers.0.conv.weight",
         "encoder/down_blocks_0/downsamplers_0/conv/kernel"),
    ])
    def test_key_translation(self, torch_key, flax_path):
        path, _ = translate_torch_key(torch_key)
        assert path == flax_path


class TestSurgery:
    def test_conv_in_surgery_and_mask_token(self):
        rs = np.random.RandomState(0)
        sd = {"conv_in.weight": rs.randn(320, 8, 3, 3).astype(np.float32),
              "conv_in.bias": np.zeros(320, np.float32)}
        out = apply_interp_surgery(sd, np.random.RandomState(1))
        assert out["conv_in.weight"].shape == (320, 9, 3, 3)
        np.testing.assert_array_equal(out["conv_in.weight"][:, :8],
                                      sd["conv_in.weight"])
        # 9th channel is randn, not zeros (reference :783-787)
        assert np.abs(out["conv_in.weight"][:, 8]).max() > 0
        tok = extract_mask_token(out)
        assert tok.shape == (4,)


class TestNumericalEquivalence:
    def test_converted_unet_runs_identically_to_source(self, rng):
        """Convert a tiny UNet to torch-style naming and back; the restored
        params must produce identical outputs (catches silent transpose or
        mapping errors the key round-trip can't)."""
        m = UNetSpatioTemporalConditionModel(TINY_UNET)
        v = m.init_params(rng)
        restored = state_dict_to_flax(
            {k: np.asarray(x) for k, x in flax_to_state_dict(v).items()})
        sample = jax.random.normal(rng, (1, 2, 8, 8, 9)) * 0.1
        ctx = (jnp.ones((1, 2, 32)), jnp.ones((1, 1, 32)))
        out_a, _ = m.apply(v, sample, jnp.zeros((1,)), ctx, jnp.zeros((1, 3)))
        out_b, _ = m.apply(restored, sample, jnp.zeros((1,)), ctx, jnp.zeros((1, 3)))
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
