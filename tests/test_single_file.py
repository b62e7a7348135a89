"""Original (LDM-layout) single-file checkpoint conversion.

Covers the tpu-native equivalent of the reference's vendored mixins
(src/models/single_file.py): LDM VAE -> diffusers key conversion, SD
ControlNet -> diffusers key conversion, .ckpt reading with EMA extraction,
and an end-to-end load of the VAE encoder subset into the flax tree.
"""

import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import traverse_util

from tvi.io.hf_weights import state_dict_to_flax
from tvi.io.single_file import (
    convert_ldm_controlnet_state_dict,
    convert_ldm_vae_state_dict,
    load_original_state_dict,
    load_vae_encoder_params_single_file,
    strip_prefix,
)


# ---------------------------------------------------------------- VAE keys

def _diffusers_vae_key_to_ldm(key: str):
    """Test-local inverse mapping (diffusers -> LDM) used to synthesize
    original-layout checkpoints from this repo's param naming."""
    k = key
    m = re.match(r"(encoder|decoder)\.mid_block\.attentions\.0\.(.*)", k)
    if m:
        side, rest = m.groups()
        rest = (rest.replace("group_norm", "norm").replace("to_out.0", "proj_out")
                .replace("to_q", "q").replace("to_k", "k").replace("to_v", "v"))
        return f"{side}.mid.attn_1.{rest}"
    k = re.sub(r"\.mid_block\.resnets\.(\d+)",
               lambda m: f".mid.block_{int(m.group(1)) + 1}", k)
    k = re.sub(r"encoder\.down_blocks\.(\d+)\.resnets\.(\d+)",
               r"encoder.down.\1.block.\2", k)
    k = re.sub(r"encoder\.down_blocks\.(\d+)\.downsamplers\.0\.conv",
               r"encoder.down.\1.downsample.conv", k)
    k = k.replace(".conv_shortcut.", ".nin_shortcut.")
    k = k.replace(".conv_norm_out.", ".norm_out.")
    return k


def test_vae_encoder_key_families():
    shapes = {
        "encoder.conv_in.weight": (8, 3, 3, 3),
        "encoder.down.0.block.0.norm1.weight": (8,),
        "encoder.down.0.block.0.conv1.weight": (8, 8, 3, 3),
        "encoder.down.1.block.0.nin_shortcut.weight": (16, 8, 1, 1),
        "encoder.down.0.downsample.conv.bias": (8,),
        "encoder.mid.block_1.conv2.weight": (16, 16, 3, 3),
        "encoder.mid.attn_1.norm.weight": (16,),
        "encoder.mid.attn_1.q.weight": (16, 16, 1, 1),
        "encoder.mid.attn_1.proj_out.weight": (16, 16, 1, 1),
        "encoder.norm_out.weight": (16,),
        "quant_conv.weight": (8, 8, 1, 1),
    }
    sd = {k: np.zeros(s, np.float32) for k, s in shapes.items()}
    out = convert_ldm_vae_state_dict(sd)
    assert set(out) == {
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.0.resnets.0.conv1.weight",
        "encoder.down_blocks.1.resnets.0.conv_shortcut.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.bias",
        "encoder.mid_block.resnets.0.conv2.weight",
        "encoder.mid_block.attentions.0.group_norm.weight",
        "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.mid_block.attentions.0.to_out.0.weight",
        "encoder.conv_norm_out.weight",
        "quant_conv.weight",
    }
    # 1x1 attention convs squeeze to Linear; the norm stays 1-D
    assert out["encoder.mid_block.attentions.0.to_q.weight"].shape == (16, 16)
    assert out["encoder.mid_block.attentions.0.group_norm.weight"].shape == (16,)
    # quant_conv is untouched (still a conv)
    assert out["quant_conv.weight"].shape == (8, 8, 1, 1)


def test_vae_decoder_up_order_reversed():
    sd = {f"decoder.up.{i}.block.0.conv1.weight": np.full((1,), i)
          for i in range(4)}
    sd["decoder.up.0.upsample.conv.weight"] = np.full((1,), 10.0)
    out = convert_ldm_vae_state_dict(sd)
    # LDM up.0 is the LAST diffusers up_block
    assert out["decoder.up_blocks.3.resnets.0.conv1.weight"][0] == 0
    assert out["decoder.up_blocks.0.resnets.0.conv1.weight"][0] == 3
    assert "decoder.up_blocks.3.upsamplers.0.conv.weight" in out


# ----------------------------------------------------------- ControlNet

def test_controlnet_key_families():
    sd = {
        "time_embed.0.weight": np.zeros((4, 1)),
        "time_embed.2.weight": np.zeros((4, 4)),
        "input_blocks.0.0.weight": np.zeros((8, 4, 3, 3)),
        "input_blocks.1.0.in_layers.0.weight": np.zeros((8,)),
        "input_blocks.1.0.in_layers.2.weight": np.zeros((8, 8, 3, 3)),
        "input_blocks.1.0.emb_layers.1.weight": np.zeros((8, 4)),
        "input_blocks.1.0.out_layers.0.weight": np.zeros((8,)),
        "input_blocks.1.0.out_layers.3.weight": np.zeros((8, 8, 3, 3)),
        "input_blocks.1.1.proj_in.weight": np.zeros((8, 8)),
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight": np.zeros((8, 8)),
        "input_blocks.3.0.op.weight": np.zeros((8, 8, 3, 3)),
        "input_blocks.4.0.skip_connection.weight": np.zeros((16, 8, 1, 1)),
        "middle_block.0.in_layers.2.weight": np.zeros((16, 16, 3, 3)),
        "middle_block.1.proj_in.weight": np.zeros((16, 16)),
        "middle_block.2.out_layers.3.weight": np.zeros((16, 16, 3, 3)),
        "zero_convs.0.0.weight": np.zeros((8, 8, 1, 1)),
        "middle_block_out.0.weight": np.zeros((16, 16, 1, 1)),
        "input_hint_block.0.weight": np.zeros((16, 3, 3, 3)),
        "input_hint_block.2.weight": np.zeros((16, 16, 3, 3)),
        "input_hint_block.14.weight": np.zeros((8, 16, 3, 3)),
    }
    out = convert_ldm_controlnet_state_dict(sd)
    assert "time_embedding.linear_1.weight" in out
    assert "time_embedding.linear_2.weight" in out
    assert "conv_in.weight" in out
    assert "down_blocks.0.resnets.0.norm1.weight" in out
    assert "down_blocks.0.resnets.0.conv1.weight" in out
    assert "down_blocks.0.resnets.0.time_emb_proj.weight" in out
    assert "down_blocks.0.resnets.0.norm2.weight" in out
    assert "down_blocks.0.resnets.0.conv2.weight" in out
    assert "down_blocks.0.attentions.0.proj_in.weight" in out
    assert ("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"
            in out)
    # input_blocks.3 is the stage-0 downsampler (layers_per_block=2)
    assert "down_blocks.0.downsamplers.0.conv.weight" in out
    # input_blocks.4 is stage-1 resnet 0
    assert "down_blocks.1.resnets.0.conv_shortcut.weight" in out
    assert "mid_block.resnets.0.conv1.weight" in out
    assert "mid_block.attentions.0.proj_in.weight" in out
    assert "mid_block.resnets.1.conv2.weight" in out
    assert "controlnet_down_blocks.0.weight" in out
    assert "controlnet_mid_block.weight" in out
    assert "controlnet_cond_embedding.conv_in.weight" in out
    assert "controlnet_cond_embedding.blocks.0.weight" in out
    assert "controlnet_cond_embedding.conv_out.weight" in out


# ------------------------------------------------------------ .ckpt + EMA

def test_ckpt_reading_and_ema_extraction(tmp_path):
    torch = pytest.importorskip("torch")
    live = torch.full((2, 2), 1.0)
    ema = torch.full((2, 2), 2.0)
    other = torch.full((3,), 3.0)
    ckpt = {
        "state_dict": {
            "model.diffusion_model.out.weight": live,
            "model_ema.diffusion_modeloutweight": ema,
            "first_stage_model.encoder.conv_in.weight": other,
        }
    }
    path = str(tmp_path / "model.ckpt")
    torch.save(ckpt, path)

    sd = load_original_state_dict(path)
    assert sd["model.diffusion_model.out.weight"][0, 0] == 1.0
    assert not any(k.startswith("model_ema") for k in sd)

    sd_ema = load_original_state_dict(path, extract_ema=True)
    assert sd_ema["model.diffusion_model.out.weight"][0, 0] == 2.0
    assert sd_ema["first_stage_model.encoder.conv_in.weight"][0] == 3.0

    sub = strip_prefix(sd, "first_stage_model.")
    assert list(sub) == ["encoder.conv_in.weight"]


# ------------------------------------------------- end-to-end VAE encoder

def test_load_vae_encoder_from_single_file(tmp_path):
    """Synthesize an original-layout checkpoint from a tiny VAE's param tree
    and load it back: every encoder/quant_conv leaf must round-trip."""
    torch = pytest.importorskip("torch")
    from tvi.core.config import VAEConfig
    from tvi.io.hf_weights import flax_to_state_dict
    from tvi.models.vae import AutoencoderKLTemporalDecoder

    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                    latent_channels=4)
    vae = AutoencoderKLTemporalDecoder(cfg)
    variables = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), 1)
    torch_sd = flax_to_state_dict(variables)
    ldm = {}
    for k, v in torch_sd.items():
        if not (k.startswith("encoder.") or k.startswith("quant_conv.")):
            continue
        lk = _diffusers_vae_key_to_ldm(k)
        if ".attn_1." in lk and lk.endswith("weight") and "norm" not in lk:
            v = v.reshape(v.shape[0], v.shape[1], 1, 1)  # Linear -> 1x1 conv
        ldm[f"first_stage_model.{lk}"] = torch.from_numpy(np.asarray(v))
    path = str(tmp_path / "sd.ckpt")
    torch.save({"state_dict": ldm}, path)

    tree = load_vae_encoder_params_single_file(path)
    got = traverse_util.flatten_dict(tree, sep="/")
    want = {k: v for k, v in
            traverse_util.flatten_dict(variables, sep="/").items()
            if k.startswith(("params/encoder/", "params/quant_conv/"))}
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=1e-6, err_msg=k)
