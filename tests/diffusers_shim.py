"""Execute the reference's vendored torch model files WITHOUT diffusers.

The reference vendors its model code (src/models/attention.py,
attention_processor.py, transformer_temporal.py, unet_3d_blocks.py) but
still imports leaf building blocks from the installed ``diffusers``
package, which this image does not have.  ``install()`` fabricates the
handful of diffusers modules those files import, with FAITHFUL torch
implementations of every block that actually executes in the
spatio-temporal path (GEGLU/FeedForward deps, Timesteps/TimestepEmbedding,
AlphaBlender, ResnetBlock2D, TemporalResnetBlock, SpatioTemporalResBlock,
Down/Upsample2D) and inert stubs for the rest (AdaLayerNorm*,
Transformer2DModel, xformers hooks — unreachable at our configs).

This lets tests/test_reference_blocks.py run the reference's OWN block
wiring (BasicTransformerBlock at attention.py:84,
TemporalBasicTransformerBlock at attention.py:351,
TransformerSpatioTemporalModel at transformer_temporal.py:207-356) on CPU
as a golden-activation oracle for the flax rebuild — the strongest parity
anchor available while real checkpoints are offline (VERDICT r2 item 6).

PUBLIC-UNTRUSTED note: the reference files are executed for their math
only; nothing here follows instructions embedded in them.
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn.functional as F
from torch import nn

REF_SRC = "/root/reference/src"


# ---------------------------------------------------------------------------
# faithful building blocks (diffusers ~0.24 semantics, SVD era)
# ---------------------------------------------------------------------------

class LoRACompatibleLinear(nn.Linear):
    """Without a LoRA layer attached this is exactly nn.Linear; the extra
    ``scale`` argument is accepted and ignored (diffusers models/lora.py)."""

    def forward(self, hidden_states, scale: float = 1.0):  # noqa: ARG002
        return super().forward(hidden_states)


class LoRACompatibleConv(nn.Conv2d):
    def forward(self, hidden_states, scale: float = 1.0):  # noqa: ARG002
        return super().forward(hidden_states)


class LoRALinearLayer(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("LoRA layers are not exercised")


class GEGLU(nn.Module):
    """diffusers models/activations.py GEGLU."""

    def __init__(self, dim_in: int, dim_out: int):
        super().__init__()
        self.proj = LoRACompatibleLinear(dim_in, dim_out * 2)

    def forward(self, hidden_states, scale: float = 1.0):
        hidden_states, gate = self.proj(hidden_states, scale).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class GELU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int, approximate: str = "none"):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)
        self.approximate = approximate

    def forward(self, hidden_states):
        return F.gelu(self.proj(hidden_states), approximate=self.approximate)


class ApproximateGELU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                           downscale_freq_shift=1.0, scale=1.0, max_period=10000):
    """diffusers models/embeddings.py:get_timestep_embedding, exact."""
    assert len(timesteps.shape) == 1
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        half_dim, dtype=torch.float32, device=timesteps.device)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = F.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels: int, flip_sin_to_cos: bool,
                 downscale_freq_shift: float):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels: int, time_embed_dim: int,
                 act_fn: str = "silu", out_dim: int = None,
                 post_act_fn: str = None, cond_proj_dim: int = None):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        assert cond_proj_dim is None and post_act_fn is None
        assert act_fn == "silu"
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)

    def forward(self, sample, condition=None):  # noqa: ARG002
        return self.linear_2(self.act(self.linear_1(sample)))


class SinusoidalPositionalEmbedding(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("not exercised at our configs")


class AlphaBlender(nn.Module):
    """diffusers models/resnet.py AlphaBlender (SVD era), exact for the
    'learned_with_images' strategy used by the reference."""

    strategies = ["learned", "fixed", "learned_with_images"]

    def __init__(self, alpha: float, merge_strategy: str = "learned_with_images",
                 switch_spatial_to_temporal_mix: bool = False):
        super().__init__()
        self.merge_strategy = merge_strategy
        self.switch_spatial_to_temporal_mix = switch_spatial_to_temporal_mix
        if merge_strategy == "fixed":
            self.register_buffer("mix_factor", torch.Tensor([alpha]))
        elif merge_strategy in ("learned", "learned_with_images"):
            self.register_parameter(
                "mix_factor", nn.Parameter(torch.Tensor([alpha])))
        else:
            raise ValueError(f"unknown merge strategy {merge_strategy}")

    def get_alpha(self, image_only_indicator: torch.Tensor, ndims: int):
        if self.merge_strategy == "fixed":
            alpha = self.mix_factor
        elif self.merge_strategy == "learned":
            alpha = torch.sigmoid(self.mix_factor)
        else:  # learned_with_images
            alpha = torch.where(
                image_only_indicator.bool(),
                torch.ones(1, 1, device=image_only_indicator.device),
                torch.sigmoid(self.mix_factor)[..., None],
            )
            if ndims == 5:
                alpha = alpha[:, None, :, None, None]
            elif ndims == 3:
                alpha = alpha.reshape(-1)[:, None, None]
            else:
                raise ValueError(f"unexpected ndims {ndims}")
        return alpha

    def forward(self, x_spatial, x_temporal, image_only_indicator=None):
        alpha = self.get_alpha(image_only_indicator, x_spatial.ndim)
        alpha = alpha.to(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class ResnetBlock2D(nn.Module):
    """diffusers models/resnet.py ResnetBlock2D, restricted to the
    configuration the SVD/ST stack uses (default time_embedding_norm,
    swish nonlinearity, no up/downsample)."""

    def __init__(self, *, in_channels, out_channels=None, conv_shortcut=False,
                 dropout=0.0, temb_channels=512, groups=32, groups_out=None,
                 pre_norm=True, eps=1e-6, non_linearity="swish",
                 skip_time_act=False, time_embedding_norm="default",
                 kernel=None, output_scale_factor=1.0, use_in_shortcut=None,
                 up=False, down=False, conv_shortcut_bias=True,
                 conv_2d_out_channels=None):
        super().__init__()
        assert time_embedding_norm == "default" and not up and not down
        assert non_linearity in ("swish", "silu") and kernel is None
        out_channels = out_channels or in_channels
        self.output_scale_factor = output_scale_factor
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps, affine=True)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, 1, 1)
        if temb_channels is not None:
            self.time_emb_proj = nn.Linear(temb_channels, out_channels)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(groups_out or groups, out_channels,
                                  eps=eps, affine=True)
        self.dropout = nn.Dropout(dropout)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, 1, 1)
        self.nonlinearity = nn.SiLU()
        self.use_in_shortcut = (in_channels != out_channels
                                if use_in_shortcut is None else use_in_shortcut)
        self.conv_shortcut = None
        if self.use_in_shortcut:
            self.conv_shortcut = nn.Conv2d(in_channels, out_channels, 1, 1, 0,
                                           bias=conv_shortcut_bias)

    def forward(self, input_tensor, temb, scale: float = 1.0):  # noqa: ARG002
        hidden_states = self.norm1(input_tensor)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv1(hidden_states)
        if self.time_emb_proj is not None and temb is not None:
            temb = self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
            hidden_states = hidden_states + temb
        hidden_states = self.norm2(hidden_states)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.dropout(hidden_states)
        hidden_states = self.conv2(hidden_states)
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return (input_tensor + hidden_states) / self.output_scale_factor


class TemporalResnetBlock(nn.Module):
    """diffusers models/resnet.py TemporalResnetBlock ((3,1,1) 3D convs)."""

    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 eps=1e-6):
        super().__init__()
        out_channels = out_channels or in_channels
        kernel_size = (3, 1, 1)
        padding = tuple(k // 2 for k in kernel_size)
        self.norm1 = nn.GroupNorm(32, in_channels, eps=eps, affine=True)
        self.conv1 = nn.Conv3d(in_channels, out_channels, kernel_size,
                               stride=1, padding=padding)
        if temb_channels is not None:
            self.time_emb_proj = nn.Linear(temb_channels, out_channels)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(32, out_channels, eps=eps, affine=True)
        self.dropout = nn.Dropout(0.0)
        self.conv2 = nn.Conv3d(out_channels, out_channels, kernel_size,
                               stride=1, padding=padding)
        self.nonlinearity = nn.SiLU()
        self.use_in_shortcut = in_channels != out_channels
        self.conv_shortcut = None
        if self.use_in_shortcut:
            self.conv_shortcut = nn.Conv3d(in_channels, out_channels, 1, 1, 0)

    def forward(self, input_tensor, temb):
        # input: (B, C, F, H, W)
        hidden_states = self.norm1(input_tensor)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv1(hidden_states)
        if self.time_emb_proj is not None and temb is not None:
            temb = self.time_emb_proj(self.nonlinearity(temb))
            temb = temb[:, :, :, None, None].permute(0, 2, 1, 3, 4)
            hidden_states = hidden_states + temb
        hidden_states = self.norm2(hidden_states)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.dropout(hidden_states)
        hidden_states = self.conv2(hidden_states)
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return input_tensor + hidden_states


class SpatioTemporalResBlock(nn.Module):
    """diffusers models/resnet.py SpatioTemporalResBlock: spatial
    ResnetBlock2D -> temporal TemporalResnetBlock -> AlphaBlender."""

    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 eps=1e-6, temporal_eps=None, merge_factor=0.5,
                 merge_strategy="learned_with_images",
                 switch_spatial_to_temporal_mix=False):
        super().__init__()
        out_channels = out_channels or in_channels
        self.spatial_res_block = ResnetBlock2D(
            in_channels=in_channels, out_channels=out_channels,
            temb_channels=temb_channels, eps=eps)
        self.temporal_res_block = TemporalResnetBlock(
            in_channels=out_channels, out_channels=out_channels,
            temb_channels=temb_channels,
            eps=temporal_eps if temporal_eps is not None else eps)
        self.time_mixer = AlphaBlender(
            alpha=merge_factor, merge_strategy=merge_strategy,
            switch_spatial_to_temporal_mix=switch_spatial_to_temporal_mix)

    def forward(self, hidden_states, temb=None, image_only_indicator=None):
        num_frames = image_only_indicator.shape[-1]
        hidden_states = self.spatial_res_block(hidden_states, temb)
        batch_frames, channels, height, width = hidden_states.shape
        batch_size = batch_frames // num_frames
        hidden_states_mix = hidden_states[None, :].reshape(
            batch_size, num_frames, channels, height, width
        ).permute(0, 2, 1, 3, 4)
        hidden_states = hidden_states_mix.clone()
        if temb is not None:
            temb = temb.reshape(batch_size, num_frames, -1)
        hidden_states = self.temporal_res_block(hidden_states, temb)
        hidden_states = self.time_mixer(
            x_spatial=hidden_states_mix, x_temporal=hidden_states,
            image_only_indicator=image_only_indicator)
        hidden_states = hidden_states.permute(0, 2, 1, 3, 4).reshape(
            batch_frames, channels, height, width)
        return hidden_states


class Downsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, out_channels=None,
                 padding=1, name="conv"):
        super().__init__()
        out_channels = out_channels or channels
        assert use_conv
        self.conv = nn.Conv2d(channels, out_channels, 3, stride=2,
                              padding=padding)
        self.name = name

    def forward(self, hidden_states, scale: float = 1.0):  # noqa: ARG002
        return self.conv(hidden_states)


class Upsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, use_conv_transpose=False,
                 out_channels=None, name="conv"):
        super().__init__()
        assert use_conv and not use_conv_transpose
        out_channels = out_channels or channels
        self.conv = nn.Conv2d(channels, out_channels, 3, padding=1)
        self.name = name

    def forward(self, hidden_states, output_size=None, scale: float = 1.0):  # noqa: ARG002
        hidden_states = F.interpolate(hidden_states, scale_factor=2.0,
                                      mode="nearest")
        return self.conv(hidden_states)


class TemporalConvLayer(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("only used by unreachable *3D blocks")


# ---------------------------------------------------------------------------
# faithful torch VAE (AutoencoderKLTemporalDecoder) assembly
#
# The reference loads the SVD VAE from the installed diffusers package
# (src/train.py:262-266), which this image does not have.  These classes
# re-state the diffusers 0.24 AutoencoderKLTemporalDecoder in torch,
# reusing the reference's OWN vendored MidBlockTemporalDecoder /
# UpBlockTemporalDecoder / Attention (models/unet_3d_blocks.py:1759-1871,
# models/attention_processor.py) for everything the reference vendors, so
# tests/test_reference_models.py can oracle the flax VAE against live torch
# code.  Construct via build_autoencoder_kl_temporal_decoder() AFTER
# install().
# ---------------------------------------------------------------------------


class DownEncoderBlock2D(nn.Module):
    """diffusers models/vae.py DownEncoderBlock2D: N resnets (no temb) +
    asymmetric-pad stride-2 downsample conv (Downsample2D padding=0 branch)."""

    def __init__(self, in_channels, out_channels, num_layers=2,
                 add_downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_channels=in_channels if i == 0 else out_channels,
                          out_channels=out_channels, temb_channels=None,
                          eps=1e-6, groups=32)
            for i in range(num_layers)
        ])
        self.downsamplers = None
        if add_downsample:
            ds = nn.Module()
            ds.conv = nn.Conv2d(out_channels, out_channels, 3, stride=2,
                                padding=0)
            self.downsamplers = nn.ModuleList([ds])

    def forward(self, x):
        for resnet in self.resnets:
            x = resnet(x, None)
        if self.downsamplers is not None:
            x = F.pad(x, (0, 1, 0, 1), mode="constant", value=0)
            x = self.downsamplers[0].conv(x)
        return x


def _make_vae_classes():
    """Build the torch VAE classes; deferred because they use the vendored
    Attention from /root/reference/src/models/attention_processor.py."""
    from models.attention_processor import Attention  # vendored reference code
    from models.unet_3d_blocks import (  # vendored reference code
        MidBlockTemporalDecoder,
        UpBlockTemporalDecoder,
    )

    class UNetMidBlock2D(nn.Module):
        """diffusers UNetMidBlock2D as configured by the VAE encoder:
        resnet -> 1-head full attention (residual, group-normed) -> resnet."""

        def __init__(self, in_channels):
            super().__init__()
            self.resnets = nn.ModuleList([
                ResnetBlock2D(in_channels=in_channels, out_channels=in_channels,
                              temb_channels=None, eps=1e-6, groups=32),
                ResnetBlock2D(in_channels=in_channels, out_channels=in_channels,
                              temb_channels=None, eps=1e-6, groups=32),
            ])
            self.attentions = nn.ModuleList([
                Attention(query_dim=in_channels, heads=1, dim_head=in_channels,
                          eps=1e-6, norm_num_groups=32, bias=True,
                          upcast_softmax=True, residual_connection=True)
            ])

        def forward(self, x):
            x = self.resnets[0](x, None)
            x = self.attentions[0](x)
            x = self.resnets[1](x, None)
            return x

    class Encoder(nn.Module):
        """diffusers models/vae.py Encoder with double_z=True."""

        def __init__(self, in_channels=3, out_channels=4,
                     block_out_channels=(128, 256, 512, 512),
                     layers_per_block=2):
            super().__init__()
            self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3,
                                     stride=1, padding=1)
            self.down_blocks = nn.ModuleList([])
            output_channel = block_out_channels[0]
            for i, ch in enumerate(block_out_channels):
                input_channel = output_channel
                output_channel = ch
                self.down_blocks.append(DownEncoderBlock2D(
                    input_channel, output_channel,
                    num_layers=layers_per_block,
                    add_downsample=i < len(block_out_channels) - 1))
            self.mid_block = UNetMidBlock2D(block_out_channels[-1])
            self.conv_norm_out = nn.GroupNorm(
                num_channels=block_out_channels[-1], num_groups=32, eps=1e-6)
            self.conv_act = nn.SiLU()
            self.conv_out = nn.Conv2d(block_out_channels[-1],
                                      2 * out_channels, 3, padding=1)

        def forward(self, x):
            x = self.conv_in(x)
            for block in self.down_blocks:
                x = block(x)
            x = self.mid_block(x)
            x = self.conv_norm_out(x)
            x = self.conv_act(x)
            return self.conv_out(x)

    class TemporalDecoder(nn.Module):
        """diffusers models/autoencoders/vae.py TemporalDecoder, built from
        the reference's vendored temporal blocks."""

        def __init__(self, in_channels=4, out_channels=3,
                     block_out_channels=(128, 256, 512, 512),
                     layers_per_block=2):
            super().__init__()
            self.layers_per_block = layers_per_block
            self.conv_in = nn.Conv2d(in_channels, block_out_channels[-1], 3,
                                     stride=1, padding=1)
            self.mid_block = MidBlockTemporalDecoder(
                num_layers=self.layers_per_block,
                in_channels=block_out_channels[-1],
                out_channels=block_out_channels[-1],
                attention_head_dim=block_out_channels[-1])
            self.up_blocks = nn.ModuleList([])
            reversed_channels = list(reversed(block_out_channels))
            output_channel = reversed_channels[0]
            for i, ch in enumerate(reversed_channels):
                prev_output_channel = output_channel
                output_channel = ch
                self.up_blocks.append(UpBlockTemporalDecoder(
                    num_layers=self.layers_per_block + 1,
                    in_channels=prev_output_channel,
                    out_channels=output_channel,
                    add_upsample=i < len(block_out_channels) - 1))
            self.conv_norm_out = nn.GroupNorm(
                num_channels=block_out_channels[0], num_groups=32, eps=1e-6)
            self.conv_act = nn.SiLU()
            self.conv_out = nn.Conv2d(block_out_channels[0], out_channels, 3,
                                      padding=1)
            self.time_conv_out = nn.Conv3d(out_channels, out_channels,
                                           kernel_size=(3, 1, 1),
                                           padding=(1, 0, 0))

        def forward(self, sample, image_only_indicator, num_frames=1):
            sample = self.conv_in(sample)
            sample = self.mid_block(sample,
                                    image_only_indicator=image_only_indicator)
            for up_block in self.up_blocks:
                sample = up_block(sample,
                                  image_only_indicator=image_only_indicator)
            sample = self.conv_norm_out(sample)
            sample = self.conv_act(sample)
            sample = self.conv_out(sample)
            batch_frames, channels, height, width = sample.shape
            batch_size = batch_frames // num_frames
            sample = sample[None, :].reshape(
                batch_size, num_frames, channels, height, width
            ).permute(0, 2, 1, 3, 4)
            sample = self.time_conv_out(sample)
            sample = sample.permute(0, 2, 1, 3, 4).reshape(
                batch_frames, channels, height, width)
            return sample

    class AutoencoderKLTemporalDecoder(nn.Module):
        """encoder + quant_conv + temporal decoder (diffusers
        AutoencoderKLTemporalDecoder: quant_conv, no post_quant_conv)."""

        def __init__(self, in_channels=3, out_channels=3, latent_channels=4,
                     block_out_channels=(128, 256, 512, 512),
                     layers_per_block=2):
            super().__init__()
            self.encoder = Encoder(in_channels, latent_channels,
                                   block_out_channels, layers_per_block)
            self.decoder = TemporalDecoder(latent_channels, out_channels,
                                           block_out_channels, layers_per_block)
            self.quant_conv = nn.Conv2d(2 * latent_channels,
                                        2 * latent_channels, 1)

        def encode_moments(self, x):
            return self.quant_conv(self.encoder(x))

        def decode(self, z, num_frames):
            ioi = torch.zeros(z.shape[0] // num_frames, num_frames,
                              dtype=z.dtype, device=z.device)
            return self.decoder(z, image_only_indicator=ioi,
                                num_frames=num_frames)

    return AutoencoderKLTemporalDecoder


def build_autoencoder_kl_temporal_decoder(**kwargs) -> "nn.Module":
    """Factory for the faithful torch SVD VAE (call after install())."""
    return _make_vae_classes()(**kwargs)


# --- inert stubs (imported but never executed in the ST path) --------------

class _Inert:
    def __init__(self, *a, **k):
        raise NotImplementedError(f"{type(self).__name__} stub: "
                                  "not part of the spatio-temporal path")


class AdaLayerNorm(_Inert):
    pass


class AdaLayerNormZero(_Inert):
    pass


class AdaLayerNormContinuous(_Inert):
    pass


class DualTransformer2DModel(_Inert):
    pass


class Transformer2DModel(_Inert):
    pass


class GatedSelfAttentionDense(_Inert):
    pass


# ---------------------------------------------------------------------------
# pipeline-level shims: execute the reference PIPELINE file directly
# (src/pipelines/pipeline_stable_video_diffusion_efficient_interp.py) as the
# assembled-pipeline oracle (VERDICT r4 item 3).  Faithful to the diffusers
# 0.24 APIs the file imports at :8-15.
# ---------------------------------------------------------------------------


def randn_tensor(shape, generator=None, device=None, dtype=None):
    """diffusers.utils.torch_utils.randn_tensor (single-generator path)."""
    return torch.randn(tuple(shape), generator=generator, dtype=dtype)


class TorchEulerDiscreteScheduler:
    """EulerDiscreteScheduler with the SVD-xt scheduler_config.json
    semantics (the configuration the reference loads at src/train.py:246):
    karras rho-7 sigma ramp between sigma_min=0.002 and sigma_max=700,
    ``timestep_type='continuous'`` (t = 0.25*ln sigma),
    ``prediction_type='v_prediction'`` Euler ODE step, 'leading' spacing
    init noise sqrt(sigma_max^2+1).  Used from the pipeline at
    pipeline:490 (set_timesteps), :543 (scale_model_input), :569 (step)."""

    order = 1

    def __init__(self, sigma_min=0.002, sigma_max=700.0, rho=7.0):
        self.sigma_min, self.sigma_max, self.rho = sigma_min, sigma_max, rho
        self.sigmas = None
        self.timesteps = None

    @property
    def init_noise_sigma(self):
        return math.sqrt(self.sigma_max ** 2 + 1.0)

    def set_timesteps(self, num_inference_steps, device=None):
        import numpy as np

        ramp = np.linspace(0, 1, num_inference_steps)
        min_inv = self.sigma_min ** (1 / self.rho)
        max_inv = self.sigma_max ** (1 / self.rho)
        s = (max_inv + ramp * (min_inv - max_inv)) ** self.rho
        self.sigmas = torch.tensor(np.concatenate([s, [0.0]]),
                                   dtype=torch.float32)
        self.timesteps = 0.25 * torch.log(torch.tensor(s, dtype=torch.float32))

    def _index(self, t):
        return int(torch.argmin(torch.abs(self.timesteps - t)))

    def scale_model_input(self, sample, t):
        sigma = self.sigmas[self._index(t)]
        return sample / ((sigma ** 2 + 1) ** 0.5)

    def step(self, model_output, t, sample):
        i = self._index(t)
        sigma = self.sigmas[i]
        x = sample.float()
        out = model_output.float()
        denoised = x / (sigma ** 2 + 1.0) + out * (-sigma / (sigma ** 2 + 1.0) ** 0.5)
        prev = x + (x - denoised) / sigma * (self.sigmas[i + 1] - sigma)
        return types.SimpleNamespace(prev_sample=prev.to(sample.dtype))


class VaeImageProcessor:
    """diffusers.image_processor.VaeImageProcessor — the subset the
    reference pipeline uses (pil_to_numpy/numpy_to_pt at :193-194,
    preprocess at :456,461).  Inputs are expected already at the target
    size (the tests feed exact-size PIL images, so the resize branch of
    the real processor is a no-op)."""

    def __init__(self, vae_scale_factor=8, do_normalize=True):
        self.vae_scale_factor = vae_scale_factor

    @staticmethod
    def pil_to_numpy(images):
        import numpy as np

        if not isinstance(images, list):
            images = [images]
        arrs = [np.asarray(im).astype(np.float32) / 255.0 for im in images]
        return np.stack(arrs, axis=0)

    @staticmethod
    def numpy_to_pt(images):
        if images.ndim == 3:
            images = images[..., None]
        return torch.from_numpy(images.transpose(0, 3, 1, 2)).contiguous()

    def preprocess(self, image, height=None, width=None):
        if isinstance(image, torch.Tensor):
            x = image
        else:
            x = self.numpy_to_pt(self.pil_to_numpy(image))
        if height is not None and (x.shape[-2] != height or x.shape[-1] != width):
            raise ValueError(
                f"shim preprocess expects exact-size inputs, got "
                f"{tuple(x.shape[-2:])} for target {(height, width)}")
        return 2.0 * x - 1.0  # do_normalize

    def postprocess(self, image, output_type="np"):
        image = (image / 2 + 0.5).clamp(0, 1)
        if output_type == "pt":
            return image
        return image.cpu().permute(0, 2, 3, 1).float().numpy()


class DiffusionPipeline:
    """Minimal diffusers.pipelines.pipeline_utils.DiffusionPipeline: module
    registration, execution device, progress bar, hook cleanup."""

    def register_modules(self, **modules):
        for name, module in modules.items():
            setattr(self, name, module)

    @property
    def _execution_device(self):
        return torch.device("cpu")

    def progress_bar(self, total=None):
        import contextlib

        @contextlib.contextmanager
        def _cm():
            yield types.SimpleNamespace(update=lambda *a, **k: None)

        return _cm()

    def maybe_free_model_hooks(self):
        pass


class _DiagonalGaussian:
    def __init__(self, moments):
        self.mean, self.logvar = torch.chunk(moments, 2, dim=1)

    def mode(self):
        return self.mean


class AutoencoderKLTemporalDecoderHF:
    """The faithful shim VAE wrapped in the diffusers model API the
    pipeline drives: ``encode().latent_dist.mode()`` (pipeline:239),
    ``decode(z, num_frames).sample`` (pipeline:302), ``config`` fields
    (block_out_channels :187, scaling_factor :287, force_upcast :464) and
    a ``forward`` whose signature carries num_frames (:290)."""

    def __init__(self, block_out_channels=(128, 256, 512, 512),
                 layers_per_block=2, scaling_factor=0.18215):
        self.inner = _make_vae_classes()(
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block)
        self.config = types.SimpleNamespace(
            block_out_channels=tuple(block_out_channels),
            scaling_factor=scaling_factor, force_upcast=True,
            latent_channels=4)

    # module-ish surface the pipeline touches
    @property
    def dtype(self):
        return torch.float32

    def to(self, *a, **k):
        return self

    def eval(self):
        self.inner.eval()
        return self

    def state_dict(self):
        return self.inner.state_dict()

    def encode(self, x):
        return types.SimpleNamespace(
            latent_dist=_DiagonalGaussian(self.inner.encode_moments(x)))

    def decode(self, z, num_frames=1):
        return types.SimpleNamespace(
            sample=self.inner.decode(z, num_frames=num_frames))

    def forward(self, sample, num_frames=1):  # signature probed at :290
        raise NotImplementedError


# ---------------------------------------------------------------------------
# module fabrication
# ---------------------------------------------------------------------------

def _module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _Logger:
    def __getattr__(self, _):
        return lambda *a, **k: None


class ConfigMixin:
    config_name = "config.json"


def register_to_config(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(self, *args, **kwargs):
        fn(self, *args, **kwargs)
    return wrapped


class BaseOutput(dict):
    """Minimal stand-in: attribute + mapping access over dataclass fields."""

    def __post_init__(self):
        import dataclasses
        for f in dataclasses.fields(self):
            self[f.name] = getattr(self, f.name)


class ModelMixin(nn.Module):
    pass


def is_torch_version(op: str, version: str) -> bool:
    from packaging.version import Version
    cur = Version(torch.__version__.split("+")[0])
    ref = Version(version)
    return {"==": cur == ref, ">=": cur >= ref, "<=": cur <= ref,
            ">": cur > ref, "<": cur < ref}[op]


_INSTALLED = False


def install() -> None:
    """Fabricate the diffusers modules the reference model files import and
    put /root/reference/src on sys.path (read-only use)."""
    global _INSTALLED
    if _INSTALLED:
        return
    utils = _module(
        "diffusers.utils",
        BaseOutput=BaseOutput, logging=types.SimpleNamespace(
            get_logger=lambda *a, **k: _Logger()),
        USE_PEFT_BACKEND=False,
        deprecate=lambda *a, **k: None,
        is_torch_version=is_torch_version,
        CONFIG_NAME="config.json", DIFFUSERS_CACHE="/tmp",
        FLAX_WEIGHTS_NAME="flax_model.msgpack", HF_HUB_OFFLINE=True,
        MIN_PEFT_VERSION="0.6.0",
        SAFETENSORS_WEIGHTS_NAME="diffusion_pytorch_model.safetensors",
        WEIGHTS_NAME="diffusion_pytorch_model.bin",
        _add_variant=lambda n, v=None: n,
        _get_model_file=_Inert,
        check_peft_version=lambda *a, **k: None,
        is_accelerate_available=lambda: False,
        is_torch_xla_available=lambda: False,
    )
    _module("diffusers.utils.torch_utils",
            maybe_allow_in_graph=lambda cls: cls,
            apply_freeu=_Inert,
            randn_tensor=randn_tensor)
    _module("diffusers.utils.import_utils",
            is_xformers_available=lambda: False)
    _module("diffusers.utils.hub_utils", PushToHubMixin=type(
        "PushToHubMixin", (), {}))
    _module("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
            register_to_config=register_to_config)
    _module("diffusers.loaders", UNet2DConditionLoadersMixin=type(
        "UNet2DConditionLoadersMixin", (), {}),
        FromOriginalControlnetMixin=type("FromOriginalControlnetMixin", (), {}))
    # controlnet_svd.py:36 imports the UNet class from diffusers.models only
    # for its from_unet type annotation; an inert name suffices.  The
    # pipeline file imports AutoencoderKLTemporalDecoder for its type
    # annotation too — the HF-API wrapper doubles as the constructible VAE.
    models = _module("diffusers.models", UNetSpatioTemporalConditionModel=_Inert,
                     AutoencoderKLTemporalDecoder=AutoencoderKLTemporalDecoderHF)
    _module("diffusers.image_processor", VaeImageProcessor=VaeImageProcessor)
    _module("diffusers.schedulers",
            EulerDiscreteScheduler=TorchEulerDiscreteScheduler)
    _module("diffusers.pipelines", pipeline_utils=None)
    _module("diffusers.pipelines.pipeline_utils",
            DiffusionPipeline=DiffusionPipeline)
    _module("diffusers.models.activations", GEGLU=GEGLU, GELU=GELU,
            ApproximateGELU=ApproximateGELU)
    _module("diffusers.models.embeddings", TimestepEmbedding=TimestepEmbedding,
            Timesteps=Timesteps,
            SinusoidalPositionalEmbedding=SinusoidalPositionalEmbedding,
            get_timestep_embedding=get_timestep_embedding,
            TextImageProjection=_Inert, TextImageTimeEmbedding=_Inert,
            TextTimeEmbedding=_Inert)
    _module("diffusers.models.lora", LoRACompatibleLinear=LoRACompatibleLinear,
            LoRACompatibleConv=LoRACompatibleConv,
            LoRALinearLayer=LoRALinearLayer)
    _module("diffusers.models.normalization", AdaLayerNorm=AdaLayerNorm,
            AdaLayerNormZero=AdaLayerNormZero,
            AdaLayerNormContinuous=AdaLayerNormContinuous)
    _module("diffusers.models.modeling_utils", ModelMixin=ModelMixin,
            load_model_dict_into_meta=_Inert, load_state_dict=_Inert)
    _module("diffusers.models.resnet", AlphaBlender=AlphaBlender,
            ResnetBlock2D=ResnetBlock2D,
            TemporalResnetBlock=TemporalResnetBlock,
            SpatioTemporalResBlock=SpatioTemporalResBlock,
            Downsample2D=Downsample2D, Upsample2D=Upsample2D,
            TemporalConvLayer=TemporalConvLayer)
    _module("diffusers.models.dual_transformer_2d",
            DualTransformer2DModel=DualTransformer2DModel)
    _module("diffusers.models.transformer_2d",
            Transformer2DModel=Transformer2DModel)
    diffusers = _module("diffusers", __version__="0.24.0", utils=utils,
                        models=models)
    diffusers.loaders = sys.modules["diffusers.loaders"]
    diffusers.configuration_utils = sys.modules["diffusers.configuration_utils"]

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)

    # the reference's own attention blocks become the "diffusers" ones
    # (transformer_temporal.py:22 imports TemporalBasicTransformerBlock from
    # diffusers.models.attention, then shadows BasicTransformerBlock with
    # its vendored copy at :24)
    import models.attention as ref_attention  # noqa: E402  (reference code)
    _module("diffusers.models.attention",
            BasicTransformerBlock=ref_attention.BasicTransformerBlock,
            TemporalBasicTransformerBlock=ref_attention.TemporalBasicTransformerBlock,
            FeedForward=ref_attention.FeedForward)
    _INSTALLED = True
