"""AutoencoderKLTemporalDecoder — the SVD VAE, TPU-native NHWC.

2D KL encoder (per-frame) + temporal decoder with (3,1,1) frame convs,
mirroring the diffusers model the reference loads at src/train.py:262-266
and drives via ``tensor_to_vae_latent`` (src/train.py:481-489) and chunked
``decode_latents`` (pipeline_stable_video_diffusion_efficient_interp.py:282-308).

Decode runs per chunk of frames under ``lax.map`` when chunking is
requested, keeping shapes static for XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvi.core.config import VAEConfig
from tvi.models.layers import Attention, FusedGroupNorm, PallasConv3x3, gn_groups
from tvi.models.resnet import ResnetBlock2D, SpatioTemporalResBlock, Upsample2D


class EncoderDownsample2D(nn.Module):
    """Asymmetric-pad stride-2 conv (diffusers encoder Downsample2D with
    padding=0 + manual (0,1,0,1) pad); inner conv named 'conv' to match the
    torch key encoder.down_blocks.N.downsamplers.0.conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, eps=1e-6, dtype=self.dtype,
                              param_dtype=self.param_dtype, name=f"resnets_{i}")(x, None)
        if self.add_downsample:
            x = EncoderDownsample2D(self.out_channels, dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name="downsamplers_0")(x)
        return x


class UNetMidBlock2D(nn.Module):
    """resnet -> attention -> resnet (per-frame 2D, diffusers UNetMidBlock2D)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, eps=1e-6, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="resnets_0")(x, None)
        b, h, w, c = x.shape
        attn_in = x.reshape(b, h * w, c)
        attn_out = Attention(heads=1, dim_head=self.channels, qkv_bias=True,
                             residual_connection=True,
                             norm_num_groups=gn_groups(self.channels), eps=1e-6,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name="attentions_0")(attn_in)
        x = attn_out.reshape(b, h, w, c)
        x = ResnetBlock2D(self.channels, eps=1e-6, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="resnets_1")(x, None)
        return x


class Encoder(nn.Module):
    """Per-frame KL encoder producing mean/logvar (diffusers Encoder with
    double_z)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (N, H, W, 3) -> (N, h, w, 8)
        cfg = self.config
        x = PallasConv3x3(cfg.block_out_channels[0], dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            x = DownEncoderBlock2D(
                ch, num_layers=cfg.layers_per_block,
                add_downsample=i < len(cfg.block_out_channels) - 1,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"down_blocks_{i}")(x)
        x = UNetMidBlock2D(cfg.block_out_channels[-1], dtype=self.dtype,
                           param_dtype=self.param_dtype, name="mid_block")(x)
        x = FusedGroupNorm(num_groups=gn_groups(cfg.block_out_channels[-1]),
                           epsilon=1e-6, use_silu=True, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="conv_norm_out")(x)
        x = PallasConv3x3(2 * cfg.latent_channels, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv_out")(x)
        return x


class MidBlockTemporalDecoder(nn.Module):
    """2 spatio-temporal resnets with a single-head full attention between
    (reference unet_3d_blocks.py:1758-1819)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int):
        st = lambda n: SpatioTemporalResBlock(
            self.channels, eps=1e-6, temporal_eps=1e-5, merge_factor=0.0,
            switch_spatial_to_temporal_mix=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name=n)
        x = st("resnets_0")(x, None, num_frames)
        b, h, w, c = x.shape
        attn_in = x.reshape(b, h * w, c)
        attn_out = Attention(heads=1, dim_head=self.channels, qkv_bias=True,
                             residual_connection=True,
                             norm_num_groups=gn_groups(self.channels), eps=1e-6,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name="attentions_0")(attn_in)
        x = attn_out.reshape(b, h, w, c)
        x = st("resnets_1")(x, None, num_frames)
        return x


class UpBlockTemporalDecoder(nn.Module):
    """3 spatio-temporal resnets + optional upsample
    (reference unet_3d_blocks.py:1821-1871)."""

    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int):
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-6, temporal_eps=1e-5, merge_factor=0.0,
                switch_spatial_to_temporal_mix=True,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resnets_{i}")(x, None, num_frames)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="upsamplers_0")(x)
        return x


class TemporalDecoder(nn.Module):
    """conv_in -> temporal mid -> temporal up blocks -> conv_out +
    time_conv_out (diffusers TemporalDecoder)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, num_frames: int) -> jax.Array:
        cfg = self.config
        x = PallasConv3x3(cfg.block_out_channels[-1], dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv_in")(z)
        x = MidBlockTemporalDecoder(cfg.block_out_channels[-1], dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name="mid_block")(x, num_frames)
        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            x = UpBlockTemporalDecoder(
                ch, num_layers=cfg.layers_per_block + 1,
                add_upsample=i < len(rev) - 1, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"up_blocks_{i}")(x, num_frames)
        x = FusedGroupNorm(num_groups=gn_groups(cfg.block_out_channels[0]),
                           epsilon=1e-6, use_silu=True, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="conv_norm_out")(x)
        x = PallasConv3x3(cfg.out_channels, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv_out")(x)
        # temporal smoothing conv over frames: (BF,H,W,C) -> (B,F,H,W,C)
        from tvi.models.resnet import TemporalConv311

        bf, h, w, c = x.shape
        x = x.reshape(bf // num_frames, num_frames, h, w, c)
        x = TemporalConv311(cfg.out_channels, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="time_conv_out")(x)
        return x.reshape(bf, h, w, c)


class AutoencoderKLTemporalDecoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.decoder = TemporalDecoder(self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        # top-level like the torch model (AutoencoderKLTemporalDecoder has a
        # quant_conv but no post_quant_conv)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, param_dtype=self.param_dtype)

    def encode_moments(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x: (N, H, W, 3) -> (mean, logvar), each (N, h, w, 4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_mode(self, x: jax.Array) -> jax.Array:
        """Deterministic encode — latent_dist.mode() as used for
        conditioning latents (pipeline:231-252, train.py:540-544)."""
        mean, _ = self.encode_moments(x)
        return mean

    def encode_sample(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        """latent_dist.sample() as used for video latents
        (train.py ``tensor_to_vae_latent``)."""
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, z: jax.Array, num_frames: int) -> jax.Array:
        """z: (N=F*chunkB, h, w, 4) unscaled latents -> (N, H, W, 3)."""
        return self.decoder(z, num_frames)

    def __call__(self, x: jax.Array, num_frames: int = 1):
        """Autoencode roundtrip (init convenience)."""
        z = self.encode_mode(x)
        return self.decode(z, num_frames)
