"""SVD UNet down/mid/up blocks (reference unet_3d_blocks.py:1872-2404).

Gradient checkpointing is applied at the UNet level with ``nn.remat`` rather
than per-branch flags (the TPU-idiomatic rematerialization).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvi.models.resnet import Downsample2D, SpatioTemporalResBlock, Upsample2D
from tvi.models.transformer_temporal import TransformerSpatioTemporalModel


class DownBlockSpatioTemporal(nn.Module):
    """num_layers resnets (+ optional downsample); returns skip states
    (reference unet_3d_blocks.py:1983-2072)."""

    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, num_frames: int):
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(hidden_states, temb, num_frames)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(self.out_channels, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name="downsamplers_0")(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    """[resnet, transformer] x num_layers (+ downsample)
    (reference unet_3d_blocks.py:2073-2199)."""

    out_channels: int
    heads: int
    num_layers: int = 2
    transformer_layers: int = 1
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, encoder_hidden_states, num_frames: int,
                 use_temporal_attention_bias: bool = False, want_stats: bool = False):
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = SpatioTemporalResBlock(
                self.out_channels, eps=1e-6, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(hidden_states, temb, num_frames)
            hidden_states = TransformerSpatioTemporalModel(
                heads=self.heads, dim_head=self.out_channels // self.heads,
                num_layers=self.transformer_layers, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"attentions_{i}",
            )(hidden_states, num_frames, encoder_hidden_states,
              use_temporal_attention_bias, want_stats)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(self.out_channels, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name="downsamplers_0")(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlockSpatioTemporal(nn.Module):
    """resnet -> [transformer -> resnet] x num_layers
    (reference unet_3d_blocks.py:1872-1982)."""

    in_channels: int
    heads: int
    num_layers: int = 1
    transformer_layers: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, encoder_hidden_states, num_frames: int,
                 use_temporal_attention_bias: bool = False, want_stats: bool = False):
        hidden_states = SpatioTemporalResBlock(
            self.in_channels, eps=1e-5, dtype=self.dtype,
            param_dtype=self.param_dtype, name="resnets_0",
        )(hidden_states, temb, num_frames)
        for i in range(self.num_layers):
            hidden_states = TransformerSpatioTemporalModel(
                heads=self.heads, dim_head=self.in_channels // self.heads,
                num_layers=self.transformer_layers, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"attentions_{i}",
            )(hidden_states, num_frames, encoder_hidden_states,
              use_temporal_attention_bias, want_stats)
            hidden_states = SpatioTemporalResBlock(
                self.in_channels, eps=1e-5, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"resnets_{i + 1}",
            )(hidden_states, temb, num_frames)
        return hidden_states


class UpBlockSpatioTemporal(nn.Module):
    """num_layers resnets consuming skip connections (+ optional upsample)
    (reference unet_3d_blocks.py:2200-2288)."""

    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb, num_frames: int):
        for i in range(self.num_layers):
            res = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(hidden_states, temb, num_frames)
        if self.add_upsample:
            hidden_states = Upsample2D(self.out_channels, dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name="upsamplers_0")(hidden_states)
        return hidden_states


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    """[skip-concat resnet, transformer] x num_layers (+ upsample)
    (reference unet_3d_blocks.py:2289-2404)."""

    out_channels: int
    heads: int
    num_layers: int = 3
    transformer_layers: int = 1
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb,
                 encoder_hidden_states, num_frames: int,
                 use_temporal_attention_bias: bool = False, want_stats: bool = False):
        for i in range(self.num_layers):
            res = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"resnets_{i}",
            )(hidden_states, temb, num_frames)
            hidden_states = TransformerSpatioTemporalModel(
                heads=self.heads, dim_head=self.out_channels // self.heads,
                num_layers=self.transformer_layers, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"attentions_{i}",
            )(hidden_states, num_frames, encoder_hidden_states,
              use_temporal_attention_bias, want_stats)
        if self.add_upsample:
            hidden_states = Upsample2D(self.out_channels, dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name="upsamplers_0")(hidden_states)
        return hidden_states
