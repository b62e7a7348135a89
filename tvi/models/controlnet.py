"""ControlNetSVDModel — trajectory/depth ControlNet for the SVD UNet.

Rebuild of reference src/models/controlnet_svd.py:62-740 (and the
subproject's depth variant controlnet_sdv2.py:119 — same architecture minus
the point kwargs): the UNet encoder (conv_in, time embeddings, down blocks,
mid block) plus
  - a 4-conv conditioning embedding with zero-init output conv
    (ControlNetConditioningEmbeddingSVD, :62-114), added to the conv_in
    activation (:480-484),
  - zero-init 1x1 ``controlnet_down_blocks`` per skip state (:262-296) and a
    zero-init ``controlnet_mid_block`` (:298-302),
  - per-residual ``conditioning_scale`` multiplier (:520-523).

Outputs feed UNet forward's residual-injection points
(unet_spatio_temporal_condition.py:446-461).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvi.core.config import ControlNetConfig
from tvi.models.layers import TimestepEmbedding, get_timestep_embedding
from tvi.models.unet_blocks import (
    CrossAttnDownBlockSpatioTemporal,
    DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
)

zeros_init = nn.initializers.zeros


class ControlNetConditioningEmbeddingSVD(nn.Module):
    """conv_in -> 3x(conv3x3, conv3x3 stride2) with SiLU -> zero-init conv_out
    (reference controlnet_svd.py:62-114).  Input is the flattened heatmap
    video (B*F, H, W, C_cond)."""

    embedding_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conditioning: jax.Array) -> jax.Array:
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(conditioning)
        x = nn.silu(x)
        for i in range(len(self.block_out_channels) - 1):
            x = nn.Conv(self.block_out_channels[i], (3, 3), padding=1,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(self.block_out_channels[i + 1], (3, 3), strides=(2, 2),
                        padding=1, dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        x = nn.Conv(self.embedding_channels, (3, 3), padding=1,
                    kernel_init=zeros_init, bias_init=zeros_init,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv_out")(x)
        return x


class ControlNetSVDModel(nn.Module):
    config: ControlNetConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,                    # (B, F, h, w, Cin) noisy latents
        timestep: jax.Array,
        encoder_hidden_states,                # array or (spatial, temporal) tuple
        added_time_ids: jax.Array,            # (B, 3)
        controlnet_cond: jax.Array,           # (B, F, H, W, C_cond) heatmap video
        conditioning_scale: Union[float, jax.Array] = 1.0,
    ):
        cfg = self.config
        batch_size, num_frames = sample.shape[0], sample.shape[1]

        # time embeddings — identical to the UNet (controlnet_svd.py:452-478)
        timesteps = jnp.broadcast_to(jnp.atleast_1d(timestep), (batch_size,))
        t_emb = get_timestep_embedding(timesteps, cfg.block_out_channels[0]).astype(self.dtype)
        time_embed_dim = cfg.block_out_channels[0] * 4
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="time_embedding")(t_emb)
        add_embeds = get_timestep_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(batch_size, -1).astype(self.dtype)
        emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                      param_dtype=self.param_dtype,
                                      name="add_embedding")(add_embeds)
        emb = jnp.repeat(emb, num_frames, axis=0)

        if isinstance(encoder_hidden_states, tuple):
            ctx = tuple(c.astype(self.dtype) for c in encoder_hidden_states)
        else:
            ctx = encoder_hidden_states.astype(self.dtype)

        sample = sample.reshape((batch_size * num_frames,) + sample.shape[2:]).astype(self.dtype)
        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv_in")(sample)

        # heatmap-video embedding added post conv_in (controlnet_svd.py:480-484)
        cond = controlnet_cond.reshape(
            (batch_size * num_frames,) + controlnet_cond.shape[2:]).astype(self.dtype)
        sample = sample + ControlNetConditioningEmbeddingSVD(
            embedding_channels=cfg.block_out_channels[0],
            block_out_channels=cfg.conditioning_embedding_out_channels,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="controlnet_cond_embedding")(cond)

        down_res_samples: List[jax.Array] = [sample]
        for i, block_type in enumerate(cfg.down_block_types):
            is_final = i == len(cfg.block_out_channels) - 1
            out_ch = cfg.block_out_channels[i]
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                sample, res = CrossAttnDownBlockSpatioTemporal(
                    out_channels=out_ch, heads=cfg.num_attention_heads[i],
                    num_layers=cfg.layers_per_block,
                    transformer_layers=cfg.transformer_layers_per_block,
                    add_downsample=not is_final, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"down_blocks_{i}",
                )(sample, emb, ctx, num_frames)
            else:
                sample, res = DownBlockSpatioTemporal(
                    out_channels=out_ch, num_layers=cfg.layers_per_block,
                    add_downsample=not is_final, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"down_blocks_{i}",
                )(sample, emb, num_frames)
            down_res_samples.extend(res)

        sample = UNetMidBlockSpatioTemporal(
            in_channels=cfg.block_out_channels[-1],
            heads=cfg.num_attention_heads[-1],
            transformer_layers=cfg.transformer_layers_per_block,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mid_block",
        )(sample, emb, ctx, num_frames)

        # zero-init 1x1 output convs (controlnet_svd.py:262-302)
        conv1x1 = lambda ch, n: nn.Conv(ch, (1, 1), kernel_init=zeros_init,
                                        bias_init=zeros_init, dtype=self.dtype,
                                        param_dtype=self.param_dtype, name=n)
        down_block_res = tuple(
            conv1x1(s.shape[-1], f"controlnet_down_blocks_{i}")(s) * conditioning_scale
            for i, s in enumerate(down_res_samples)
        )
        mid_res = conv1x1(sample.shape[-1], "controlnet_mid_block")(sample) * conditioning_scale
        return down_block_res, mid_res
