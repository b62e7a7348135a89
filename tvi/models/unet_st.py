"""UNetSpatioTemporalConditionModel — the SVD denoiser, TPU-native.

From-scratch rebuild of reference
src/models/unet_spatio_temporal_condition.py:65-908 with the fork's custom
deltas (SURVEY §2.1):
  (a) learnable ``mask_token`` parameter, shape (4,) here — the reference's
      nn.Parameter(randn(1,1,4,1,1)) at :127 broadcast over (B,F,H,W);
  (b) 9 input channels (8 SVD + 1 binary mask channel, :703-707);
  (c) ``encoder_hidden_states`` may be a (spatial, temporal) tuple routed to
      spatial vs temporal cross-attention (:371,403-407);
  (d) returns (sample, intermediate_features) — up-block activations
      (:464-488);
  (e) ControlNet residual injection on the skip stack and mid block
      (:446-451,460-461).

Layout: sample is (B, F, H, W, C) NHWC video latents; internally flattened
to (B*F, H, W, C).  Timesteps are continuous EDM timesteps (0.25*log sigma).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvi.core.config import UNetConfig
from tvi.models.layers import TimestepEmbedding, get_timestep_embedding, gn_groups
from tvi.models.unet_blocks import (
    CrossAttnDownBlockSpatioTemporal,
    CrossAttnUpBlockSpatioTemporal,
    DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
    UpBlockSpatioTemporal,
)


def _remat_policy():
    """Rematerialization policy for the per-block ``nn.remat`` wrappers.

    TVI_REMAT_POLICY is a trace-time knob (read in flax ``__call__``, like
    TVI_ABLATE — set before the train step is traced, one process per
    variant):

    - ``full`` (default): save nothing inside a block — maximum memory
      saving, the backward pays a full block-forward recompute.  This is
      the configuration the 2.50 s / 14.41 GB baseline was measured at.
    - ``convs`` / ``convs2``: additionally save every (/ only the second)
      resnet conv output (tagged ``conv1_out``/``conv2_out`` in
      resnet.py) — skips recomputing the conv forwards, which dominate
      the training step (PERF.md r4 s10: convs ≈ 52%), at the cost of the
      saved activations living until the backward.
    - ``dots``: save dot_general outputs with no batch dims (transformer
      GEMMs) — skips attention/FF projection recompute.

    Policies change memory/time only, never values: grads are identical
    (tests/test_train_step.py::test_remat_policy_grads_match).
    """
    import os

    mode = os.environ.get("TVI_REMAT_POLICY", "full")
    if mode in ("", "full"):
        return None
    cp = jax.checkpoint_policies
    if mode == "convs":
        return cp.save_only_these_names("conv1_out", "conv2_out")
    if mode == "convs2":
        return cp.save_only_these_names("conv2_out")
    if mode == "dots":
        return cp.checkpoint_dots_with_no_batch_dims
    raise ValueError(f"TVI_REMAT_POLICY={mode!r} not in full/convs/convs2/dots")


class UNetSpatioTemporalConditionModel(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # rematerialize each down/mid/up block on the backward pass instead of
    # saving its activations — the TPU-idiomatic equivalent of the
    # reference's per-block gradient-checkpointing branches
    # (unet_3d_blocks.py:2032-2054) and trainer toggle (train.py:377-379).
    gradient_checkpointing: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,               # (B, F, H, W, Cin)
        timestep: jax.Array,             # scalar or (B,)
        encoder_hidden_states: Union[jax.Array, Tuple[jax.Array, jax.Array]],
        added_time_ids: jax.Array,       # (B, 3)
        down_block_residuals: Optional[Sequence[jax.Array]] = None,
        mid_block_residual: Optional[jax.Array] = None,
        use_temporal_attention_bias: bool = False,
        want_stats: bool = False,
    ):
        cfg = self.config
        batch_size, num_frames = sample.shape[0], sample.shape[1]

        # 1. time embeddings (reference :391-398)
        timesteps = jnp.broadcast_to(jnp.atleast_1d(timestep), (batch_size,))
        t_emb = get_timestep_embedding(timesteps, cfg.block_out_channels[0]).astype(self.dtype)
        time_embed_dim = cfg.block_out_channels[0] * 4
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="time_embedding")(t_emb)
        add_embeds = get_timestep_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(batch_size, -1).astype(self.dtype)
        aug_emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                    param_dtype=self.param_dtype, name="add_embedding")(add_embeds)
        emb = emb + aug_emb
        emb = jnp.repeat(emb, num_frames, axis=0)  # (B*F, D)

        # conditioning stays per-batch; blocks broadcast per frame/pixel
        if isinstance(encoder_hidden_states, tuple):
            ctx = tuple(c.astype(self.dtype) for c in encoder_hidden_states)
        else:
            ctx = encoder_hidden_states.astype(self.dtype)

        # 2. conv_in (reference :412)
        sample = sample.reshape((batch_size * num_frames,) + sample.shape[2:]).astype(self.dtype)
        sample = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="conv_in")(sample)

        # 3. down blocks (reference :424-444)
        if self.gradient_checkpointing:
            # static_argnums: num_frames / flag args; flax counts the module
            # instance itself as argument 0
            policy = _remat_policy()
            CrossAttnDown = nn.remat(CrossAttnDownBlockSpatioTemporal,
                                     static_argnums=(4, 5, 6), policy=policy)
            Down = nn.remat(DownBlockSpatioTemporal, static_argnums=(3,),
                            policy=policy)
            Mid = nn.remat(UNetMidBlockSpatioTemporal, static_argnums=(4, 5, 6),
                           policy=policy)
            CrossAttnUp = nn.remat(CrossAttnUpBlockSpatioTemporal,
                                   static_argnums=(5, 6, 7), policy=policy)
            Up = nn.remat(UpBlockSpatioTemporal, static_argnums=(4,),
                          policy=policy)
        else:
            CrossAttnDown = CrossAttnDownBlockSpatioTemporal
            Down = DownBlockSpatioTemporal
            Mid = UNetMidBlockSpatioTemporal
            CrossAttnUp = CrossAttnUpBlockSpatioTemporal
            Up = UpBlockSpatioTemporal
        down_res_samples: List[jax.Array] = [sample]
        for i, block_type in enumerate(cfg.down_block_types):
            is_final = i == cfg.num_blocks - 1
            out_ch = cfg.block_out_channels[i]
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                sample, res = CrossAttnDown(
                    out_channels=out_ch, heads=cfg.num_attention_heads[i],
                    num_layers=cfg.layers_per_block,
                    transformer_layers=cfg.transformer_layers_per_block,
                    add_downsample=not is_final, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"down_blocks_{i}",
                )(sample, emb, ctx, num_frames, use_temporal_attention_bias, want_stats)
            else:
                sample, res = Down(
                    out_channels=out_ch, num_layers=cfg.layers_per_block,
                    add_downsample=not is_final, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"down_blocks_{i}",
                )(sample, emb, num_frames)
            down_res_samples.extend(res)

        # ControlNet skip-stack injection (reference :446-451)
        if down_block_residuals is not None:
            down_res_samples = [s + r for s, r in zip(down_res_samples, down_block_residuals)]

        # 4. mid (reference :455-461)
        sample = Mid(
            in_channels=cfg.block_out_channels[-1],
            heads=cfg.num_attention_heads[-1],
            transformer_layers=cfg.transformer_layers_per_block,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mid_block",
        )(sample, emb, ctx, num_frames, use_temporal_attention_bias, want_stats)
        if mid_block_residual is not None:
            sample = sample + mid_block_residual

        # 5. up blocks, collecting intermediate features (reference :464-488)
        intermediate_features: List[jax.Array] = []
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == cfg.num_blocks - 1
            out_ch = rev_channels[i]
            n_res = cfg.layers_per_block + 1
            res = tuple(down_res_samples[-n_res:])
            down_res_samples = down_res_samples[:-n_res]
            head_idx = cfg.num_blocks - 1 - i
            if block_type == "CrossAttnUpBlockSpatioTemporal":
                sample = CrossAttnUp(
                    out_channels=out_ch, heads=cfg.num_attention_heads[head_idx],
                    num_layers=n_res,
                    transformer_layers=cfg.transformer_layers_per_block,
                    add_upsample=not is_final, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"up_blocks_{i}",
                )(sample, res, emb, ctx, num_frames,
                  use_temporal_attention_bias, want_stats)
            else:
                sample = Up(
                    out_channels=out_ch, num_layers=n_res,
                    add_upsample=not is_final, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"up_blocks_{i}",
                )(sample, res, emb, num_frames)
            intermediate_features.append(sample)

        # 6. post-process (reference :491-496)
        from tvi.models.layers import FusedGroupNorm

        sample = FusedGroupNorm(num_groups=gn_groups(cfg.block_out_channels[0]),
                                epsilon=1e-5, use_silu=True, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="conv_norm_out")(sample)
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv_out")(sample)
        sample = sample.reshape((batch_size, num_frames) + sample.shape[1:])
        return sample, intermediate_features

    @nn.nowrap
    def init_params(self, rng: jax.Array, batch: int = 1, frames: int = 2,
                    height: int = 64, width: int = 64):
        """Initialize a parameter pytree on tiny spatial shapes (parameter
        shapes are resolution-independent)."""
        cfg = self.config
        h = height // 8 * 8 // 8 or 8
        w = width // 8 * 8 // 8 or 8
        sample = jnp.zeros((batch, frames, h, w, cfg.in_channels), self.dtype)
        ctx = (jnp.zeros((batch, 2, cfg.cross_attention_dim), self.dtype),
               jnp.zeros((batch, 1, cfg.cross_attention_dim), self.dtype))
        ids = jnp.zeros((batch, 3), self.dtype)
        return self.init(rng, sample, jnp.zeros((batch,)), ctx, ids)


def make_mask_token_param(rng: jax.Array) -> jax.Array:
    """The fork's learnable mask token (reference :127:
    nn.Parameter(torch.randn(1,1,4,1,1))); stored as shape (4,) and
    broadcast into (B, F-2, H, W, 4) by the conditioning assembly."""
    return jax.random.normal(rng, (4,), dtype=jnp.float32)
