"""Spatio-temporal resnet blocks and up/down sampling, NHWC.

From-scratch equivalents of the diffusers primitives the reference imports
at src/models/unet_3d_blocks.py:23-29 (SpatioTemporalResBlock, Downsample2D,
Upsample2D, TemporalResnetBlock).  Hidden states are (B*F, H, W, C); the
temporal resnet reshapes to (B, F, H, W, C) and convolves frames with a
(3,1,1) kernel — on TPU this lowers to an MXU-friendly grouped matmul over
the frame axis.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvi.models.layers import AlphaBlender, FusedGroupNorm, PallasConv3x3, gn_groups
from tvi.utils.ablate import ablated


def _ckpt_tag(x: jax.Array, name: str) -> jax.Array:
    """``jax.ad_checkpoint.checkpoint_name`` tag for the named-save remat
    policies (TVI_REMAT_POLICY=convs/convs2, unet_st._remat_policy).  Gated
    on the knob at trace time so the default serving/training graphs stay
    byte-identical when no named policy is active."""
    import os

    if "convs" in os.environ.get("TVI_REMAT_POLICY", ""):
        from jax.ad_checkpoint import checkpoint_name
        return checkpoint_name(x, name)
    return x


class TemporalConv311(nn.Module):
    """(3,1,1) conv over the frame axis of (B, F, H, W, C), computed as
    three frame-shifted matmuls instead of a 3-D convolution.

    Measured (perf_lab dec_tconv_*): XLA's native (3,1,1) conv lowering WINS
    — 2787 ms/decode vs 3256 ms for the frame-shifted-matmul form (the three
    shifted views materialize extra intermediates).  The XLA conv is
    therefore the default; TVI_TEMPORAL_CONV=matmul keeps the matmul form
    for A/B.  Parameter tree is identical to nn.Conv with kernel (3,1,1)
    (kernel (3,1,1,C,Co) + bias), so torch conversion (decoder time-conv
    keys) is unchanged.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, F, H, W, C)
        import os

        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=-2, out_axis=-1),
            (3, 1, 1, c, self.out_channels), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,), self.param_dtype)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        b_ = bias.astype(self.dtype)
        if os.environ.get("TVI_TEMPORAL_CONV", "xla") == "xla":
            dn = jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), ((1, 1), (0, 0), (0, 0)), dimension_numbers=dn)
            return y + b_
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        w0, w1, w2 = k[0, 0, 0], k[1, 0, 0], k[2, 0, 0]   # (C, Co) each
        f = x.shape[1]
        y = (jnp.einsum("bfhwc,co->bfhwo", xp[:, :f], w0)
             + jnp.einsum("bfhwc,co->bfhwo", xp[:, 1:f + 1], w1)
             + jnp.einsum("bfhwc,co->bfhwo", xp[:, 2:f + 2], w2))
        return y + b_


class ResnetBlock2D(nn.Module):
    """GN32 -> SiLU -> conv3x3 -> (+time emb) -> GN32 -> SiLU -> conv3x3,
    1x1 shortcut when channels change (diffusers ResnetBlock2D)."""

    out_channels: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        in_channels = x.shape[-1]
        # GN(+SiLU) params are handed to the conv module, which fuses the
        # apply pass into the v3 Pallas kernel's prologue when
        # TVI_PALLAS_CONV=2 and the shape is decode-eligible (identical
        # unfused math otherwise).  Param tree unchanged.
        s1, b1 = FusedGroupNorm(num_groups=gn_groups(in_channels), epsilon=self.eps,
                                use_silu=True, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="norm1")(
                                    x, return_params=True)
        h = _ckpt_tag(
            PallasConv3x3(self.out_channels, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv1")(
                              x, gn=(s1, b1, gn_groups(in_channels), self.eps)),
            "conv1_out")
        if temb is not None:
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="time_emb_proj")(nn.silu(temb))
            h = h + temb_proj[:, None, None, :]
        s2, b2 = FusedGroupNorm(num_groups=gn_groups(self.out_channels), epsilon=self.eps,
                                use_silu=True, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="norm2")(
                                    h, return_params=True)
        h = _ckpt_tag(
            PallasConv3x3(self.out_channels, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv2")(
                              h, gn=(s2, b2, gn_groups(self.out_channels), self.eps)),
            "conv2_out")
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """Resnet over the frame axis with (3,1,1) convs (diffusers
    TemporalResnetBlock).  Input (B, F, H, W, C)."""

    out_channels: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        in_channels = x.shape[-1]
        conv3 = lambda n: TemporalConv311(self.out_channels, dtype=self.dtype,
                                          param_dtype=self.param_dtype, name=n)
        h = FusedGroupNorm(num_groups=gn_groups(in_channels), epsilon=self.eps,
                           use_silu=True, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="norm1")(x)
        h = _ckpt_tag(conv3("conv1")(h), "conv1_out")
        if temb is not None:
            # temb: (B, F, temb_ch) -> (B, F, 1, 1, C)
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="time_emb_proj")(nn.silu(temb))
            h = h + temb_proj[:, :, None, None, :]
        h = FusedGroupNorm(num_groups=gn_groups(self.out_channels), epsilon=self.eps,
                           use_silu=True, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="norm2")(h)
        h = _ckpt_tag(conv3("conv2")(h), "conv2_out")
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """Spatial resnet + temporal resnet + learned alpha blend (diffusers
    SpatioTemporalResBlock; structure confirmed against the calls at
    unet_3d_blocks.py:1897-1918,2002,2100,2224,2323)."""

    out_channels: int
    eps: float = 1e-5
    temporal_eps: Optional[float] = None
    merge_factor: float = 0.5
    # diffusers default False (UNet ST resblocks,
    # unet_3d_blocks.py:1893-1918: out = sigmoid(mix)*spatial +
    # (1-sig)*temporal); the VAE temporal-decoder blocks pass True
    # (:1775-1784).  Anchored by tests/test_reference_blocks.py — the
    # pre-round-3 hardcoded True inverted the UNet blend orientation.
    switch_spatial_to_temporal_mix: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array], num_frames: int) -> jax.Array:
        bf, height, width, _ = x.shape
        batch = bf // num_frames
        h = ResnetBlock2D(self.out_channels, eps=self.eps, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="spatial_res_block")(x, temb)

        if ablated("temporal_resnet"):
            return h
        c = h.shape[-1]
        h_spatial = h.reshape(batch, num_frames, height, width, c)
        temb_t = temb.reshape(batch, num_frames, -1) if temb is not None else None
        h_temporal = TemporalResnetBlock(
            self.out_channels, eps=self.temporal_eps or self.eps,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="temporal_res_block")(h_spatial, temb_t)
        h = AlphaBlender(alpha=self.merge_factor,
                         switch_spatial_to_temporal_mix=self.switch_spatial_to_temporal_mix,
                         param_dtype=self.param_dtype,
                         name="time_mixer")(h_spatial, h_temporal)
        return h.reshape(bf, height, width, c)


class Downsample2D(nn.Module):
    """conv3x3 stride-2, padding 1 (diffusers Downsample2D with use_conv)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, param_dtype=self.param_dtype, name="conv")(x)


class Upsample2D(nn.Module):
    """2x nearest upsample + conv3x3 (diffusers Upsample2D with use_conv)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return PallasConv3x3(self.out_channels, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="conv")(x)
