"""Shared flax.linen layers: sinusoidal embeddings, MLPs, GEGLU feed-forward,
alpha blending, and the generic Attention module.

These are from-scratch TPU-native (NHWC / seq-last-dim) implementations of
the behaviors in the reference's vendored diffusers primitives:
  - Timesteps / TimestepEmbedding (used at unet_spatio_temporal_condition.py:391-398)
  - FeedForward + GEGLU (src/models/attention.py:481-535)
  - AlphaBlender (imported at src/models/unet_3d_blocks.py:23-29)
  - Attention + AttnProcessor2_0 (src/models/attention_processor.py:38,1178)
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvi.ops.attention import dot_product_attention, temporal_4d_enabled


def gn_groups(channels: int, target: int = 32) -> int:
    """GroupNorm group count: 32 for all real model widths (every reference
    channel count is a multiple of 32); falls back to gcd for the thin test
    configs."""
    import math as _math
    return _math.gcd(target, channels)


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jax.Array:
    """Sinusoidal timestep embedding (diffusers semantics, flip_sin_to_cos
    and shift=0 as configured in the SVD UNet)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class FusedGroupNorm(nn.Module):
    """Drop-in nn.GroupNorm replacement (same param structure: scale/bias of
    shape (C,)) using the TPU-friendly per-channel-first formulation of
    tvi.ops.groupnorm, with an optional fused SiLU epilogue (the diffusers
    resnets always compute GN->SiLU back to back)."""

    num_groups: int
    epsilon: float = 1e-5
    use_silu: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_params: bool = False):
        from tvi.ops.groupnorm import group_norm_silu

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if return_params:
            # caller fuses the GN(+SiLU) elsewhere (e.g. into a conv
            # kernel's prologue); param tree unchanged
            return scale, bias
        return group_norm_silu(x.astype(self.dtype), scale, bias,
                               self.num_groups, eps=self.epsilon,
                               apply_silu=self.use_silu)


class TimestepEmbedding(nn.Module):
    """linear -> silu -> linear (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="linear_1")(sample)
        sample = nn.silu(sample)
        out_dim = self.out_dim or self.time_embed_dim
        sample = nn.Dense(out_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="linear_2")(sample)
        return sample


def serve_int8() -> bool:
    """Opt-in W8A8 serving mode (TVI_SERVE_INT8=1, read at trace time):
    transformer matmuls run int8 x int8 -> int32 on the MXU (~2x bf16 peak
    on v5e).  Never used for training; the headline bench stays bf16 unless
    explicitly requested.  See tvi/ops/quant.py for the numerics."""
    import os

    return bool(os.environ.get("TVI_SERVE_INT8"))


class MaybeQuantDense(nn.Module):
    """nn.Dense-compatible module ({kernel, bias} tree) that routes to the
    W8A8 path under serving mode.  Weights quantize on the fly inside the
    program (per-column scales; negligible next to activation traffic), so
    checkpoints and the param tree are completely unchanged."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_params: bool = False):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        if return_params:
            # caller consumes the raw weights (e.g. the fused whole-FF
            # kernel); x only supplies the input feature dim
            return kernel, bias
        x = x.astype(self.dtype)
        if serve_int8():
            from tvi.ops.quant import dense_w8a8, quantize_cols

            wi, ws = quantize_cols(kernel)
            return dense_w8a8(x, wi, ws, bias=bias, out_dtype=self.dtype)
        y = x @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class _GegluProj(nn.Module):
    """GEGLU input projection with the same param layout as a Dense
    (kernel (K, 2N) + bias), dispatching to the fused Pallas kernel on TPU
    (tvi/ops/pallas_geglu.py — avoids materializing the (M, 2N)
    intermediate; measured 1.8x over the XLA unfused path at the headline
    FF shape)."""

    features: int  # 2 * inner
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x2d: jax.Array, return_params: bool = False):
        k = x2d.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        if return_params:
            return kernel, bias
        x2d = x2d.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)

        import os

        from tvi.ops.attention import _flash_enabled
        from tvi.ops.pallas_geglu import geglu_eligible, geglu_project

        if serve_int8():
            from tvi.ops.quant import dense_w8a8, quantize_cols

            wi, ws = quantize_cols(kernel)
            proj = dense_w8a8(x2d, wi, ws, bias=bias, out_dtype=self.dtype)
        elif (_flash_enabled() and not os.environ.get("TVI_DISABLE_FUSED_GEGLU")
                and geglu_eligible(x2d.shape[0], k, self.features)):
            # TVI_GEGLU_BM: row-block override (bm1024 measured +11%
            # isolated at the headline FF shape; read at trace time)
            bm = int(os.environ.get("TVI_GEGLU_BM", 0) or 0)
            if bm and x2d.shape[0] >= bm:
                return geglu_project(x2d, kernel, bias, bm=bm)
            return geglu_project(x2d, kernel, bias)
        else:
            proj = x2d @ kernel + bias
        hidden, gate = jnp.split(proj, 2, axis=-1)
        return hidden * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU feed-forward (reference attention.py:481-535): project to
    mult*dim*2, split, x*gelu(gate), project back.

    ``pre_ln``/``residual``: the caller may hand in its LayerNorm params
    (LayerNormParams tree, identical to nn.LayerNorm) and request the
    residual add — on TPU the ENTIRE sublayer (LN -> GEGLU -> out-proj ->
    +residual) then runs as one Pallas kernel with resident weights
    (tvi/ops/pallas_fused_ff.py; measured 1.31x at C=320, 1.08x at C=640
    over the LN + geglu-kernel + XLA-matmul chain).  The fallback applies
    identical math unfused.
    """

    dim_out: Optional[int] = None
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pre_ln=None, residual: bool = False,
                 return_params: bool = False):
        import os

        dim = x.shape[-1]
        inner = dim * self.mult
        out_f = self.dim_out or dim
        lead = x.shape[:-1]
        x2 = x.reshape(-1, dim)

        from tvi.ops.attention import _flash_enabled
        from tvi.ops.pallas_fused_ff import fused_ff_eligible, fused_feedforward

        if return_params:
            # caller consumes the raw weights (the fused cross+FF kernel
            # epilogue); identical param tree, nothing applied here
            w1, b1 = _GegluProj(inner * 2, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="proj_geglu")(x2, return_params=True)
            w2, b2 = MaybeQuantDense(out_f, dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="proj_out")(
                                         jnp.zeros((1, inner), self.dtype),
                                         return_params=True)
            return w1, b1, w2, b2

        fused_ok = (
            _flash_enabled() and not serve_int8()
            and os.environ.get("TVI_FUSED_FF", "1") != "0"
            and (not residual or out_f == dim)
            and fused_ff_eligible(x2.shape[0], dim, inner * 2, out_f))
        if fused_ok:
            w1, b1 = _GegluProj(inner * 2, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="proj_geglu")(x2, return_params=True)
            w2, b2 = MaybeQuantDense(out_f, dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="proj_out")(
                                         jnp.zeros((1, inner), self.dtype),
                                         return_params=True)
            lns, lnb = pre_ln if pre_ln is not None else (None, None)
            y = fused_feedforward(x2.astype(self.dtype), lns, lnb,
                                  w1.astype(self.dtype), b1.astype(self.dtype),
                                  w2.astype(self.dtype), b2.astype(self.dtype),
                                  residual=residual)
            return y.reshape(lead + (out_f,))

        h = x
        if pre_ln is not None:
            h = layer_norm(h, pre_ln[0], pre_ln[1])
        hidden = _GegluProj(inner * 2, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="proj_geglu")(h.reshape(-1, dim))
        hidden = hidden.reshape(lead + (inner,))
        out = MaybeQuantDense(out_f, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="proj_out")(hidden)
        return out + x if residual else out


class AlphaBlender(nn.Module):
    """Learned spatial/temporal blend (diffusers AlphaBlender).

    merge_strategy 'learned_with_images' with the all-zero
    image_only_indicator the reference always passes
    (unet_spatio_temporal_condition.py:414) reduces to
    alpha = sigmoid(mix_factor); 'learned' is identical.  With
    switch_spatial_to_temporal_mix=True (SpatioTemporalResBlock), the roles
    flip: out = (1-alpha)*spatial + alpha*temporal.
    """

    alpha: float = 0.5
    switch_spatial_to_temporal_mix: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_spatial: jax.Array, x_temporal: jax.Array = None,
                 return_alpha: bool = False) -> jax.Array:
        # diffusers initializes the raw parameter to `alpha` and applies
        # sigmoid on read (AlphaBlender.get_alpha), so init 0.5 -> 0.622.
        mix_factor = self.param(
            "mix_factor",
            lambda key: jnp.full((1,), self.alpha, dtype=self.param_dtype),
        )
        a = jax.nn.sigmoid(mix_factor.astype(jnp.float32)).astype(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            a = 1.0 - a
        if return_alpha:
            # caller folds the blend elsewhere (the out4d cross kernel);
            # param tree unchanged
            return a
        return a * x_spatial + (1.0 - a) * x_temporal


class PallasConv3x3(nn.Module):
    """nn.Conv(features, (3,3), padding=1)-compatible module ({kernel,
    bias} tree, same shapes) that routes to the Pallas nine-matmul conv
    (tvi/ops/pallas_conv.py) under TVI_PALLAS_CONV=1 on TPU.  XLA's conv
    lowering measures only 43-78 TFLOP/s at every shape in this model on a
    chip sustaining ~1300 on matmuls (scripts/perf_lab.py conv_*); the
    Pallas path feeds the MXU with VMEM-resident shifted windows."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, gn=None) -> jax.Array:
        """gn: optional (scale, bias, num_groups, eps) — computes
        conv3x3(silu(group_norm(x))), fusing GN-apply+SiLU into the v3
        Pallas kernel's prologue under TVI_PALLAS_CONV=2 (decode-shape
        eligible), otherwise falling back to the unfused identical math."""
        import os

        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        mode = os.environ.get("TVI_PALLAS_CONV") \
            if jax.default_backend() not in ("cpu",) else None
        lead = x.shape[:-3]
        x4 = x.reshape((-1,) + x.shape[-3:])
        if gn is not None:
            gn_scale, gn_bias, gn_groups_, gn_eps = gn
            if mode == "2":
                from tvi.ops.pallas_conv import (
                    conv3x3_v3_eligible,
                    group_norm_silu_conv3x3,
                )

                if conv3x3_v3_eligible(x4.shape, self.features):
                    out = group_norm_silu_conv3x3(
                        x4, gn_scale, gn_bias, gn_groups_, kernel, bias,
                        eps=gn_eps)
                    return out.reshape(lead + out.shape[1:])
            from tvi.ops.groupnorm import group_norm_silu

            x = group_norm_silu(x, gn_scale, gn_bias, gn_groups_, eps=gn_eps)
            x4 = x.reshape((-1,) + x.shape[-3:])
        if mode:
            from tvi.ops.pallas_conv import conv3x3_eligible, conv3x3_pallas

            if conv3x3_eligible(x4.shape, self.features):
                out = conv3x3_pallas(x4, kernel, bias)
                return out.reshape(lead + out.shape[1:])
        return jax.lax.conv_general_dilated(
            x4, kernel,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        ).reshape(lead + x4.shape[1:-1] + (self.features,)) + bias


class LayerNormParams(nn.Module):
    """Owns a LayerNorm's {scale, bias} (identical tree to nn.LayerNorm)
    without binding the normalization, so the caller can either apply it
    functionally or hand it to a fused Pallas kernel
    (tvi/ops/pallas_fused_spatial.py)."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return scale, bias


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """Functional LayerNorm over the last dim (fp32 stats and affine,
    matching flax nn.LayerNorm use_fast_variance semantics)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class _DenseParams(nn.Module):
    """Owns a Dense layer's parameters (identical tree: kernel [+ bias])
    without binding the matmul, so callers can either apply them inline or
    hand them to a fused Pallas kernel."""

    features: int
    in_features: int
    use_bias: bool
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        return kernel, bias


class Attention(nn.Module):
    """Multi-head attention with separate q and kv inputs.

    Mirrors the behavior of the reference's Attention + AttnProcessor2_0
    (attention_processor.py:38,1178): linear q/k/v without bias (except VAE
    attention, qkv_bias=True), to_out with bias, optional pre-GroupNorm and
    residual connection (VAE mid attention).  ``bias``/``want_stats`` expose
    the temporal-bias-mask and attention-statistics features (see
    tvi.ops.attention).

    Frame-axis self-attention (3-D input with a tiny middle dim — the
    temporal blocks' (B*H*W, F, C) layout) dispatches on TPU to the fused
    QKV+attention+out-projection kernel (tvi/ops/pallas_fused_temporal.py),
    which keeps the whole sublayer's intermediates in VMEM.

    On the TPU serving path the caller can hand in neighbouring sublayers
    as raw params and this module folds them into the attention kernels
    (each with a functional fallback of identical math):

    - ``pre_ln`` + ``residual_add``: LayerNorm + sublayer residual (v5
      spatial kernel / fused temporal kernel / fused cross kernel).
    - ``in_proj`` (+ ``in_gn``): the spatial transformer's proj_in (and
      GroupNorm apply, as a precomputed per-instance affine) as the v5
      kernel's prologue.
    - ``pre_ff``: the temporal block's ff_in GEGLU sublayer as the fused
      temporal kernel's prologue.
    - ``post_ff``: the block's norm3 + GEGLU FF as the fused cross
      kernel's epilogue.
    """

    heads: int
    dim_head: int
    out_dim: Optional[int] = None
    qkv_bias: bool = False
    residual_connection: bool = False
    norm_num_groups: Optional[int] = None
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,                      # (B, Sq, C)
        encoder_hidden_states: Optional[jax.Array] = None,  # (B or G, Sk, Ck)
        bias: Optional[jax.Array] = None,
        want_stats: bool = False,
        pre_ln: Optional[Tuple[jax.Array, jax.Array]] = None,
        residual_add: bool = False,
        in_proj: Optional[Tuple[jax.Array, jax.Array]] = None,
        in_gn: Optional[Tuple[jax.Array, jax.Array]] = None,
        post_ff: Optional[Tuple] = None,
        pre_ff: Optional[Tuple] = None,
        in_4d: Optional[Tuple[jax.Array, jax.Array]] = None,
        out4d: Optional[Tuple] = None,
    ):
        import os

        from tvi.ops.attention import _flash_enabled
        from tvi.ops.pallas_attention import _default_shift as _default_attn_shift
        from tvi.ops.pallas_fused_spatial import (
            fused_spatial_eligible,
            fused_spatial_self_attention,
        )
        from tvi.ops.pallas_fused_temporal import (
            fused_temporal_eligible,
            fused_temporal_self_attention,
        )

        residual = hidden_states
        if self.norm_num_groups is not None:
            hidden_states = FusedGroupNorm(
                num_groups=self.norm_num_groups, epsilon=self.eps,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="group_norm")(hidden_states)

        inner_ = self.heads * self.dim_head
        fused_spatial_ok = (
            encoder_hidden_states is None and bias is None and not want_stats
            and not self.residual_connection and not residual_add
            and self.norm_num_groups is None
            and hidden_states.ndim == 3 and hidden_states.shape[1] > 64
            and self.dim_head == 64 and _flash_enabled() and not serve_int8()
            and bool(os.environ.get("TVI_FUSED_SPATIAL"))
            and fused_spatial_eligible(
                hidden_states.shape[0], hidden_states.shape[1],
                hidden_states.shape[2], self.heads, inner_, self.qkv_bias))

        inner = self.heads * self.dim_head
        out_features = self.out_dim or (
            in_proj[0].shape[-1] if in_proj is not None else residual.shape[-1])

        # Small-context cross-attention (attn2: 3 CLIP/projector tokens
        # spatially, 2 first-frame tokens temporally): the q/out
        # projections are thin-N matmuls on XLA's ~17.6 TF/s cliff, so the
        # whole sublayer (LN + q-proj + attn + out-proj + residual) runs as
        # one Pallas kernel (tvi/ops/pallas_fused_cross.py).  The context
        # may arrive GROUPED — shape (G, S_ctx, D) with G dividing the
        # hidden batch: every B'/G consecutive hidden rows share one
        # context row-group (the temporal path passes the compact
        # per-CFG-batch context instead of a per-pixel broadcast).
        fused_cross_ok = False
        fused_cross_ff = False
        if (encoder_hidden_states is not None and bias is None
                and not want_stats and not self.residual_connection
                and self.norm_num_groups is None and not serve_int8()
                and hidden_states.ndim == 3
                and encoder_hidden_states.ndim == 3
                and self.dim_head == 64 and not self.qkv_bias
                and _flash_enabled()
                and not os.environ.get("TVI_DISABLE_FUSED_CROSS")
                and hidden_states.shape[0] % encoder_hidden_states.shape[0] == 0):
            from tvi.ops.pallas_fused_cross import fused_cross_eligible

            bsz, seq, cdim = hidden_states.shape
            g = encoder_hidden_states.shape[0]
            rpg = (bsz // g) * seq
            if post_ff is not None and not os.environ.get(
                    "TVI_DISABLE_CROSS_FF"):
                # fold the block's norm3 + GEGLU FF into the cross kernel's
                # epilogue when the FF weights fit the VMEM budget
                fused_cross_ff = residual_add and fused_cross_eligible(
                    bsz * seq, cdim, inner, out_features,
                    encoder_hidden_states.shape[1], rpg, residual_add,
                    ff_inner=post_ff[4].shape[0])
            fused_cross_ok = fused_cross_ff or (
                residual_add and fused_cross_eligible(
                    bsz * seq, cdim, inner, out_features,
                    encoder_hidden_states.shape[1], rpg, residual_add))

        def _apply_in_gn(x):
            # the caller's GroupNorm as a precomputed per-instance affine
            # (tvi/ops/groupnorm.py::group_norm_affine_params)
            a, b_ = in_gn
            return (x.astype(jnp.float32) * a + b_).astype(self.dtype)

        # Round-4 chip ladder (PERF.md): the v5 whole-sublayer fold costs
        # +236 ms/fwd and the proj_in fold +66 ms within it on real
        # hardware — v5 is OPT-IN (TVI_ATTN_V5=1), and when opted in the
        # proj_in fold needs its own opt-in (TVI_V5_PROJIN=1).
        v5_opted = (os.environ.get("TVI_ATTN_V5") == "1"
                    and not os.environ.get("TVI_DISABLE_ATTN_V5"))
        projin_standalone = bool(os.environ.get("TVI_DISABLE_V5_PROJIN")) or (
            v5_opted and os.environ.get("TVI_V5_PROJIN") != "1")
        if in_proj is not None and projin_standalone:
            # apply proj_in as a standalone XLA pass instead of the v5
            # kernel prologue (the measured-faster configuration)
            w_in, b_in = in_proj
            if in_gn is not None:
                hidden_states = _apply_in_gn(hidden_states)
                in_gn = None
            hidden_states = (hidden_states.astype(self.dtype)
                             @ w_in.astype(self.dtype)
                             + b_in.astype(self.dtype))
            residual = hidden_states
            in_proj = None

        # Spatial self-attention v5 (tvi/ops/pallas_attention_v5.py): the
        # whole sublayer (LN + QKV projections + flash + out-proj +
        # residual) as ONE kernel — on a single-core chip the LN pass and
        # the fused QKV projection pass are core-occupying XLA ops that
        # async DMA cannot hide (~10 ms/layer at level 0, PERF.md
        # input-streaming law); v5 computes KV into a VMEM scratch at
        # q-block 0 of each batch (sequential grid) and LN+Q per block.
        fused_v5_ok = False
        if (encoder_hidden_states is None and bias is None and not want_stats
                and not self.residual_connection and residual_add
                and self.norm_num_groups is None and pre_ln is not None
                and not self.qkv_bias and not serve_int8()
                and hidden_states.ndim == 3 and hidden_states.shape[1] > 64
                and self.dim_head == 64 and _flash_enabled()
                and out_features == (in_proj[0].shape[-1]
                                     if in_proj is not None
                                     else residual.shape[-1])
                and not os.environ.get("TVI_DISABLE_ATTN_OUT")
                and v5_opted
                and _default_attn_shift() == "bound_unguarded"):
            from tvi.ops.pallas_attention_v5 import ln_attention_out_eligible

            c_blk = (in_proj[0].shape[-1] if in_proj is not None
                     else hidden_states.shape[2])
            fused_v5_ok = ln_attention_out_eligible(
                hidden_states.shape[0], hidden_states.shape[1], c_blk,
                inner, out_features, self.heads,
                c_in=hidden_states.shape[2] if in_proj is not None else 0)

        def _apply_ff_params(y, ffp):
            # a GEGLU FF sublayer (LN + GEGLU + out-proj + residual) from
            # raw params: whole-FF Pallas kernel on TPU, reference math
            # elsewhere — used for the pre_ff/post_ff fallbacks
            from tvi.ops.diffable import chunked_ff_reference
            from tvi.ops.pallas_fused_ff import (
                fused_ff_eligible,
                fused_feedforward,
            )

            lns3, lnb3, fw1, fb1, fw2, fb2 = ffp
            cast = lambda t: t.astype(self.dtype)
            y2 = y.reshape(-1, y.shape[-1]).astype(self.dtype)
            if (_flash_enabled()
                    and os.environ.get("TVI_FUSED_FF", "1") != "0"
                    and fused_ff_eligible(y2.shape[0], y2.shape[-1],
                                          fw1.shape[-1], fw2.shape[-1])):
                z = fused_feedforward(y2, lns3, lnb3, cast(fw1), cast(fb1),
                                      cast(fw2), cast(fb2), residual=True)
            else:
                z = chunked_ff_reference(y2, lns3, lnb3, cast(fw1), cast(fb1),
                                         cast(fw2), cast(fb2), residual=True)
            return z.reshape(y.shape)

        # frame-axis (tiny middle dim) self-attention with the caller's
        # norm1 + residual folded into the fused temporal kernel — kills
        # the XLA LN pass and the residual pass around the kernel
        fused_temporal_ln_ok = (
            encoder_hidden_states is None and bias is None and not want_stats
            and not self.residual_connection and residual_add
            and self.norm_num_groups is None and pre_ln is not None
            and in_proj is None and not serve_int8()
            and hidden_states.ndim == 3 and hidden_states.shape[1] <= 64
            and _flash_enabled()
            and not os.environ.get("TVI_DISABLE_FUSED_TEMPORAL")
            and not os.environ.get("TVI_DISABLE_TEMPORAL_LN")
            and fused_temporal_eligible(
                hidden_states.shape[0], hidden_states.shape[1],
                hidden_states.shape[2], inner, out_features, self.qkv_bias))

        # ff_in folded as the fused temporal kernel's GEGLU prologue
        fused_temporal_ffin_ok = False
        if (pre_ff is not None and fused_temporal_ln_ok
                and not os.environ.get("TVI_DISABLE_TEMPORAL_FFIN")):
            from tvi.ops.pallas_fused_temporal import (
                fused_temporal_ffin_eligible,
            )

            fused_temporal_ffin_ok = fused_temporal_ffin_eligible(
                hidden_states.shape[0], hidden_states.shape[1],
                hidden_states.shape[2], inner, out_features, self.qkv_bias,
                pre_ff[4].shape[0])
        if pre_ff is not None and not fused_temporal_ffin_ok:
            # apply the block's ff_in sublayer before the attention when
            # the kernel can't absorb it — identical math
            hidden_states = _apply_ff_params(hidden_states, pre_ff)
            residual = hidden_states
            pre_ff = None
            in_4d = None      # the 4D view no longer matches hidden_states

        # untransposed 4D input (default-on on TPU, kill switch
        # TVI_TEMPORAL_4D=0): the kernel absorbs the frame-pos emb add and
        # the spatial->temporal relayout; the caller's materialized
        # transpose (hidden_states) is then only consumed for trace-time
        # shapes and XLA dead-code-eliminates it
        fused_temporal_4d_ok = False
        if (in_4d is not None and fused_temporal_ln_ok
                and temporal_4d_enabled()):
            from tvi.ops.pallas_fused_temporal import (
                fused_temporal_4d_eligible,
            )

            b4, f4, s4, c4 = in_4d[0].shape
            fused_temporal_4d_ok = fused_temporal_4d_eligible(
                b4, f4, s4, c4, inner, out_features, self.qkv_bias,
                pre_ff[4].shape[0] if fused_temporal_ffin_ok else 0)

        # GN-affine + proj_in absorbed as the LN+QKV streaming kernel's
        # prologue (tvi/ops/pallas_attention_out.py::ln_qkv_projin): kills
        # the proj_in M-pass + the GN-apply materialization feeding spatial
        # attention.  Parallel row grid — structurally unlike the v5
        # proj_in fold that lost +66 ms on the chip.  DEFAULT-ON after the
        # r4 s7 chip A/B (unet_fwd −19.4 ms/fwd, parity gate 0.3% — PERF.md);
        # kill switch TVI_DISABLE_QKV_PROJIN=1.
        qkv_projin_ok = False
        if (encoder_hidden_states is None and bias is None and not want_stats
                and not self.residual_connection and residual_add
                and self.norm_num_groups is None and pre_ln is not None
                and not self.qkv_bias and not serve_int8()
                and in_proj is not None and not fused_v5_ok
                and hidden_states.ndim == 3 and hidden_states.shape[1] > 64
                and self.dim_head == 64 and _flash_enabled()
                and out_features == in_proj[0].shape[-1]
                and not os.environ.get("TVI_DISABLE_ATTN_OUT")
                and not os.environ.get("TVI_DISABLE_QKV_LN")
                and not os.environ.get("TVI_DISABLE_QKV_PROJIN")
                and _default_attn_shift() == "bound_unguarded"):
            from tvi.ops.pallas_attention_out import (
                attention_out_eligible as _ao_elig_pi,
                ln_qkv_projin_eligible as _lnpi_elig,
            )

            bsz_, seq_ = hidden_states.shape[0], hidden_states.shape[1]
            qkv_projin_ok = (
                _lnpi_elig(bsz_, seq_, hidden_states.shape[2],
                           in_proj[0].shape[-1], inner, self.heads)
                and _ao_elig_pi(bsz_, seq_, seq_, inner, out_features,
                                self.heads))

        if in_proj is not None and not fused_v5_ok and not qkv_projin_ok:
            # the caller's proj_in (TransformerSpatioTemporalModel) —
            # applied functionally when the v5 kernel can't absorb it;
            # identical math to the MaybeQuantDense apply it replaces
            w_in, b_in = in_proj
            if in_gn is not None:
                hidden_states = _apply_in_gn(hidden_states)
                in_gn = None
            hidden_states = (hidden_states.astype(self.dtype)
                             @ w_in.astype(self.dtype)
                             + b_in.astype(self.dtype))
            residual = hidden_states
            in_proj = None

        # LN + fused-QKV + split + k-norm as ONE streaming kernel feeding
        # the split v4 attention kernel (round-4 session 4, PERF.md): kills
        # the norm1 M-pass, the three qkv-split slice copies and the
        # k-norm reduction's extra k read — all serial XLA passes on a
        # single-core chip.  Parallel row grid (no v5 KV-scratch
        # serialization).  Kill switch: TVI_DISABLE_QKV_LN=1.
        qkv_ln_ok = False
        if (encoder_hidden_states is None and bias is None and not want_stats
                and not self.residual_connection and residual_add
                and self.norm_num_groups is None and pre_ln is not None
                and not self.qkv_bias and not serve_int8()
                and in_proj is None and in_gn is None and not fused_v5_ok
                and hidden_states.ndim == 3 and hidden_states.shape[1] > 64
                and self.dim_head == 64 and _flash_enabled()
                and out_features == residual.shape[-1]
                and not os.environ.get("TVI_DISABLE_ATTN_OUT")
                and not os.environ.get("TVI_DISABLE_QKV_LN")
                and _default_attn_shift() == "bound_unguarded"):
            from tvi.ops.pallas_attention_out import (
                attention_out_eligible as _ao_elig,
                ln_qkv_eligible as _lnqkv_elig,
            )

            bsz_, seq_ = hidden_states.shape[0], hidden_states.shape[1]
            qkv_ln_ok = (_lnqkv_elig(bsz_, seq_, hidden_states.shape[2],
                                     inner, self.heads)
                         and _ao_elig(bsz_, seq_, seq_, inner, out_features,
                                      self.heads))

        if (pre_ln is not None and not fused_spatial_ok and not fused_cross_ok
                and not fused_v5_ok and not fused_temporal_ln_ok
                and not qkv_ln_ok and not qkv_projin_ok):
            # the caller's LayerNorm (norm1/norm2) — applied functionally
            # here; the fused paths fold it into the kernels instead
            hidden_states = layer_norm(hidden_states, pre_ln[0], pre_ln[1])
            pre_ln = None

        if (encoder_hidden_states is not None and not fused_cross_ok
                and encoder_hidden_states.ndim == 3
                and encoder_hidden_states.shape[0] != hidden_states.shape[0]
                and hidden_states.shape[0] % encoder_hidden_states.shape[0] == 0):
            # grouped context on the unfused path: materialize the repeat
            encoder_hidden_states = jnp.repeat(
                encoder_hidden_states,
                hidden_states.shape[0] // encoder_hidden_states.shape[0],
                axis=0)

        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        # with a fused (not-yet-applied) in_proj the q/k/v input features
        # are the projection's output dim, not the raw hidden dim
        qkv_in = (in_proj[0].shape[-1] if in_proj is not None
                  else hidden_states.shape[-1])
        dp = lambda n, i, o, use_b: _DenseParams(
            features=o, in_features=i, use_bias=use_b,
            param_dtype=self.param_dtype, name=n)()
        wq, bq = dp("to_q", qkv_in, inner, self.qkv_bias)
        wk, bk = dp("to_k", qkv_in if encoder_hidden_states is None
                    else context.shape[-1], inner, self.qkv_bias)
        wv, bv = dp("to_v", qkv_in if encoder_hidden_states is None
                    else context.shape[-1], inner, self.qkv_bias)
        wo, bo = dp("to_out", inner, out_features, True)
        cast = lambda t: None if t is None else t.astype(self.dtype)
        wq, bq, wk, bk, wv, bv, wo, bo = map(
            cast, (wq, bq, wk, bk, wv, bv, wo, bo))
        hidden_states = hidden_states.astype(self.dtype)
        context = context.astype(self.dtype)

        if fused_v5_ok:
            from tvi.ops.pallas_attention_v5 import fused_ln_attention_out

            wkv_cat = jnp.concatenate([wk, wv], axis=1)
            w_in = b_in = gn_a = gn_b = None
            if in_proj is not None:
                w_in = in_proj[0].astype(self.dtype)
                b_in = in_proj[1].astype(self.dtype)
                if in_gn is not None:
                    gn_a, gn_b = in_gn
            return fused_ln_attention_out(
                hidden_states, pre_ln[0], pre_ln[1], wq, wkv_cat, wo, bo,
                w_in, b_in, gn_a, gn_b,
                heads=self.heads, scale=self.dim_head ** -0.5, eps=1e-5,
                residual=True)

        def _apply_post_ff(y):
            # the block's norm3 + GEGLU FF + residual, applied to the
            # attention output when it wasn't folded into a kernel
            return _apply_ff_params(y, post_ff)

        if fused_cross_ok:
            from tvi.ops.pallas_fused_cross import (
                cross_ff_out4d_eligible,
                fused_cross_attention,
                fused_cross_ff_out4d,
                to_head_major_ctx,
            )

            bsz, seq, cdim = hidden_states.shape
            ck = context @ wk                        # (G, S_ctx, inner)
            cv = context @ wv
            lns, lnb = pre_ln if pre_ln is not None else (None, None)
            ffp = None
            if fused_cross_ff:
                cast = lambda t: t.astype(self.dtype)
                ffp = (post_ff[0], post_ff[1], cast(post_ff[2]),
                       cast(post_ff[3]), cast(post_ff[4]), cast(post_ff[5]))
            if (out4d is not None and fused_cross_ff
                    and temporal_4d_enabled()):
                # temporal attn2+FF + blend + proj_out + outer residual in
                # one kernel, output written in the (B, F, S, C) spatial
                # view — the caller detects the 4D result and skips its
                # transpose/blend/proj_out tail (opt-in TVI_TEMPORAL_4D=1)
                spatial4, wpo, bpo, alpha, res4 = out4d
                b4, f4, s4 = spatial4.shape[:3]
                if (context.shape[0] == b4 and bsz == b4 * s4 and seq == f4
                        and cross_ff_out4d_eligible(
                            b4, f4, s4, cdim, inner, wpo.shape[-1],
                            context.shape[1], post_ff[4].shape[0])):
                    cast = lambda t: t.astype(self.dtype)
                    return fused_cross_ff_out4d(
                        hidden_states.reshape(bsz * seq, cdim), lns, lnb,
                        wq, to_head_major_ctx(ck, self.heads),
                        to_head_major_ctx(cv, self.heads), wo, bo, ffp,
                        cast(wpo), cast(bpo), alpha, cast(spatial4),
                        cast(res4), heads=self.heads,
                        scale=self.dim_head ** -0.5, eps=self.eps)
            out2 = fused_cross_attention(
                hidden_states.reshape(bsz * seq, cdim), lns, lnb, wq,
                to_head_major_ctx(ck, self.heads),
                to_head_major_ctx(cv, self.heads), wo, bo,
                heads=self.heads, scale=self.dim_head ** -0.5,
                rows_per_group=(bsz // context.shape[0]) * seq,
                eps=self.eps, residual=True, ff_params=ffp)
            out2 = out2.reshape(bsz, seq, out_features)
            if post_ff is not None and not fused_cross_ff:
                out2 = _apply_post_ff(out2)
            return out2

        fused_ok = (
            encoder_hidden_states is None and bias is None and not want_stats
            and not self.residual_connection
            and (fused_temporal_ln_ok or pre_ln is None)
            and self.norm_num_groups is None and not serve_int8()
            and hidden_states.ndim == 3 and hidden_states.shape[1] <= 64
            and _flash_enabled()
            and not os.environ.get("TVI_DISABLE_FUSED_TEMPORAL")
            and fused_temporal_eligible(
                hidden_states.shape[0], hidden_states.shape[1],
                hidden_states.shape[2], inner, out_features, self.qkv_bias))
        if fused_ok:
            lns, lnb = pre_ln if fused_temporal_ln_ok else (None, None)
            ffin = None
            if fused_temporal_ffin_ok:
                cast = lambda t: t.astype(self.dtype)
                ffin = (pre_ff[0], pre_ff[1], cast(pre_ff[2]),
                        cast(pre_ff[3]), cast(pre_ff[4]), cast(pre_ff[5]))
            if fused_temporal_4d_ok:
                from tvi.ops.pallas_fused_temporal import (
                    fused_temporal_self_attention_4d,
                )

                return fused_temporal_self_attention_4d(
                    in_4d[0].astype(self.dtype), in_4d[1].astype(self.dtype),
                    wq, wk, wv, wo, bo,
                    heads=self.heads, scale=self.dim_head ** -0.5,
                    lns=lns, lnb=lnb, residual=True, ffin_params=ffin)
            out = fused_temporal_self_attention(
                hidden_states, wq, wk, wv, wo, bo,
                heads=self.heads, scale=self.dim_head ** -0.5,
                lns=lns, lnb=lnb, residual=fused_temporal_ln_ok,
                ffin_params=ffin)
            if residual_add and not fused_temporal_ln_ok:
                # TVI_DISABLE_TEMPORAL_LN A/B: kernel without the fold,
                # LN applied above, residual added here
                out = out + residual.astype(out.dtype)
            return out

        if fused_spatial_ok:
            # LN + QKV + flash fused; out-projection contracts the
            # head-major output directly (no transpose op).  The underflow
            # guard follows TVI_ATTN_SHIFT like the unfused path: only the
            # explicit bound_unguarded serving mode drops it (ADVICE r2).
            from tvi.ops.pallas_attention import _default_shift
            lns, lnb = pre_ln if pre_ln is not None else (None, None)
            o_hm = fused_spatial_self_attention(
                hidden_states, lns, lnb, wq, wk, wv,
                heads=self.heads, scale=self.dim_head ** -0.5,
                guarded=_default_shift() != "bound_unguarded")
            return jnp.einsum(
                "bhsd,hdo->bso", o_hm,
                wo.reshape(self.heads, self.dim_head, out_features),
                preferred_element_type=jnp.float32,
            ).astype(hidden_states.dtype) + bo

        if serve_int8():
            from tvi.ops.quant import dense_w8a8, quantize_cols

            def apply_dense(x, w, b_):
                wi, ws = quantize_cols(w)
                return dense_w8a8(x, wi, ws, bias=b_, out_dtype=self.dtype)
        else:
            apply_dense = lambda x, w, b_: (x @ w if b_ is None else x @ w + b_)
        if qkv_projin_ok:
            from tvi.ops.pallas_attention_out import (
                flash_attention_out,
                ln_qkv_projin,
            )

            w_in = in_proj[0].astype(self.dtype)
            b_in = in_proj[1].astype(self.dtype)
            bsz_, seq_, c_in_ = hidden_states.shape
            if in_gn is not None:
                ga = in_gn[0].astype(jnp.float32)
                gb_ = in_gn[1].astype(jnp.float32)
            else:
                # identity affine (GN already applied upstream)
                ga = jnp.ones((bsz_, 1, c_in_), jnp.float32)
                gb_ = jnp.zeros((bsz_, 1, c_in_), jnp.float32)
            y3, q3, k3, v3, kn = ln_qkv_projin(
                hidden_states, ga, gb_, w_in, b_in, pre_ln[0], pre_ln[1],
                wq, wk, wv, heads=self.heads, eps=1e-5)
            return flash_attention_out(
                q3, k3, v3, y3, wo, bo,
                heads=self.heads, scale=self.dim_head ** -0.5,
                residual=True, knorm=kn)

        if qkv_ln_ok:
            from tvi.ops.pallas_attention_out import (
                flash_attention_out,
                ln_qkv_split,
            )

            q3, k3, v3, kn = ln_qkv_split(
                hidden_states, pre_ln[0], pre_ln[1], wq, wk, wv,
                heads=self.heads, eps=1e-5)
            return flash_attention_out(
                q3, k3, v3, residual.astype(self.dtype), wo, bo,
                heads=self.heads, scale=self.dim_head ** -0.5,
                residual=True, knorm=kn)

        if encoder_hidden_states is None and not serve_int8():
            # self-attention: ONE (C, 3*inner) projection instead of three
            # thin-N matmuls — XLA's thin-N GEMMs sit on a ~17.6 TF/s cliff
            # at N=320 while N=960 runs at 50 (scripts/perf_lab.py
            # mm_bf16_proj320 / mm_bf16_n960); the trace-time weight concat
            # is tiny and the param tree is unchanged.
            wqkv = jnp.concatenate([wq, wk, wv], axis=1)
            qkv = hidden_states @ wqkv
            if bq is not None:
                qkv = qkv + jnp.concatenate([bq, bk, bv])

            # Spatial self-attention v4 (tvi/ops/pallas_attention_out.py):
            # head-looped bound-shift flash over the natural (B, S, inner)
            # layout with out-projection + bias + sublayer residual in the
            # epilogue — removes the head-split transposes, the thin-N
            # out-projection pass and the residual pass (each an HBM
            # M-pass on the input-streaming wall, PERF.md round-3).  The
            # packed variant consumes the fused QKV buffer directly so the
            # XLA split (3 more full M-pass slice copies) never happens.
            if (bias is None and not want_stats
                    and not self.residual_connection and residual_add
                    and self.norm_num_groups is None
                    and hidden_states.ndim == 3
                    and hidden_states.shape[1] > 64
                    and self.dim_head == 64 and _flash_enabled()
                    and out_features == residual.shape[-1]
                    and not os.environ.get("TVI_DISABLE_ATTN_OUT")
                    and _default_attn_shift() == "bound_unguarded"):
                from tvi.ops.pallas_attention_out import (
                    attention_out_eligible,
                    attention_out_packed_eligible,
                    flash_attention_out,
                    flash_attention_out_packed,
                )

                bsz, seq = qkv.shape[0], qkv.shape[1]
                if (attention_out_packed_eligible(
                        bsz, seq, inner, out_features, self.heads)
                        and not os.environ.get("TVI_DISABLE_ATTN_PACKED")):
                    return flash_attention_out_packed(
                        qkv, residual.astype(self.dtype), wo, bo,
                        heads=self.heads, scale=self.dim_head ** -0.5,
                        residual=True)
                if attention_out_eligible(bsz, seq, seq, inner, out_features,
                                          self.heads):
                    q, k, v = jnp.split(qkv, 3, axis=-1)
                    return flash_attention_out(
                        q, k, v, residual.astype(self.dtype), wo, bo,
                        heads=self.heads, scale=self.dim_head ** -0.5,
                        residual=True)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = apply_dense(hidden_states, wq, bq)
            k = apply_dense(context, wk, bk)
            v = apply_dense(context, wv, bv)

        b, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)

        out = dot_product_attention(q, k, v, bias=bias, want_stats=want_stats)
        stats = None
        if want_stats:
            out, stats = out
        out = out.reshape(b, sq, inner)

        out = apply_dense(out, wo, bo)
        if self.residual_connection:
            out = out + residual
        if residual_add:
            # caller-requested sublayer residual (folded into the fused
            # cross kernel on the TPU path); residual is the pre-LN input
            out = out + residual.astype(out.dtype)
        if post_ff is not None:
            out = _apply_post_ff(out)
        if want_stats:
            return out, stats
        return out
