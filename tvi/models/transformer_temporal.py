"""Spatio-temporal transformer: spatial attention over pixels, temporal
attention over frames, learned alpha blend.

From-scratch rebuild of the reference's most important block
(src/models/transformer_temporal.py:207-359 ``TransformerSpatioTemporalModel``
with ``BasicTransformerBlock`` from src/models/attention.py:84 and the
diffusers ``TemporalBasicTransformerBlock`` it actually uses).

TPU-native design notes:
  - hidden states flow as (B*F, H*W, C) for spatial attention and are
    transposed once to (B*H*W, F, C) for temporal attention — a pure layout
    change XLA handles with a single transpose, keeping both attention
    matmuls MXU-shaped (many small rows for temporal, long seq for spatial).
  - the spatial/temporal conditioning split (tuple encoder_hidden_states,
    reference transformer_temporal.py:269-297: the temporal context is the
    first frame's tokens broadcast to every pixel) is computed without
    materializing the (H*W*B, S, D) broadcast — attention consumes a
    (B, 1(broadcast), S, D) context.
  - per-frame attention statistics (the reference's monkey-patch feature)
    are emitted via ``self.sow('intermediates', ...)`` when requested.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvi.models.layers import (
    AlphaBlender,
    Attention,
    FeedForward,
    TimestepEmbedding,
    get_timestep_embedding,
    gn_groups,
    serve_int8,
)
from tvi.ops.attention import temporal_4d_enabled, temporal_bias_mask
from tvi.utils.ablate import ablated


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU FF, all residual
    (reference attention.py:84)."""

    heads: int
    dim_head: int
    cross_attention: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states=None,
                 in_proj=None, in_gn=None):
        attn = lambda n: Attention(heads=self.heads, dim_head=self.dim_head,
                                   dtype=self.dtype, param_dtype=self.param_dtype, name=n)
        if in_proj is not None and ablated("spatial_attn"):
            # attn1 normally absorbs the caller's GN-affine + proj_in;
            # under the ablation knob apply them functionally
            if in_gn is not None:
                hidden_states = (hidden_states.astype(jnp.float32) * in_gn[0]
                                 + in_gn[1]).astype(self.dtype)
                in_gn = None
            hidden_states = (hidden_states.astype(self.dtype)
                             @ in_proj[0].astype(self.dtype)
                             + in_proj[1].astype(self.dtype))
            in_proj = None
        ff_applied = False
        if not ablated("spatial_attn"):
            # norm1 is passed as raw params so the TPU path can fold the
            # LayerNorm into the fused LN+QKV+flash kernels
            # (tvi/ops/pallas_fused_spatial.py); the fallback applies it
            # functionally with identical numerics.  Param tree unchanged.
            from tvi.models.layers import LayerNormParams

            c_blk = (in_proj[0].shape[-1] if in_proj is not None
                     else hidden_states.shape[-1])
            norm1 = LayerNormParams(features=c_blk,
                                    param_dtype=self.param_dtype,
                                    name="norm1")()
            # residual folded into the attention (the TPU v4 kernel fuses
            # out-projection + residual into its epilogue; the fallback
            # adds it functionally — identical math)
            hidden_states = attn("attn1")(
                hidden_states, pre_ln=norm1, residual_add=True,
                in_proj=in_proj, in_gn=in_gn)
            if self.cross_attention:
                from tvi.models.layers import serve_int8

                # norm2 + attn2 + residual fold into the fused small-context
                # cross kernel on TPU (tvi/ops/pallas_fused_cross.py); the
                # trailing norm3 + GEGLU FF folds into the same kernel's
                # epilogue (raw params threaded via post_ff; ineligible
                # shapes / CPU apply it right after attn2 — identical math)
                norm2 = LayerNormParams(features=hidden_states.shape[-1],
                                        param_dtype=self.param_dtype,
                                        name="norm2")()
                post_ff = None
                if not ablated("ff") and not serve_int8():
                    norm3 = LayerNormParams(
                        features=hidden_states.shape[-1],
                        param_dtype=self.param_dtype, name="norm3")()
                    ffp = FeedForward(dtype=self.dtype,
                                      param_dtype=self.param_dtype,
                                      name="ff")(hidden_states,
                                                 return_params=True)
                    post_ff = (norm3[0], norm3[1]) + tuple(ffp)
                    ff_applied = True
                hidden_states = attn("attn2")(
                    hidden_states, encoder_hidden_states,
                    pre_ln=norm2, residual_add=True, post_ff=post_ff)
        if not ablated("ff") and not ff_applied:
            from tvi.models.layers import LayerNormParams

            norm3 = LayerNormParams(features=hidden_states.shape[-1],
                                    param_dtype=self.param_dtype,
                                    name="norm3")()
            hidden_states = FeedForward(dtype=self.dtype, param_dtype=self.param_dtype,
                                        name="ff")(hidden_states, pre_ln=norm3,
                                                   residual=True)
        return hidden_states


class TemporalBasicTransformerBlock(nn.Module):
    """Temporal block: ff_in -> self-attn over frames -> cross-attn to the
    conditioning tokens -> FF (diffusers TemporalBasicTransformerBlock, used
    via the import at reference transformer_temporal.py:22).

    Input here is already frame-major: (B*S, F, C) where S = H*W.
    """

    heads: int
    dim_head: int
    cross_attention: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states,                  # (BS, F, C) — or None with x4
        encoder_hidden_states=None,     # (BS or broadcastable, S_ctx, D)
        temporal_bias: Optional[jax.Array] = None,  # (F, S_ctx) additive
        want_stats: bool = False,
        x4=None,                        # ((B, F, S, C), (B, F, 1, C)):
                                        # untransposed hidden + frame-pos
                                        # emb for the 4D kernel (opt-in)
        out4d=None,                     # (spatial4, wpo, bpo, alpha, res4):
                                        # attn2+FF also writes the FINAL
                                        # (B, F, S, C) transformer output
                                        # (blend/proj_out/residual folded)
    ):
        attn1_runs = not (ablated("temporal_attn") or ablated("temporal_self"))
        if x4 is not None:
            # materialize the relayout functionally; when attn1's 4D kernel
            # engages it consumes x4 directly and XLA dead-code-eliminates
            # this transpose — the fallbacks use it as-is
            b4, f4, s4, c4 = x4[0].shape
            hidden_states = jnp.swapaxes(x4[0] + x4[1], 1, 2).reshape(
                b4 * s4, f4, c4)
            if not attn1_runs:
                x4 = None
        pre_ff = None
        if not ablated("ff"):
            from tvi.models.layers import LayerNormParams, serve_int8

            norm_in = LayerNormParams(features=hidden_states.shape[-1],
                                      param_dtype=self.param_dtype,
                                      name="norm_in")()
            if attn1_runs and not serve_int8():
                # ff_in threads into attn1 as the fused temporal kernel's
                # GEGLU prologue (raw params; ineligible shapes / CPU
                # apply it inside Attention — identical math)
                ffp = FeedForward(dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="ff_in")(hidden_states,
                                                return_params=True)
                pre_ff = (norm_in[0], norm_in[1]) + tuple(ffp)
            else:
                # is_res: dims equal -> residual folded into the fused kernel
                hidden_states = FeedForward(dtype=self.dtype,
                                            param_dtype=self.param_dtype,
                                            name="ff_in")(hidden_states,
                                                          pre_ln=norm_in,
                                                          residual=True)

        attn = lambda n: Attention(heads=self.heads, dim_head=self.dim_head,
                                   dtype=self.dtype, param_dtype=self.param_dtype, name=n)
        if attn1_runs:
            # Frame self-attention runs per pixel row with tiny F (14-40):
            # on TPU the attention op dispatches this to the fused temporal
            # kernel (tvi/ops/pallas_fused_temporal.py) with ff_in, norm1
            # and the residual folded in-kernel (kills the ff_in kernel
            # boundary and two XLA M-passes); the fallback applies them
            # functionally — identical math.
            from tvi.models.layers import LayerNormParams

            norm1 = LayerNormParams(features=hidden_states.shape[-1],
                                    param_dtype=self.param_dtype,
                                    name="norm1")()
            hidden_states = attn("attn1")(
                hidden_states, pre_ln=norm1, residual_add=True,
                pre_ff=pre_ff, in_4d=x4)

        stats = None
        ff_applied = False
        if self.cross_attention and not (ablated("temporal_attn") or ablated("temporal_cross")):
            from tvi.models.layers import LayerNormParams, serve_int8

            norm2 = LayerNormParams(features=hidden_states.shape[-1],
                                    param_dtype=self.param_dtype,
                                    name="norm2")()
            # residual + norm2 fold into the fused cross kernel on TPU; the
            # trailing norm3 + GEGLU FF folds into its epilogue (post_ff);
            # the context may arrive grouped (G, S_ctx, D) with G dividing
            # the row batch (the compact per-CFG-batch first-frame tokens)
            post_ff = None
            if not ablated("ff") and not serve_int8():
                norm3 = LayerNormParams(features=hidden_states.shape[-1],
                                        param_dtype=self.param_dtype,
                                        name="norm3")()
                ffp = FeedForward(dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="ff")(hidden_states,
                                             return_params=True)
                post_ff = (norm3[0], norm3[1]) + tuple(ffp)
                ff_applied = True
            out = attn("attn2")(
                hidden_states, encoder_hidden_states,
                bias=temporal_bias, want_stats=want_stats,
                pre_ln=norm2, residual_add=True, post_ff=post_ff,
                out4d=out4d if post_ff is not None else None)
            if want_stats:
                out, stats = out
                self.sow("intermediates", "attn_stats", stats)
            hidden_states = out
            if hidden_states.ndim == 4:
                # the out4d kernel wrote the final transformer output
                return hidden_states

        if not ablated("ff") and not ff_applied:
            from tvi.models.layers import LayerNormParams

            norm3 = LayerNormParams(features=hidden_states.shape[-1],
                                    param_dtype=self.param_dtype,
                                    name="norm3")()
            hidden_states = FeedForward(dtype=self.dtype, param_dtype=self.param_dtype,
                                        name="ff")(hidden_states, pre_ln=norm3,
                                                   residual=True)
        return hidden_states


class TransformerSpatioTemporalModel(nn.Module):
    """GroupNorm -> proj_in -> [spatial block, temporal block, blend]*L ->
    proj_out + residual (reference transformer_temporal.py:253-356)."""

    heads: int
    dim_head: int
    num_layers: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,       # (B*F, H, W, C)
        num_frames: int,
        encoder_hidden_states: Union[jax.Array, Tuple[jax.Array, jax.Array]],
        use_temporal_attention_bias: bool = False,
        want_stats: bool = False,
    ) -> jax.Array:
        if ablated("transformers"):
            return hidden_states
        bf, height, width, channels = hidden_states.shape
        batch_size = bf // num_frames
        inner_dim = self.heads * self.dim_head

        if isinstance(encoder_hidden_states, tuple):
            spatial_ctx, temporal_ctx = encoder_hidden_states
        else:
            spatial_ctx = temporal_ctx = encoder_hidden_states
        # contexts arrive per-batch: (B, S, D).  Spatial attention runs per
        # frame -> broadcast to (B*F, S, D); temporal attention runs per
        # pixel with the *first frame's* context (reference
        # transformer_temporal.py:279-297) -> (B, 1, S, D) broadcast over
        # pixels, materialized lazily by jnp broadcasting inside attention.
        s_ctx = jnp.repeat(spatial_ctx, num_frames, axis=0)

        residual = hidden_states
        import os

        from tvi.models.layers import FusedGroupNorm, MaybeQuantDense
        from tvi.ops.attention import _flash_enabled

        gn_mod = FusedGroupNorm(num_groups=gn_groups(channels), epsilon=1e-6,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype, name="norm")
        proj_in = MaybeQuantDense(inner_dim, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="proj_in")
        in_gn = None
        if serve_int8():
            hidden_states = gn_mod(hidden_states)
            hidden_states = hidden_states.reshape(bf, height * width,
                                                  channels)
            hidden_states = proj_in(hidden_states)
            in_proj = None
        elif (_flash_enabled()
              and not os.environ.get("TVI_DISABLE_V5_GN")):
            # TPU: the GN APPLY pass folds into the v5 kernel's proj_in
            # prologue as a precomputed per-instance affine (the cheap
            # stats reduction stays in XLA); a Pallas consumer cannot
            # absorb an XLA producer fusion, so without this the apply
            # pass would materialize before the kernel.
            from tvi.ops.groupnorm import group_norm_affine_params

            gs, gb = gn_mod(hidden_states, return_params=True)
            ga, gab = group_norm_affine_params(hidden_states, gs, gb,
                                               gn_groups(channels), eps=1e-6)
            in_gn = (ga[:, None, :], gab[:, None, :])     # (B*F, 1, C)
            hidden_states = hidden_states.reshape(bf, height * width,
                                                  channels)
            in_proj = proj_in(hidden_states, return_params=True)
        else:
            # CPU / opt-out: bit-identical classic GN apply; proj_in's raw
            # weights still thread to the first spatial block (the v5
            # kernel absorbs the projection; ineligible shapes apply it
            # functionally inside Attention — identical math, same tree).
            hidden_states = gn_mod(hidden_states)
            hidden_states = hidden_states.reshape(bf, height * width,
                                                  channels)
            in_proj = proj_in(hidden_states, return_params=True)

        # frame-position embedding (transformer_temporal.py:309-316)
        frame_ids = jnp.tile(jnp.arange(num_frames), batch_size)
        t_emb = get_timestep_embedding(frame_ids, inner_dim).astype(self.dtype)
        emb = TimestepEmbedding(inner_dim * 4, out_dim=inner_dim, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="time_pos_embed")(t_emb)
        emb = emb[:, None, :]  # (B*F, 1, C)

        bias = None
        if use_temporal_attention_bias:
            bias = temporal_bias_mask(num_frames, temporal_ctx.shape[-2])

        # one blender shared across layers (reference: a single self.time_mixer
        # used inside the block loop, transformer_temporal.py:246,349)
        mixer = AlphaBlender(alpha=0.5, param_dtype=self.param_dtype, name="time_mixer")

        # 4D transposed-IO (default-on on TPU, kill switch
        # TVI_TEMPORAL_4D=0): extract proj_out weights + blend alpha so
        # the LAST layer's temporal attn2+FF kernel can write the FINAL
        # transformer output (blend + proj_out + outer residual folded);
        # the fallbacks apply the same raw params manually — same tree.
        proj_out_mod = MaybeQuantDense(channels, dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name="proj_out")
        out4d_params = None
        # TVI_TEMPORAL_OUT4D=0 keeps the input-side 4D kernel but routes
        # blend/proj_out through the functional tail — the out4d kernel's
        # (bp·F, C)→(bp, F, C) epilogue reshape is unsupported by real
        # Mosaic at F=25 (round-4 chip run), so the two sides A/B separately.
        if (temporal_4d_enabled()
                and os.environ.get("TVI_TEMPORAL_OUT4D", "1") == "1"
                and _flash_enabled() and not serve_int8()):
            wpo, bpo = proj_out_mod(jnp.zeros((1, inner_dim), self.dtype),
                                    return_params=True)
            alpha4 = mixer(hidden_states, return_alpha=True)
            out4d_params = (wpo, bpo, alpha4)

        for layer in range(self.num_layers):
            hidden_states = BasicTransformerBlock(
                heads=self.heads, dim_head=self.dim_head,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"transformer_blocks_{layer}",
            )(hidden_states, s_ctx, in_proj=in_proj if layer == 0 else None,
              in_gn=in_gn if layer == 0 else None)

            # spatial -> temporal layout: (B*F, S, C) -> (B*S, F, C).
            # Opt-in TVI_TEMPORAL_4D=1: hand the UNTRANSPOSED 4D view +
            # frame-pos emb to the temporal block — attn1's kernel absorbs
            # the emb-add and the relayout (in-VMEM transpose), and this
            # XLA transpose pass is dead-code-eliminated.
            x4 = None
            if (temporal_4d_enabled()
                    and _flash_enabled() and not serve_int8()):
                x4 = (hidden_states.reshape(batch_size, num_frames,
                                            height * width, inner_dim),
                      emb.reshape(batch_size, num_frames, 1, inner_dim))
                mix = None  # the temporal block materializes from x4
            else:
                mix = hidden_states + emb
                mix = mix.reshape(batch_size, num_frames,
                                  height * width, inner_dim)
                mix = jnp.swapaxes(mix, 1, 2).reshape(
                    batch_size * height * width, num_frames, inner_dim)
            # per-pixel temporal context: passed GROUPED as the compact
            # (B, S_ctx, D) — all B*S pixel rows of batch b share ctx[b];
            # Attention either consumes the groups directly (fused cross
            # kernel picks its group's K/V via the block index map) or
            # repeats batch-major on the fallback path.
            t_ctx = temporal_ctx
            if os.environ.get("TVI_REF_CTX_QUIRK"):
                # Replicate the reference's PIXEL-major pairing (reference
                # transformer_temporal.py:297 reshapes (S, B) while hidden
                # rows are (B, S)): hidden row q attends to ctx[q % B], so
                # a CFG pair alternates cond/uncond context per pixel.
                # Trace-time opt-in for the assembled-pipeline oracle test
                # ONLY (tests/test_reference_pipeline.py); the default
                # batch-major pairing is the documented deliberate fix
                # (PARITY.md, test_reference_blocks.py::
                # test_reference_temporal_context_row_order_quirk_documented).
                t_ctx = jnp.tile(temporal_ctx, (height * width, 1, 1))
            o4 = None
            if (x4 is not None and out4d_params is not None
                    and layer == self.num_layers - 1):
                wpo, bpo, alpha4 = out4d_params
                o4 = (hidden_states.reshape(batch_size, num_frames,
                                            height * width, inner_dim),
                      wpo, bpo, alpha4,
                      residual.reshape(batch_size, num_frames,
                                       height * width, channels))
            mix = TemporalBasicTransformerBlock(
                heads=self.heads, dim_head=self.dim_head,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"temporal_transformer_blocks_{layer}",
            )(mix, t_ctx, temporal_bias=bias, want_stats=want_stats, x4=x4,
              out4d=o4)
            if mix.ndim == 4:
                # the out4d kernel wrote the final (B, F, S, C) output
                return mix.reshape(bf, height, width, channels)
            mix = mix.reshape(batch_size, height * width, num_frames, inner_dim)
            mix = jnp.swapaxes(mix, 1, 2).reshape(bf, height * width, inner_dim)

            hidden_states = mixer(hidden_states, mix)

        if out4d_params is not None:
            # params already created above (return_params) — apply manually
            wpo, bpo, _ = out4d_params
            hidden_states = (hidden_states.astype(self.dtype)
                             @ wpo.astype(self.dtype)
                             + bpo.astype(self.dtype))
        else:
            hidden_states = proj_out_mod(hidden_states)
        hidden_states = hidden_states.reshape(bf, height, width, channels)
        return hidden_states + residual
