"""Torch state-dict key/shape manifests for the real reference checkpoints.

The environment is offline (no HF Hub), so the real tensors cannot be
fetched; these manifests reproduce the public key/shape inventory of

  - stabilityai/stable-video-diffusion-img2vid-xt  (unet/, vae/,
    image_encoder/ subfolders), and
  - wwen1997/framer_512x320  (unet/ with the 8->9 surgery + mask_token,
    controlnet/)

by mirroring the *torch module structure* (state-dict keys are attribute
paths).  The structure is grounded in the reference's vendored sources:
  - UNet:        /root/reference/src/models/unet_spatio_temporal_condition.py:65-194
  - blocks:      /root/reference/src/models/unet_3d_blocks.py:1872-2404
  - transformer: /root/reference/src/models/transformer_temporal.py:207-251
  - attention:   /root/reference/src/models/attention.py:84-535 (Attention,
                 BasicTransformerBlock, TemporalBasicTransformerBlock,
                 FeedForward/GEGLU)
  - controlnet:  /root/reference/src/models/controlnet_svd.py:62-310
plus the diffusers-0.24 primitives those files import (ResnetBlock2D,
TemporalResnetBlock, SpatioTemporalResBlock, AlphaBlender, Up/Downsample2D,
TimestepEmbedding, AutoencoderKLTemporalDecoder) and transformers'
CLIPVisionModelWithProjection (ViT-H/14, laion2B).

This is deliberately an independent derivation from tvi/io/hf_weights.py's
regex translation: the manifest builds keys the way torch names parameters,
the converter maps them to flax paths, and the test cross-checks both
against jax.eval_shape of the actual flax models.
"""

from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]
Manifest = Dict[str, Shape]


# --------------------------------------------------------------- primitives

def _linear(d: Manifest, prefix: str, out_f: int, in_f: int, bias: bool = True):
    d[f"{prefix}.weight"] = (out_f, in_f)
    if bias:
        d[f"{prefix}.bias"] = (out_f,)


def _conv2d(d: Manifest, prefix: str, out_c: int, in_c: int, k: int = 3,
            bias: bool = True):
    d[f"{prefix}.weight"] = (out_c, in_c, k, k)
    if bias:
        d[f"{prefix}.bias"] = (out_c,)


def _conv3d_311(d: Manifest, prefix: str, out_c: int, in_c: int):
    d[f"{prefix}.weight"] = (out_c, in_c, 3, 1, 1)
    d[f"{prefix}.bias"] = (out_c,)


def _norm(d: Manifest, prefix: str, c: int):
    d[f"{prefix}.weight"] = (c,)
    d[f"{prefix}.bias"] = (c,)


def _resnet2d(d: Manifest, p: str, in_c: int, out_c: int, temb: int | None):
    """diffusers ResnetBlock2D."""
    _norm(d, f"{p}.norm1", in_c)
    _conv2d(d, f"{p}.conv1", out_c, in_c)
    if temb:
        _linear(d, f"{p}.time_emb_proj", out_c, temb)
    _norm(d, f"{p}.norm2", out_c)
    _conv2d(d, f"{p}.conv2", out_c, out_c)
    if in_c != out_c:
        _conv2d(d, f"{p}.conv_shortcut", out_c, in_c, k=1)


def _temporal_resnet(d: Manifest, p: str, c: int, temb: int | None):
    """diffusers TemporalResnetBlock ((3,1,1) convs, in==out inside
    SpatioTemporalResBlock)."""
    _norm(d, f"{p}.norm1", c)
    _conv3d_311(d, f"{p}.conv1", c, c)
    if temb:
        _linear(d, f"{p}.time_emb_proj", c, temb)
    _norm(d, f"{p}.norm2", c)
    _conv3d_311(d, f"{p}.conv2", c, c)


def _st_resblock(d: Manifest, p: str, in_c: int, out_c: int, temb: int | None):
    """diffusers SpatioTemporalResBlock."""
    _resnet2d(d, f"{p}.spatial_res_block", in_c, out_c, temb)
    _temporal_resnet(d, f"{p}.temporal_res_block", out_c, temb)
    d[f"{p}.time_mixer.mix_factor"] = (1,)


def _attention(d: Manifest, p: str, c: int, ctx: int | None = None,
               qkv_bias: bool = False, group_norm: bool = False):
    """diffusers Attention (attention_processor.py:38): to_q/k/v + to_out.0."""
    kdim = ctx or c
    if group_norm:
        _norm(d, f"{p}.group_norm", c)
    _linear(d, f"{p}.to_q", c, c, bias=qkv_bias)
    _linear(d, f"{p}.to_k", c, kdim, bias=qkv_bias)
    _linear(d, f"{p}.to_v", c, kdim, bias=qkv_bias)
    _linear(d, f"{p}.to_out.0", c, c, bias=True)


def _feedforward(d: Manifest, p: str, c: int, mult: int = 4):
    """diffusers FeedForward with GEGLU (attention.py:481-535):
    net.0.proj = Linear(c, 2*mult*c), net.2 = Linear(mult*c, c)."""
    _linear(d, f"{p}.net.0.proj", 2 * mult * c, c)
    _linear(d, f"{p}.net.2", c, mult * c)


def _basic_transformer_block(d: Manifest, p: str, c: int, ctx: int):
    _norm(d, f"{p}.norm1", c)
    _attention(d, f"{p}.attn1", c)
    _norm(d, f"{p}.norm2", c)
    _attention(d, f"{p}.attn2", c, ctx=ctx)
    _norm(d, f"{p}.norm3", c)
    _feedforward(d, f"{p}.ff", c)


def _temporal_transformer_block(d: Manifest, p: str, c: int, ctx: int):
    _norm(d, f"{p}.norm_in", c)
    _feedforward(d, f"{p}.ff_in", c)
    _norm(d, f"{p}.norm1", c)
    _attention(d, f"{p}.attn1", c)
    _norm(d, f"{p}.norm2", c)
    _attention(d, f"{p}.attn2", c, ctx=ctx)
    _norm(d, f"{p}.norm3", c)
    _feedforward(d, f"{p}.ff", c)


def _transformer_st(d: Manifest, p: str, c: int, n_layers: int, ctx: int):
    """TransformerSpatioTemporalModel (transformer_temporal.py:221-245)."""
    _norm(d, f"{p}.norm", c)  # GroupNorm(32, c)
    _linear(d, f"{p}.proj_in", c, c)
    for j in range(n_layers):
        _basic_transformer_block(d, f"{p}.transformer_blocks.{j}", c, ctx)
        _temporal_transformer_block(
            d, f"{p}.temporal_transformer_blocks.{j}", c, ctx)
    _linear(d, f"{p}.time_pos_embed.linear_1", 4 * c, c)
    _linear(d, f"{p}.time_pos_embed.linear_2", c, 4 * c)
    d[f"{p}.time_mixer.mix_factor"] = (1,)
    _linear(d, f"{p}.proj_out", c, c)


def _timestep_embedding(d: Manifest, p: str, in_f: int, embed: int):
    _linear(d, f"{p}.linear_1", embed, in_f)
    _linear(d, f"{p}.linear_2", embed, embed)


# -------------------------------------------------------------------- UNet

def svd_unet_manifest(in_channels: int = 8,
                      with_mask_token: bool = False,
                      block_out_channels=(320, 640, 1280, 1280),
                      num_attention_heads=(5, 10, 20, 20),
                      layers_per_block: int = 2,
                      cross_attention_dim: int = 1024,
                      addition_time_embed_dim: int = 256,
                      projection_dim: int = 768) -> Manifest:
    """UNetSpatioTemporalConditionModel state dict.  in_channels=8 is the
    released SVD-xt checkpoint; in_channels=9 + mask_token is the framer
    fork after surgery (unet_spatio_temporal_condition.py:703-707,781-791)."""
    d: Manifest = {}
    ch = block_out_channels
    temb = ch[0] * 4
    if with_mask_token:
        d["mask_token"] = (1, 1, 4, 1, 1)
    _conv2d(d, "conv_in", ch[0], in_channels)
    _timestep_embedding(d, "time_embedding", ch[0], temb)
    _timestep_embedding(d, "add_embedding", projection_dim, temb)

    # down blocks: 3x CrossAttnDownBlockSpatioTemporal + DownBlockSpatioTemporal
    n_blocks = len(ch)
    for i in range(n_blocks):
        p = f"down_blocks.{i}"
        cin = ch[0] if i == 0 else ch[i - 1]
        cout = ch[i]
        is_final = i == n_blocks - 1
        for j in range(layers_per_block):
            _st_resblock(d, f"{p}.resnets.{j}", cin if j == 0 else cout,
                         cout, temb)
        if not is_final:  # cross-attn blocks
            for j in range(layers_per_block):
                _transformer_st(d, f"{p}.attentions.{j}", cout, 1,
                                cross_attention_dim)
            _conv2d(d, f"{p}.downsamplers.0.conv", cout, cout)

    # mid
    _st_resblock(d, "mid_block.resnets.0", ch[-1], ch[-1], temb)
    _transformer_st(d, "mid_block.attentions.0", ch[-1], 1, cross_attention_dim)
    _st_resblock(d, "mid_block.resnets.1", ch[-1], ch[-1], temb)

    # up blocks (reversed channels; skip-connection channel bookkeeping as in
    # diffusers get_up_block usage)
    rev = list(reversed(ch))
    prev_out = ch[-1]
    for i in range(n_blocks):
        p = f"up_blocks.{i}"
        cout = rev[i]
        cin = rev[min(i + 1, n_blocks - 1)]
        is_final = i == n_blocks - 1
        n_res = layers_per_block + 1
        for j in range(n_res):
            skip = cin if j == n_res - 1 else cout
            res_in = (prev_out if j == 0 else cout) + skip
            _st_resblock(d, f"{p}.resnets.{j}", res_in, cout, temb)
        if i > 0:  # CrossAttnUpBlockSpatioTemporal
            heads_rev = list(reversed(num_attention_heads))
            del heads_rev  # head count doesn't affect param shapes
            for j in range(n_res):
                _transformer_st(d, f"{p}.attentions.{j}", cout, 1,
                                cross_attention_dim)
        if not is_final:
            _conv2d(d, f"{p}.upsamplers.0.conv", cout, cout)
        prev_out = cout

    _norm(d, "conv_norm_out", ch[0])
    _conv2d(d, "conv_out", 4, ch[0])
    return d


# --------------------------------------------------------------------- VAE

def svd_vae_manifest(block_out_channels=(128, 256, 512, 512),
                     layers_per_block: int = 2,
                     latent_channels: int = 4) -> Manifest:
    """AutoencoderKLTemporalDecoder (diffusers): 2D KL encoder + temporal
    decoder (mid/up blocks of SpatioTemporalResBlocks, temb=None)."""
    d: Manifest = {}
    ch = block_out_channels

    # encoder
    _conv2d(d, "encoder.conv_in", ch[0], 3)
    for i, c in enumerate(ch):
        p = f"encoder.down_blocks.{i}"
        cin = ch[0] if i == 0 else ch[i - 1]
        for j in range(layers_per_block):
            _resnet2d(d, f"{p}.resnets.{j}", cin if j == 0 else c, c, None)
        if i < len(ch) - 1:
            _conv2d(d, f"{p}.downsamplers.0.conv", c, c)
    _resnet2d(d, "encoder.mid_block.resnets.0", ch[-1], ch[-1], None)
    _attention(d, "encoder.mid_block.attentions.0", ch[-1], qkv_bias=True,
               group_norm=True)
    _resnet2d(d, "encoder.mid_block.resnets.1", ch[-1], ch[-1], None)
    _norm(d, "encoder.conv_norm_out", ch[-1])
    _conv2d(d, "encoder.conv_out", 2 * latent_channels, ch[-1])
    _conv2d(d, "quant_conv", 2 * latent_channels, 2 * latent_channels, k=1)

    # temporal decoder
    _conv2d(d, "decoder.conv_in", ch[-1], latent_channels)
    _st_resblock(d, "decoder.mid_block.resnets.0", ch[-1], ch[-1], None)
    _attention(d, "decoder.mid_block.attentions.0", ch[-1], qkv_bias=True,
               group_norm=True)
    _st_resblock(d, "decoder.mid_block.resnets.1", ch[-1], ch[-1], None)
    rev = list(reversed(ch))
    prev = rev[0]
    for i, c in enumerate(rev):
        p = f"decoder.up_blocks.{i}"
        for j in range(layers_per_block + 1):
            _st_resblock(d, f"{p}.resnets.{j}", prev if j == 0 else c, c, None)
        if i < len(rev) - 1:
            _conv2d(d, f"{p}.upsamplers.0.conv", c, c)
        prev = c
    _norm(d, "decoder.conv_norm_out", ch[0])
    _conv2d(d, "decoder.conv_out", 3, ch[0])
    _conv3d_311(d, "decoder.time_conv_out", 3, 3)
    return d


# -------------------------------------------------------------------- CLIP

def clip_vit_h_manifest(hidden: int = 1280, layers: int = 32,
                        intermediate: int = 5120, patch: int = 14,
                        image_size: int = 224,
                        projection_dim: int = 1024) -> Manifest:
    """transformers CLIPVisionModelWithProjection (ViT-H/14 laion2B) —
    including the upstream 'pre_layrnorm' typo."""
    d: Manifest = {}
    n_pos = (image_size // patch) ** 2 + 1
    d["vision_model.embeddings.class_embedding"] = (hidden,)
    d["vision_model.embeddings.patch_embedding.weight"] = (hidden, 3, patch, patch)
    d["vision_model.embeddings.position_embedding.weight"] = (n_pos, hidden)
    _norm(d, "vision_model.pre_layrnorm", hidden)
    for i in range(layers):
        p = f"vision_model.encoder.layers.{i}"
        _norm(d, f"{p}.layer_norm1", hidden)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(d, f"{p}.self_attn.{proj}", hidden, hidden)
        _norm(d, f"{p}.layer_norm2", hidden)
        _linear(d, f"{p}.mlp.fc1", intermediate, hidden)
        _linear(d, f"{p}.mlp.fc2", hidden, intermediate)
    _norm(d, "vision_model.post_layernorm", hidden)
    d["visual_projection.weight"] = (projection_dim, hidden)
    return d


# --------------------------------------------------------------- ControlNet

def controlnet_svd_manifest(in_channels: int = 9,
                            conditioning_channels: int = 3,
                            block_out_channels=(320, 640, 1280, 1280),
                            cond_embed_channels=(16, 32, 96, 256),
                            layers_per_block: int = 2,
                            cross_attention_dim: int = 1024,
                            projection_dim: int = 768) -> Manifest:
    """ControlNetSVDModel (controlnet_svd.py:116-310): UNet encoder copy +
    conditioning embedding + zero-init 1x1 output convs."""
    d: Manifest = {}
    ch = block_out_channels
    temb = ch[0] * 4
    _conv2d(d, "conv_in", ch[0], in_channels)
    _timestep_embedding(d, "time_embedding", ch[0], temb)
    _timestep_embedding(d, "add_embedding", projection_dim, temb)

    # conditioning embedding (controlnet_svd.py:83-95)
    ce = cond_embed_channels
    _conv2d(d, "controlnet_cond_embedding.conv_in", ce[0], conditioning_channels)
    for i in range(len(ce) - 1):
        _conv2d(d, f"controlnet_cond_embedding.blocks.{2 * i}", ce[i], ce[i])
        _conv2d(d, f"controlnet_cond_embedding.blocks.{2 * i + 1}", ce[i + 1], ce[i])
    _conv2d(d, "controlnet_cond_embedding.conv_out", ch[0], ce[-1])

    # down blocks — identical to the UNet encoder
    n_blocks = len(ch)
    for i in range(n_blocks):
        p = f"down_blocks.{i}"
        cin = ch[0] if i == 0 else ch[i - 1]
        cout = ch[i]
        is_final = i == n_blocks - 1
        for j in range(layers_per_block):
            _st_resblock(d, f"{p}.resnets.{j}", cin if j == 0 else cout,
                         cout, temb)
        if not is_final:
            for j in range(layers_per_block):
                _transformer_st(d, f"{p}.attentions.{j}", cout, 1,
                                cross_attention_dim)
            _conv2d(d, f"{p}.downsamplers.0.conv", cout, cout)

    # zero-init 1x1 blocks: 1 for conv_in + layers_per_block per down block +
    # 1 per downsampler (controlnet_svd.py:264-296)
    res_channels = [ch[0]]
    for i in range(n_blocks):
        res_channels.extend([ch[i]] * layers_per_block)
        if i < n_blocks - 1:
            res_channels.append(ch[i])
    for i, c in enumerate(res_channels):
        _conv2d(d, f"controlnet_down_blocks.{i}", c, c, k=1)
    _conv2d(d, "controlnet_mid_block", ch[-1], ch[-1], k=1)

    # mid block
    _st_resblock(d, "mid_block.resnets.0", ch[-1], ch[-1], temb)
    _transformer_st(d, "mid_block.attentions.0", ch[-1], 1, cross_attention_dim)
    _st_resblock(d, "mid_block.resnets.1", ch[-1], ch[-1], temb)
    return d
