"""CLIP ViT-H/14 vision tower with projection — the SVD image encoder.

Rebuild of transformers' ``CLIPVisionModelWithProjection`` as loaded by the
reference (src/train.py:252-257, pipeline `_encode_image` at
pipeline_stable_video_diffusion_efficient_interp.py:190-229): patch conv,
class token, learned position embeddings, pre-LN, 32 pre-norm transformer
layers, post-LN on the CLS token, linear projection to 1024-d image_embeds.

TPU notes: the whole tower is (257, 1280) tokens — pure MXU work; runs in
bf16 with fp32 LayerNorm statistics.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvi.core.config import CLIPVisionConfig
from tvi.ops.attention import dot_product_attention

# CLIP preprocessing constants (OpenAI CLIPImageProcessor; applied by the
# reference feature_extractor at pipeline:203-210)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_normalize(pixels01: jax.Array) -> jax.Array:
    """Normalize [0,1] NHWC pixels with the CLIP mean/std."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype=pixels01.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, dtype=pixels01.dtype)
    return (pixels01 - mean) / std


class CLIPEncoderLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        ln = lambda n: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=n)
        residual = x
        h = ln("layer_norm1")(x)
        dense = lambda n: nn.Dense(cfg.hidden_size, use_bias=True, dtype=self.dtype,
                                   param_dtype=self.param_dtype, name=n)
        b, s, _ = h.shape
        q = dense("q_proj")(h).reshape(b, s, cfg.num_heads, head_dim)
        k = dense("k_proj")(h).reshape(b, s, cfg.num_heads, head_dim)
        v = dense("v_proj")(h).reshape(b, s, cfg.num_heads, head_dim)
        attn = dot_product_attention(q, k, v).reshape(b, s, cfg.hidden_size)
        x = residual + dense("out_proj")(attn)

        residual = x
        h = ln("layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False) if cfg.hidden_act == "gelu" else h * jax.nn.sigmoid(1.702 * h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(h)
        return residual + h


class CLIPVisionModelWithProjection(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: (B, H, W, 3) CLIP-normalized -> image_embeds (B, projection_dim)."""
        cfg = self.config
        b = pixel_values.shape[0]
        n_patches = (cfg.image_size // cfg.patch_size) ** 2

        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="patch_embedding")(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, n_patches, cfg.hidden_size)

        class_emb = self.param("class_embedding", nn.initializers.normal(0.02),
                               (cfg.hidden_size,), self.param_dtype)
        cls = jnp.broadcast_to(class_emb.astype(self.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)

        pos_emb = self.param("position_embedding", nn.initializers.normal(0.02),
                             (n_patches + 1, cfg.hidden_size), self.param_dtype)
        x = x + pos_emb.astype(self.dtype)[None]

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="pre_layrnorm")(x)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=f"layers_{i}")(x)
        pooled = x[:, 0]
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="post_layernorm")(pooled)
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="visual_projection")(pooled)
