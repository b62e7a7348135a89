"""Pipeline construction helpers.

``build_pipeline`` wires up the module zoo + parameter pytrees into an
``InterpolationPipeline``.  Params can come from random init (tests, perf
benchmarks — no released weights ship with this repo) or from an Orbax
checkpoint directory (tvi.io.orbax_ckpt).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tvi.core.config import (
    CLIPVisionConfig,
    ControlNetConfig,
    PipelineConfig,
    SchedulerConfig,
    TINY_CLIP,
    TINY_UNET,
    TINY_VAE,
    UNetConfig,
    VAEConfig,
)
from tvi.diffusion.euler import EulerDiscreteScheduler
from tvi.models.clip_vision import CLIPVisionModelWithProjection
from tvi.models.controlnet import ControlNetSVDModel
from tvi.models.projector import FeatureProjector
from tvi.models.unet_st import UNetSpatioTemporalConditionModel
from tvi.models.vae import AutoencoderKLTemporalDecoder
from tvi.pipelines.interp import InterpolationPipeline


def build_pipeline(
    rng: jax.Array,
    unet_config: UNetConfig = UNetConfig(),
    vae_config: VAEConfig = VAEConfig(),
    clip_config: CLIPVisionConfig = CLIPVisionConfig(),
    scheduler_config: SchedulerConfig = SchedulerConfig(),
    with_controlnet: bool = False,
    with_projector: bool = False,
    projector_input_dim: int = 2048,
    dtype=jnp.bfloat16,
    params: Optional[dict] = None,
) -> InterpolationPipeline:
    """Random-init (or ``params``-supplied) pipeline."""
    r_unet, r_vae, r_clip, r_cn, r_proj, r_mask = jax.random.split(rng, 6)

    unet = UNetSpatioTemporalConditionModel(unet_config, dtype=dtype)
    vae = AutoencoderKLTemporalDecoder(vae_config, dtype=dtype)
    clip = CLIPVisionModelWithProjection(clip_config, dtype=dtype)

    params = params or {}
    if "unet" not in params:
        params["unet"] = unet.init_params(r_unet)
    if "vae" not in params:
        params["vae"] = vae.init(
            r_vae, jnp.zeros((1, 32, 32, 3), dtype), 1)
    if "clip" not in params:
        params["clip"] = clip.init(
            r_clip, jnp.zeros((1, clip_config.image_size, clip_config.image_size, 3), dtype))
    if "mask_token" not in params:
        params["mask_token"] = jax.random.normal(r_mask, (4,), jnp.float32)

    controlnet = cn_params = None
    if with_controlnet:
        cn_config = ControlNetConfig.from_unet(unet_config)
        controlnet = ControlNetSVDModel(cn_config, dtype=dtype)
        if "controlnet" not in params:
            f, h, w = 2, 16, 16
            params["controlnet"] = controlnet.init(
                r_cn,
                jnp.zeros((1, f, h, w, cn_config.in_channels), dtype),
                jnp.zeros(()),
                (jnp.zeros((1, 2, cn_config.cross_attention_dim), dtype),
                 jnp.zeros((1, 1, cn_config.cross_attention_dim), dtype)),
                jnp.zeros((1, 3)),
                jnp.zeros((1, f, h * 8, w * 8, cn_config.conditioning_channels), dtype),
            )
        cn_params = params["controlnet"]

    projector = proj_params = None
    if with_projector:
        projector = FeatureProjector(output_dim=unet_config.cross_attention_dim, dtype=dtype)
        if "projector" not in params:
            params["projector"] = projector.init(
                r_proj, jnp.zeros((1, 1, projector_input_dim), dtype))
        proj_params = params["projector"]

    return InterpolationPipeline(
        unet=unet, unet_params=params["unet"],
        vae=vae, vae_params=params["vae"],
        clip=clip, clip_params=params["clip"],
        mask_token=params["mask_token"],
        scheduler=EulerDiscreteScheduler(scheduler_config),
        projector=projector, projector_params=proj_params,
        controlnet=controlnet, controlnet_params=cn_params,
        dtype=dtype,
    )


def build_tiny_pipeline(rng: jax.Array, **kw) -> InterpolationPipeline:
    """Test-sized pipeline (thin channels, 2 blocks).  The projector input
    dim defaults to the concat (do_motion_prompt) usage, 2x the embedding
    dim; pass projector_input_dim=cross_attention_dim for the
    single-embedding projector path (pipeline:446-449)."""
    tiny_clip = TINY_CLIP.replace(projection_dim=TINY_UNET.cross_attention_dim)
    kw.setdefault("projector_input_dim", 2 * TINY_UNET.cross_attention_dim)
    return build_pipeline(
        rng, unet_config=TINY_UNET, vae_config=TINY_VAE, clip_config=tiny_clip,
        **kw)
