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


def _load_hf_subfolder(root: str, sub: str) -> Optional[dict]:
    """Merge all .safetensors (or torch .bin) shards under <root>/<sub>/."""
    import glob
    import os

    from tvi.io.hf_weights import load_state_dict

    d = os.path.join(root, sub)
    if not os.path.isdir(d):
        return None
    files = sorted(glob.glob(os.path.join(d, "*.safetensors"))) or \
        sorted(glob.glob(os.path.join(d, "*.bin")))
    if not files:
        return None
    sd: dict = {}
    for f in files:
        sd.update(load_state_dict(f))
    return sd


def build_pipeline_from_hf(
    weights_root: str,
    unet_subfolder: str = "unet",
    controlnet_subfolder: str = "controlnet",
    dtype=jnp.bfloat16,
    unet_config: UNetConfig = UNetConfig(),
    vae_config: VAEConfig = VAEConfig(),
    clip_config: CLIPVisionConfig = CLIPVisionConfig(),
) -> InterpolationPipeline:
    """Assemble the pipeline from HF-layout checkpoint folders.

    ``weights_root`` holds diffusers-style subfolders: ``unet/`` (SVD-xt or
    framer_512x320 — 8-channel checkpoints get the fork's 8->9 surgery,
    reference unet_spatio_temporal_condition.py:703-791), ``vae/``,
    ``image_encoder/`` and optionally ``controlnet/``.  Key translation is
    tvi.io.hf_weights (coverage proven tensor-by-tensor against the public
    manifests in tests/test_real_weight_manifests.py).
    """
    import numpy as np

    from tvi.io.hf_weights import (
        apply_interp_surgery,
        extract_mask_token,
        state_dict_to_flax,
    )

    unet_sd = _load_hf_subfolder(weights_root, unet_subfolder)
    vae_sd = _load_hf_subfolder(weights_root, "vae")
    clip_sd = _load_hf_subfolder(weights_root, "image_encoder")
    cn_sd = _load_hf_subfolder(weights_root, controlnet_subfolder)
    missing = [n for n, sd in
               (("unet", unet_sd), ("vae", vae_sd), ("image_encoder", clip_sd))
               if sd is None]
    if missing:
        raise FileNotFoundError(
            f"missing checkpoint subfolders under {weights_root}: {missing}")

    if unet_sd["conv_in.weight"].shape[1] == 8:
        unet_sd = apply_interp_surgery(unet_sd)
    mask_token = extract_mask_token(unet_sd)
    unet_sd.pop("mask_token", None)

    def cast(sd):
        return {k: np.asarray(v, np.float32) for k, v in sd.items()}

    params = {
        "unet": state_dict_to_flax(cast(unet_sd)),
        "vae": state_dict_to_flax(cast(vae_sd)),
        "clip": state_dict_to_flax(cast(clip_sd)),
        "mask_token": jnp.asarray(mask_token, jnp.float32),
    }
    if cn_sd is not None:
        params["controlnet"] = state_dict_to_flax(cast(cn_sd))

    return build_pipeline(
        jax.random.PRNGKey(0), unet_config=unet_config, vae_config=vae_config,
        clip_config=clip_config, with_controlnet=cn_sd is not None,
        dtype=dtype, params=params)


def build_tiny_pipeline(rng: jax.Array, **kw) -> InterpolationPipeline:
    """Test-sized pipeline (thin channels, 2 blocks).  The projector input
    dim defaults to the concat (do_motion_prompt) usage, 2x the embedding
    dim; pass projector_input_dim=cross_attention_dim for the
    single-embedding projector path (pipeline:446-449)."""
    tiny_clip = TINY_CLIP.replace(projection_dim=TINY_UNET.cross_attention_dim)
    kw.setdefault("projector_input_dim", 2 * TINY_UNET.cross_attention_dim)
    kw.setdefault("unet_config", TINY_UNET)
    kw.setdefault("vae_config", TINY_VAE)
    kw.setdefault("clip_config", tiny_clip)
    return build_pipeline(rng, **kw)
