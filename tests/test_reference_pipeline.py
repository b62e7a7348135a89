"""Assembled-PIPELINE oracle: execute the reference pipeline file end-to-end
(VERDICT r4 item 3 — the last offline de-risk before the real-weights SSIM
gate).

``src/pipelines/pipeline_stable_video_diffusion_efficient_interp.py:373-586``
runs directly on torch CPU (diffusers shimmed, tests/diffusers_shim.py) at a
tiny config with production-converted shared weights and injected fixed
noise, and the FINAL LATENTS must match ``InterpolationPipeline.__call__``.
This pins every small convention the per-module oracles cannot see:

  - cond-latent assembly [first, mask_token*(F-2), end] + mask channel
    (pipeline:506-520)
  - the ``fps = fps - 1`` SVD convention (pipeline:452)
  - noise-aug ORDER: preprocess -> +noise in image space -> VAE encode
    (pipeline:456-476)
  - CFG zero-embed / zero-latent prepend (pipeline:222-227, 239-246)
  - per-frame guidance broadcast via _append_dims (pipeline:523-532)
  - scheduler conventions: init_noise_sigma scaling of injected latents
    (pipeline:495-504), scale_model_input -> channel-concat order
    (pipeline:542-546), Euler v-prediction step (pipeline:569)
  - CLIP path: [-1,1] antialiased 224 resize -> normalize (pipeline:190-216)
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

import diffusers_shim  # noqa: E402

diffusers_shim.install()

from tvi.core.config import (  # noqa: E402
    TINY_UNET,
    CLIPVisionConfig,
    PipelineConfig,
    VAEConfig,
)
from tvi.io.hf_weights import state_dict_to_flax  # noqa: E402
from tvi.pipelines.factory import build_pipeline  # noqa: E402

# reference hardcodes the 224x224 CLIP resize (pipeline:199), so the tiny
# CLIP must be a 224-input tower
TINY_CLIP_224 = CLIPVisionConfig(
    image_size=224, patch_size=32, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, projection_dim=TINY_UNET.cross_attention_dim)

# channels must satisfy torch GroupNorm(32, C) in the shim VAE, so the
# oracle VAE is one notch wider than TINY_VAE (same as TestVAEOracle.CFG)
ORACLE_VAE = VAEConfig(block_out_channels=(32, 64), layers_per_block=2)

H = W = 32
F_ = TINY_UNET.num_frames          # 4
STEPS = 3
LAT = H // ORACLE_VAE.downscale_factor  # 16

# fp32 end-to-end through 3 denoise steps of assembled tiny models;
# single-forward model oracles pass at 1e-3 (test_reference_models.ATOL)
ATOL = 5e-3
RTOL = 1e-3


def _sd(module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _build_reference_pipeline(with_projector: bool):
    import types as _types

    from models.unet_spatio_temporal_condition import (  # reference code
        UNetSpatioTemporalConditionModel as RefUNet,
    )
    from pipelines.pipeline_stable_video_diffusion_efficient_interp import (  # noqa: E402
        StableVideoDiffusionEfficientInterpPipeline as RefPipe,
    )

    from tests.test_reference_models import TINY_REF_UNET_KWARGS

    torch.manual_seed(0)
    unet = RefUNet(**TINY_REF_UNET_KWARGS).eval()
    # the shim's register_to_config is inert; the pipeline reads these
    unet.config = _types.SimpleNamespace(
        in_channels=TINY_UNET.in_channels, num_frames=F_,
        addition_time_embed_dim=TINY_UNET.addition_time_embed_dim,
        time_cond_proj_dim=None, sample_size=None)

    vae = diffusers_shim.AutoencoderKLTemporalDecoderHF(
        block_out_channels=ORACLE_VAE.block_out_channels,
        layers_per_block=ORACLE_VAE.layers_per_block).eval()

    hf_cfg = transformers.CLIPVisionConfig(
        image_size=TINY_CLIP_224.image_size, patch_size=TINY_CLIP_224.patch_size,
        hidden_size=TINY_CLIP_224.hidden_size,
        num_hidden_layers=TINY_CLIP_224.num_layers,
        num_attention_heads=TINY_CLIP_224.num_heads,
        intermediate_size=TINY_CLIP_224.intermediate_size,
        projection_dim=TINY_CLIP_224.projection_dim, hidden_act="gelu")
    clip = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()

    projector = None
    if with_projector:
        from models.feature_projector import (  # reference code
            FeatureProjector as RefProjector,
        )

        projector = RefProjector(
            input_dim=2 * TINY_UNET.cross_attention_dim,
            output_dim=TINY_UNET.cross_attention_dim).eval()

    pipe = RefPipe(
        vae=vae, image_encoder=clip, unet=unet,
        scheduler=diffusers_shim.TorchEulerDiscreteScheduler(),
        feature_extractor=transformers.CLIPImageProcessor(),
        controlnet=None, pose_encoder=None)
    return pipe, unet, vae, clip, projector


def _build_tvi_pipeline(unet, vae, clip, projector):
    params = {
        "unet": state_dict_to_flax(
            {k: v for k, v in _sd(unet).items() if k != "mask_token"}),
        "vae": state_dict_to_flax(_sd(vae.inner)),
        "clip": state_dict_to_flax(_sd(clip)),
        "mask_token": jnp.asarray(
            unet.mask_token.detach().numpy().reshape(4)),
    }
    if projector is not None:
        params["projector"] = state_dict_to_flax(
            {k.replace("linear", "proj"): v.detach().numpy()
             for k, v in projector.state_dict().items()})
    return build_pipeline(
        jax.random.PRNGKey(0), unet_config=TINY_UNET, vae_config=ORACLE_VAE,
        clip_config=TINY_CLIP_224, with_projector=projector is not None,
        projector_input_dim=2 * TINY_UNET.cross_attention_dim,
        dtype=jnp.float32, params=params)


def _fixed_noise():
    rs = np.random.RandomState(7)
    aug1 = rs.randn(1, 3, H, W).astype(np.float32)
    aug2 = rs.randn(1, 3, H, W).astype(np.float32)
    init = rs.randn(1, F_, 4, LAT, LAT).astype(np.float32)
    return aug1, aug2, init


def _run_reference(pipe, projector, do_motion_prompt: bool,
                   middle_max: bool = False):
    import pipelines.pipeline_stable_video_diffusion_efficient_interp as ref_mod

    rs = np.random.RandomState(3)
    img0 = (rs.rand(H, W, 3) * 255).astype(np.uint8)
    img1 = (rs.rand(H, W, 3) * 255).astype(np.uint8)
    aug1, aug2, init = _fixed_noise()

    queue = [torch.from_numpy(aug1), torch.from_numpy(aug2)]
    orig = ref_mod.randn_tensor
    ref_mod.randn_tensor = lambda shape, **k: queue.pop(0)
    try:
        with torch.no_grad():
            latents = pipe(
                Image.fromarray(img0), Image.fromarray(img1),
                height=H, width=W, num_frames=F_,
                num_inference_steps=STEPS,
                min_guidance_scale=1.0, max_guidance_scale=3.0,
                fps=6, motion_bucket_id=127, noise_aug_strength=0.02,
                latents=torch.from_numpy(init),
                output_type="latent", return_dict=False,
                middle_max_guidance=middle_max,
                projector=projector, do_motion_prompt=do_motion_prompt)
    finally:
        ref_mod.randn_tensor = orig
    assert not queue, "reference consumed fewer noise draws than injected"
    return img0, img1, latents.numpy()


def _run_tvi(tvi_pipe, img0, img1, do_motion_prompt: bool,
             middle_max: bool = False):
    aug1, aug2, init = _fixed_noise()
    # both pipelines apply the fps-1 convention internally, so cfg.fps
    # equals the reference's fps kwarg (6)
    cfg = PipelineConfig(
        height=H, width=W, num_frames=F_, num_inference_steps=STEPS,
        min_guidance_scale=1.0, max_guidance_scale=3.0, fps=6,
        motion_bucket_id=127, noise_aug_strength=0.02,
        middle_max_guidance=middle_max)
    lat = tvi_pipe(
        img0[None].astype(np.float32) / 255.0,
        img1[None].astype(np.float32) / 255.0,
        jax.random.PRNGKey(0), config=cfg,
        do_motion_prompt=do_motion_prompt, output_type="latent",
        init_noise=init.transpose(0, 1, 3, 4, 2),
        aug_noise=(aug1.transpose(0, 2, 3, 1), aug2.transpose(0, 2, 3, 1)))
    return np.asarray(lat, np.float32).transpose(0, 1, 4, 2, 3)


@pytest.mark.parametrize("with_projector,middle_max",
                         [(True, False), (False, False), (True, True)],
                         ids=["tuple_ctx_projector", "single_token",
                              "middle_max_guidance"])
def test_reference_pipeline_final_latent_parity(with_projector, middle_max,
                                                monkeypatch):
    """Full reference pipeline __call__ vs InterpolationPipeline on shared
    converted weights + identical injected noise: final latents match.

    TVI_REF_CTX_QUIRK=1 makes the rebuild replicate the reference's
    pixel-major temporal-context pairing at batch>1 (the CFG pair), which
    is otherwise the rebuild's one deliberate semantic fix
    (test_reference_blocks.py::test_reference_temporal_context_row_order_
    quirk_documented) — with it on, parity is exact, proving every OTHER
    convention matches."""
    monkeypatch.setenv("TVI_REF_CTX_QUIRK", "1")
    ref_pipe, unet, vae, clip, projector = _build_reference_pipeline(
        with_projector)
    tvi_pipe = _build_tvi_pipeline(unet, vae, clip, projector)

    img0, img1, want = _run_reference(ref_pipe, projector,
                                      do_motion_prompt=with_projector,
                                      middle_max=middle_max)
    got = _run_tvi(tvi_pipe, img0, img1, do_motion_prompt=with_projector,
                   middle_max=middle_max)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def test_quirk_fix_is_the_only_divergence(monkeypatch):
    """Without the quirk replication, the SAME run diverges O(1) — pins
    that the batch-major context pairing is the rebuild's only deliberate
    deviation from the reference pipeline (PARITY.md Fidelity gates)."""
    ref_pipe, unet, vae, clip, projector = _build_reference_pipeline(True)
    tvi_pipe = _build_tvi_pipeline(unet, vae, clip, projector)
    img0, img1, want = _run_reference(ref_pipe, projector,
                                      do_motion_prompt=True)
    monkeypatch.delenv("TVI_REF_CTX_QUIRK", raising=False)
    got = _run_tvi(tvi_pipe, img0, img1, do_motion_prompt=True)
    assert np.abs(got - want).max() > 0.05, (
        "expected the documented pixel-major context quirk to matter at "
        "the CFG pair; if this fails the reference path changed")
