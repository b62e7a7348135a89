"""Dataclass configs for every model / pipeline / trainer in the framework.

Replaces the reference's argparse soup (src/train.py:820-1148) and implicit
diffusers config dicts with typed, serializable dataclasses.  Defaults mirror
the SVD-xt checkpoint configuration used by the reference
(/root/reference/src/models/unet_spatio_temporal_condition.py:70-96,
controlnet_svd.py:154-185) — except where the released checkpoint config
differs from the in-code defaults (noted inline).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


def _asdict(obj) -> dict:
    return dataclasses.asdict(obj)


class _ConfigBase:
    def to_dict(self) -> dict:
        return _asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict):
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class UNetConfig(_ConfigBase):
    """Spatio-temporal SVD UNet.

    Reference: unet_spatio_temporal_condition.py:69-96.  ``in_channels=9``
    reflects the reference's 8->9 channel surgery (mask channel,
    unet_spatio_temporal_condition.py:703-707); ``num_attention_heads``
    defaults to the released SVD-xt checkpoint values (5,10,20,20) giving a
    uniform head_dim of 64 (the in-code default (5,10,10,20) is only reached
    when no checkpoint config is supplied).
    """

    sample_size: Optional[int] = None
    in_channels: int = 9
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    transformer_layers_per_block: int = 1
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    num_frames: int = 25
    # mask-token conditioning (reference :127: nn.Parameter(randn(1,1,4,1,1)))
    use_mask_token: bool = True
    latent_channels: int = 4

    @property
    def num_blocks(self) -> int:
        return len(self.block_out_channels)

    def scaled(self, factor: int) -> "UNetConfig":
        """A tiny config for tests: divide channel widths by `factor`."""
        return self.replace(
            block_out_channels=tuple(max(32, c // factor) for c in self.block_out_channels),
            num_attention_heads=tuple(max(1, h // factor) for h in self.num_attention_heads),
            cross_attention_dim=max(32, self.cross_attention_dim // factor),
            projection_class_embeddings_input_dim=768,
        )


#: Test-sized UNet (two resolutions, thin channels) used across the test suite.
TINY_UNET = UNetConfig(
    in_channels=9,
    out_channels=4,
    down_block_types=(
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    ),
    up_block_types=(
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    ),
    block_out_channels=(32, 64),
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=24,
    layers_per_block=1,
    cross_attention_dim=32,
    transformer_layers_per_block=1,
    num_attention_heads=(2, 4),
    num_frames=4,
)


@dataclass(frozen=True)
class VAEConfig(_ConfigBase):
    """AutoencoderKLTemporalDecoder (SVD VAE).

    2D KL encoder + temporal (3D-conv) decoder.  Structure mirrors the
    diffusers model loaded at src/train.py:262-266; scaling factor at
    pipeline decode (pipeline_stable_video_diffusion_efficient_interp.py:287).
    """

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    force_upcast: bool = True

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


TINY_VAE = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)


@dataclass(frozen=True)
class CLIPVisionConfig(_ConfigBase):
    """CLIP ViT-H/14 vision tower with projection (laion2B), the SVD image
    encoder (src/train.py:252-257)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"


TINY_CLIP = CLIPVisionConfig(
    image_size=32, patch_size=8, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, projection_dim=32,
)


@dataclass(frozen=True)
class ControlNetConfig(_ConfigBase):
    """Trajectory / depth ControlNet for SVD (controlnet_svd.py:116-310).

    The same module covers the subproject's depth ControlNet
    (svd-temporal-controlnet/models/controlnet_sdv2.py:119): it is the SVD
    UNet encoder plus zero-init 1x1 output convs and a 4-conv conditioning
    embedding.
    """

    in_channels: int = 8
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    transformer_layers_per_block: int = 1
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    num_frames: int = 14
    conditioning_channels: int = 3
    conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256)

    @classmethod
    def from_unet(cls, unet: UNetConfig, conditioning_channels: int = 3,
                  in_channels: Optional[int] = None) -> "ControlNetConfig":
        """Mirror ControlNetSVDModel.from_unet (controlnet_svd.py:533)."""
        return cls(
            in_channels=unet.in_channels if in_channels is None else in_channels,
            out_channels=unet.out_channels,
            down_block_types=unet.down_block_types,
            block_out_channels=unet.block_out_channels,
            addition_time_embed_dim=unet.addition_time_embed_dim,
            projection_class_embeddings_input_dim=unet.projection_class_embeddings_input_dim,
            layers_per_block=unet.layers_per_block,
            cross_attention_dim=unet.cross_attention_dim,
            transformer_layers_per_block=unet.transformer_layers_per_block,
            num_attention_heads=unet.num_attention_heads,
            conditioning_channels=conditioning_channels,
        )


@dataclass(frozen=True)
class SchedulerConfig(_ConfigBase):
    """EulerDiscreteScheduler as configured for SVD-xt (continuous/karras).

    Matches the HF scheduler the reference loads at src/train.py:246-250:
    karras sigma schedule in [0.002, 700], continuous timesteps
    t = 0.25*log(sigma), v-prediction EDM step.
    """

    num_train_timesteps: int = 1000
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0
    prediction_type: str = "v_prediction"
    s_churn: float = 0.0


@dataclass(frozen=True)
class PipelineConfig(_ConfigBase):
    """Inference defaults for the two-frame interpolation pipeline.

    Fork eval defaults at src/test.py:635-639 and pipeline signature at
    pipeline_stable_video_diffusion_efficient_interp.py:386-410.
    """

    height: int = 320
    width: int = 512
    num_frames: int = 14
    num_inference_steps: int = 30
    min_guidance_scale: float = 1.0
    max_guidance_scale: float = 3.0
    middle_max_guidance: bool = False
    fps: int = 7
    motion_bucket_id: int = 127
    noise_aug_strength: float = 0.02
    # None -> decode all frames in one chunk (the reference's
    # decode_chunk_size default, pipeline:282-308).  TPU note: chunk ~10
    # measured 30% faster per frame than chunk 5 at 1024x576 (bigger chunks
    # feed the conv pipeline; full 25f chunks OOM at 23 GB) — callers that
    # decode long videos at high res should pass ~10.
    decode_chunk_size: Optional[int] = None
    # conditioning assembly: 'interp' = the fork's 9-channel
    # [first, mask_token*, end] + mask channel (train.py:546-557);
    # 'first_frame' = the sub-project's 8-channel SVD img2vid layout
    # (first-frame latent repeated over F, single CLIP token,
    # train_svd.py:1132-1190)
    conditioning_mode: str = "interp"
    # ControlNet options (missing-pipeline surface reconstructed from
    # src/test.py:592-617 / src/app_org.py:455-476)
    with_control: bool = False
    controlnet_cond_scale: float = 1.0
    controlnet_step_range: Tuple[float, float] = (0.0, 1.0)


@dataclass(frozen=True)
class TrainConfig(_ConfigBase):
    """Shared trainer config (union of the three reference trainers, §2.3).

    Defaults follow src/train.sh:8-17 and src/train.py:905-936.
    """

    output_dir: str = "outputs/train"
    seed: int = 23123134  # reference generator seed, train_decouples.py:277
    width: int = 512
    height: int = 320
    sample_n_frames: int = 14
    per_device_batch_size: int = 2
    gradient_accumulation_steps: int = 1
    max_train_steps: int = 50_000
    learning_rate: float = 1e-4
    scale_lr: bool = False
    lr_warmup_steps: int = 0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    # reference --use_8bit_adam (bitsandbytes AdamW8bit, src/train.py:
    # 392-397), rebuilt TPU-native as blockwise int8 moment state
    # (tvi/train/adam8bit.py).  Cuts optimizer state 4x — required to fit
    # the whole-ControlNet trainer on a 16 GB chip at the reference
    # geometry (PERF.md round-5 config-5 entry).
    use_8bit_adam: bool = False
    max_grad_norm: float = 1.0
    mixed_precision: str = "bf16"
    # per-block activation rematerialization (reference train.py:377-379
    # enable_gradient_checkpointing(); rebuilt as nn.remat over the UNet's
    # down/mid/up blocks) — required to fit full-size training on one chip
    gradient_checkpointing: bool = False
    checkpointing_steps: int = 50
    checkpoints_total_limit: Optional[int] = None
    validation_steps: int = 1000
    use_ema: bool = False
    ema_decay: float = 0.9999
    # EDM sigma-sampling constants (src/train.py:49-54)
    sigma_min_value: float = 0.002
    sigma_max_value: float = 700.0
    image_d: float = 64.0
    noise_d_low: float = 32.0
    noise_d_high: float = 64.0
    sigma_data: float = 0.5
    # conditioning constants (src/train.py:568-570)
    cond_fps: int = 6
    cond_motion_bucket_id: int = 100
    cond_noise_aug_strength: float = 0.02
    # which parameters train: 'temporal' (reference: temporal transformer
    # blocks only, src/train.py:401-410), 'all', or 'controlnet'
    trainable: str = "temporal"
    # train.py conditions middles on the learnable mask token (:546-557);
    # train_decouples.py uses zeros instead (:881)
    mask_token_conditioning: bool = True
    projector_input_dim: int = 2048
    # decoupled-trainer extras (train_decouples.py:1565-1573)
    use_attention_mask: bool = False
    use_monotonicity_loss: bool = False
    lambda_attn: float = 1.0
    frame_matching: bool = False
    without_controlnet: bool = True
    # controlnet-trainer extras (train_svd.py:1164-1184)
    conditioning_dropout_prob: float = 0.1
