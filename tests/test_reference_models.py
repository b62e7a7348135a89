"""Assembled-MODEL golden-activation parity (VERDICT r3 item 5).

tests/test_reference_blocks.py anchors individual blocks to the reference's
vendored torch code; these tests anchor the FULL assembled models — the
last offline de-risk before the real-weights SSIM gate
(compare_to_reference.py) can run:

  - UNetSpatioTemporalConditionModel   reference src/models/unet_spatio_temporal_condition.py:359-496
    (the reference file is executed directly, tuple context + 9ch fork
    deltas + intermediate features + ControlNet residual injection)
  - ControlNetSVDModel                 reference src/models/controlnet_svd.py:432-530
    (vendored file executed directly)
  - FeatureProjector                   reference src/models/feature_projector.py:6-43
  - MotionEncoder (SimpleEncoder)      reference src/train_decouples.py:349-368
  - CLIP vision tower                  installed ``transformers`` (the true oracle
    the reference loads at src/train.py:252-257)
  - AutoencoderKLTemporalDecoder       diffusers semantics re-stated in the
    shim from the reference's vendored temporal blocks
    (models/unet_3d_blocks.py:1759-1871)

All runs are fp32 CPU at tiny configs with production-converted weights
(tvi.io.hf_weights.state_dict_to_flax).  batch_size=1 everywhere the tuple
context is in play: at batch>1 the reference pairs temporal context rows
with hidden rows pixel-major (a documented quirk — see
test_reference_blocks.test_reference_temporal_context_row_order_quirk_documented);
the rebuild deliberately uses the consistent batch-major pairing.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")

import diffusers_shim  # noqa: E402

diffusers_shim.install()

from tvi.core.config import (  # noqa: E402
    TINY_CLIP,
    TINY_UNET,
    ControlNetConfig,
    UNetConfig,
    VAEConfig,
)
from tvi.io.hf_weights import state_dict_to_flax  # noqa: E402
from tvi.models.clip_vision import CLIPVisionModelWithProjection  # noqa: E402
from tvi.models.controlnet import ControlNetSVDModel  # noqa: E402
from tvi.models.projector import FeatureProjector, MotionEncoder  # noqa: E402
from tvi.models.unet_st import UNetSpatioTemporalConditionModel  # noqa: E402
from tvi.models.vae import AutoencoderKLTemporalDecoder  # noqa: E402

# accumulated fp32 error through full assembled models at tiny configs;
# measured max deviation ~2e-4, gate at 1e-3
ATOL = 1e-3
RTOL = 1e-4

TINY_REF_UNET_KWARGS = dict(
    in_channels=TINY_UNET.in_channels,
    out_channels=TINY_UNET.out_channels,
    down_block_types=TINY_UNET.down_block_types,
    up_block_types=TINY_UNET.up_block_types,
    block_out_channels=TINY_UNET.block_out_channels,
    addition_time_embed_dim=TINY_UNET.addition_time_embed_dim,
    projection_class_embeddings_input_dim=TINY_UNET.projection_class_embeddings_input_dim,
    layers_per_block=TINY_UNET.layers_per_block,
    cross_attention_dim=TINY_UNET.cross_attention_dim,
    transformer_layers_per_block=TINY_UNET.transformer_layers_per_block,
    num_attention_heads=TINY_UNET.num_attention_heads,
    num_frames=TINY_UNET.num_frames,
)


def _sd(module: torch.nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _to_flax(module: torch.nn.Module, drop=("mask_token",)) -> dict:
    sd = _sd(module)
    for k in drop:
        sd.pop(k, None)
    return state_dict_to_flax(sd)


def _nhwc(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _bfhwc(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy().transpose(0, 1, 3, 4, 2))


@pytest.fixture(autouse=True)
def _seed():
    torch.manual_seed(0)


def _make_ref_unet():
    from models.unet_spatio_temporal_condition import (  # reference code
        UNetSpatioTemporalConditionModel as RefUNet,
    )

    return RefUNet(**TINY_REF_UNET_KWARGS).eval()


class TestUNetOracle:
    def test_full_forward_and_intermediates(self):
        """Assembled UNet: tuple (spatial, temporal) context, 9-channel
        input, EDM timestep, added_time_ids, up-block intermediate features
        (reference :359-496)."""
        ref = _make_ref_unet()
        b, f, h, w = 1, 4, 16, 16
        sample = torch.randn(b, f, 9, h, w)
        ctx = (torch.randn(b, 2, 32), torch.randn(b, 1, 32))
        ids = torch.rand(b, 3)
        with torch.no_grad():
            want, want_feats = ref(sample, torch.tensor(0.5), ctx, ids,
                                   return_dict=False)

        model = UNetSpatioTemporalConditionModel(TINY_UNET)
        got, got_feats = model.apply(
            _to_flax(ref), _bfhwc(sample), jnp.asarray([0.5]),
            tuple(jnp.asarray(c.numpy()) for c in ctx),
            jnp.asarray(ids.numpy()))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 1, 4, 2, 3), want.numpy(),
            atol=ATOL, rtol=RTOL)
        assert len(got_feats) == len(want_feats)
        for gf, wf in zip(got_feats, want_feats):
            np.testing.assert_allclose(
                np.asarray(gf).transpose(0, 3, 1, 2), wf.numpy(),
                atol=ATOL, rtol=RTOL)

    def test_controlnet_residual_injection(self):
        """Skip-stack + mid residual addition (reference :446-461) with
        fabricated ControlNet outputs."""
        ref = _make_ref_unet()
        b, f, h, w = 1, 4, 16, 16
        sample = torch.randn(b, f, 9, h, w)
        ctx = (torch.randn(b, 2, 32), torch.randn(b, 1, 32))
        ids = torch.rand(b, 3)
        # skip stack at TINY_UNET: conv_in + 1 resnet/block + 1 downsampler
        shapes = [(b * f, 32, h, w), (b * f, 32, h, w),
                  (b * f, 32, h // 2, w // 2), (b * f, 64, h // 2, w // 2)]
        down_res = [0.1 * torch.randn(*s) for s in shapes]
        mid_res = 0.1 * torch.randn(b * f, 64, h // 2, w // 2)
        with torch.no_grad():
            want, _ = ref(sample, torch.tensor(-1.2), ctx, ids,
                          down_block_additional_residuals=list(down_res),
                          mid_block_additional_residual=mid_res,
                          return_dict=False)

        model = UNetSpatioTemporalConditionModel(TINY_UNET)
        got, _ = model.apply(
            _to_flax(ref), _bfhwc(sample), jnp.asarray([-1.2]),
            tuple(jnp.asarray(c.numpy()) for c in ctx),
            jnp.asarray(ids.numpy()),
            down_block_residuals=[_nhwc(r) for r in down_res],
            mid_block_residual=_nhwc(mid_res))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 1, 4, 2, 3), want.numpy(),
            atol=ATOL, rtol=RTOL)

    def test_single_token_8ch_forward(self):
        """The subproject's stock-SVD configuration: 8 input channels and a
        plain (non-tuple) context routed to both attention paths
        (svd-temporal-controlnet UNet; reference forward :407-409 else
        branch)."""
        from models.unet_spatio_temporal_condition import (  # reference code
            UNetSpatioTemporalConditionModel as RefUNet,
        )

        kwargs = dict(TINY_REF_UNET_KWARGS, in_channels=8)
        ref = RefUNet(**kwargs).eval()
        b, f, h, w = 1, 4, 16, 16
        sample = torch.randn(b, f, 8, h, w)
        ctx = torch.randn(b, 1, 32)
        ids = torch.rand(b, 3)
        with torch.no_grad():
            want, _ = ref(sample, torch.tensor(0.25), ctx, ids,
                          return_dict=False)

        cfg = UNetConfig(**{**TINY_UNET.to_dict(), "in_channels": 8}) \
            if hasattr(TINY_UNET, "to_dict") else None
        if cfg is None:
            import dataclasses
            cfg = dataclasses.replace(TINY_UNET, in_channels=8)
        model = UNetSpatioTemporalConditionModel(cfg)
        got, _ = model.apply(
            _to_flax(ref), _bfhwc(sample), jnp.asarray([0.25]),
            jnp.asarray(ctx.numpy()), jnp.asarray(ids.numpy()))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 1, 4, 2, 3), want.numpy(),
            atol=ATOL, rtol=RTOL)


def test_controlnet_matches_reference():
    """Vendored ControlNetSVDModel (controlnet_svd.py:432-530) executed
    directly: conditioning embedding, encoder, zero-init 1x1 heads,
    conditioning_scale."""
    from models.controlnet_svd import ControlNetSVDModel as RefControlNet

    cfg = ControlNetConfig.from_unet(TINY_UNET, in_channels=8)
    ref = RefControlNet(
        in_channels=8, out_channels=4,
        down_block_types=cfg.down_block_types,
        up_block_types=TINY_UNET.up_block_types,  # unused; length-validated
        block_out_channels=cfg.block_out_channels,
        addition_time_embed_dim=cfg.addition_time_embed_dim,
        projection_class_embeddings_input_dim=cfg.projection_class_embeddings_input_dim,
        layers_per_block=cfg.layers_per_block,
        cross_attention_dim=cfg.cross_attention_dim,
        transformer_layers_per_block=cfg.transformer_layers_per_block,
        num_attention_heads=cfg.num_attention_heads,
        num_frames=4,
        conditioning_channels=cfg.conditioning_channels,
        conditioning_embedding_out_channels=cfg.conditioning_embedding_out_channels,
    ).eval()
    # zero-init heads make the outputs zero; randomize them so the
    # comparison is non-trivial
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "controlnet_" in name or "conv_out" in name:
                p.copy_(0.05 * torch.randn_like(p))

    b, f, h, w = 1, 4, 8, 8
    sample = torch.randn(b, f, 8, h, w)
    ctx = torch.randn(b, 1, 32)
    ids = torch.rand(b, 3)
    cond = torch.randn(b, f, 3, 8 * h, 8 * w)
    with torch.no_grad():
        want_down, want_mid = ref(sample, torch.tensor(0.7), ctx, ids,
                                  controlnet_cond=cond, return_dict=False,
                                  conditioning_scale=1.5)

    model = ControlNetSVDModel(cfg)
    got_down, got_mid = model.apply(
        _to_flax(ref), _bfhwc(sample), jnp.asarray([0.7]),
        jnp.asarray(ctx.numpy()), jnp.asarray(ids.numpy()),
        _bfhwc(cond), conditioning_scale=1.5)
    assert len(got_down) == len(want_down)
    for g, wt in zip(got_down, want_down):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   wt.numpy(), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(got_mid).transpose(0, 3, 1, 2),
                               want_mid.numpy(), atol=ATOL, rtol=RTOL)


def test_feature_projector_matches_reference():
    from models.feature_projector import FeatureProjector as RefProjector

    ref = RefProjector(input_dim=48, output_dim=24).eval()
    x = torch.randn(3, 48)
    with torch.no_grad():
        want = ref(x)
    sd = {k.replace("linear", "proj"): v for k, v in _sd(ref).items()}
    got = FeatureProjector(output_dim=24).apply(
        state_dict_to_flax(sd), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_motion_encoder_matches_reference():
    """SimpleEncoder (train_decouples.py:349-368): conv(1->16->32->64,
    stride 2) + ReLU, global average pool, Linear(64 -> out)."""
    enc = torch.nn.Sequential(
        torch.nn.Conv2d(1, 16, kernel_size=3, stride=2, padding=1),
        torch.nn.ReLU(),
        torch.nn.Conv2d(16, 32, kernel_size=3, stride=2, padding=1),
        torch.nn.ReLU(),
        torch.nn.Conv2d(32, 64, kernel_size=3, stride=2, padding=1),
        torch.nn.ReLU(),
        torch.nn.AdaptiveAvgPool2d((1, 1)),
    )
    proj = torch.nn.Linear(64, 20)
    x = torch.randn(2, 1, 32, 32)
    with torch.no_grad():
        want = proj(enc(x).view(x.size(0), -1))

    remap = {"0": "conv_0", "2": "conv_1", "4": "conv_2"}
    sd = {f"{remap[k.split('.')[0]]}.{k.split('.')[1]}": v.detach().numpy()
          for k, v in enc.state_dict().items()}
    sd.update({f"fc.{k}": v.detach().numpy()
               for k, v in proj.state_dict().items()})
    got = MotionEncoder(output_dim=20).apply(
        state_dict_to_flax(sd), _nhwc(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_clip_vision_matches_reference():
    """True oracle: the installed ``transformers``
    CLIPVisionModelWithProjection (what the reference loads at
    src/train.py:252-257) at a tiny config."""
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.CLIPVisionConfig(
        image_size=TINY_CLIP.image_size, patch_size=TINY_CLIP.patch_size,
        hidden_size=TINY_CLIP.hidden_size,
        num_hidden_layers=TINY_CLIP.num_layers,
        num_attention_heads=TINY_CLIP.num_heads,
        intermediate_size=TINY_CLIP.intermediate_size,
        projection_dim=TINY_CLIP.projection_dim, hidden_act="gelu")
    ref = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    pixels = torch.randn(2, 3, TINY_CLIP.image_size, TINY_CLIP.image_size)
    with torch.no_grad():
        want = ref(pixel_values=pixels).image_embeds

    got = CLIPVisionModelWithProjection(TINY_CLIP).apply(
        _to_flax(ref), _nhwc(pixels))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-4, rtol=1e-4)


class TestVAEOracle:
    """The SVD VAE against the diffusers-semantics torch assembly built in
    the shim from the reference's vendored temporal decoder blocks
    (models/unet_3d_blocks.py:1759-1871) and vendored Attention."""

    CFG = VAEConfig(block_out_channels=(32, 64), layers_per_block=2)

    def _models(self):
        ref = diffusers_shim.build_autoencoder_kl_temporal_decoder(
            block_out_channels=self.CFG.block_out_channels,
            layers_per_block=self.CFG.layers_per_block).eval()
        return ref, AutoencoderKLTemporalDecoder(self.CFG)

    def test_encode_moments(self):
        ref, model = self._models()
        x = torch.randn(3, 3, 32, 32)
        with torch.no_grad():
            want = ref.encode_moments(x)
        mean, logvar = model.apply(_to_flax(ref), _nhwc(x),
                                   method="encode_moments")
        got = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1)
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want.numpy(),
                                   atol=ATOL, rtol=RTOL)

    def test_decode(self):
        ref, model = self._models()
        f = 4
        z = torch.randn(f, 4, 8, 8)
        with torch.no_grad():
            want = ref.decode(z, num_frames=f)
        got = model.apply(_to_flax(ref), _nhwc(z), f, method="decode")
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            atol=ATOL, rtol=RTOL)
