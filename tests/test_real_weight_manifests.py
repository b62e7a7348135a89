"""Real-checkpoint key coverage: every tensor of the public SVD-xt / framer
/ CLIP state dicts must translate to an existing flax param with the right
shape — and every flax param must be hit (VERDICT round 1, Missing #1/#3).

The manifests (tests/torch_manifests.py) mirror the torch module structure
independently of the converter, so an unmapped key family, a wrong transpose
or a silently-missing flax module all fail here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from tests.torch_manifests import (
    clip_vit_h_manifest,
    controlnet_svd_manifest,
    svd_unet_manifest,
    svd_vae_manifest,
)
from tvi.core.config import CLIPVisionConfig, ControlNetConfig, UNetConfig, VAEConfig
from tvi.io.hf_weights import (
    apply_interp_surgery,
    convert_tensor,
    extract_mask_token,
    flax_to_state_dict,
    translate_torch_key,
)


def _converted_shapes(manifest: dict) -> dict:
    """Apply the converter's name+layout mapping to a shape manifest."""
    out = {}
    for key, shape in manifest.items():
        path, kind = translate_torch_key(key)
        arr = np.empty(shape, dtype=np.uint8)  # shape-only; no data
        out[f"params/{path}"] = convert_tensor(key, arr, kind).shape
    return out


def _flax_shapes(tree) -> dict:
    flat = traverse_util.flatten_dict(tree, sep="/")
    return {k: tuple(v.shape) for k, v in flat.items()}


def _assert_manifest_covers(manifest: dict, flax_tree) -> None:
    got = _converted_shapes(manifest)
    want = _flax_shapes(flax_tree)
    unmapped = sorted(set(got) - set(want))
    missing = sorted(set(want) - set(got))
    assert not unmapped, f"{len(unmapped)} torch keys map to nonexistent flax params, e.g. {unmapped[:8]}"
    assert not missing, f"{len(missing)} flax params not covered by checkpoint, e.g. {missing[:8]}"
    bad = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:8])}"


@pytest.fixture(scope="module")
def _cpu():
    return jax.devices("cpu")[0]


class TestUNetManifest:
    def test_framer_unet_full_coverage(self):
        """wwen1997/framer_512x320 unet/ — 9 input channels + mask_token."""
        from tvi.models.unet_st import UNetSpatioTemporalConditionModel

        manifest = svd_unet_manifest(in_channels=9, with_mask_token=True)
        mask = manifest.pop("mask_token")
        assert mask == (1, 1, 4, 1, 1)
        unet = UNetSpatioTemporalConditionModel(UNetConfig())
        tree = jax.eval_shape(unet.init_params, jax.random.PRNGKey(0))
        _assert_manifest_covers(manifest, tree)

    def test_svd_xt_unet_after_surgery_matches_framer(self):
        """The released 8-ch SVD-xt state dict + the fork's surgery must
        produce exactly the framer key/shape inventory
        (unet_spatio_temporal_condition.py:703-791)."""
        sd8 = {k: np.zeros(s, np.float32)
               for k, s in svd_unet_manifest(in_channels=8).items()}
        sd9 = apply_interp_surgery(sd8, rng=np.random.RandomState(7))
        want = svd_unet_manifest(in_channels=9, with_mask_token=True)
        assert {k: v.shape for k, v in sd9.items()} == {
            k: tuple(s) for k, s in want.items()}
        # first 8 input channels preserved, 9th freshly initialized
        assert np.array_equal(sd9["conv_in.weight"][:, :8],
                              sd8["conv_in.weight"])
        assert np.abs(sd9["conv_in.weight"][:, 8]).sum() > 0
        assert extract_mask_token(sd9).shape == (4,)

    def test_key_count_is_checkpoint_scale(self):
        """The real UNet has ~1.4k tensors (24 spatio-temporal transformer
        models x ~56 + 23 st-resblocks x ~24 + embeddings); guard against a
        silently tiny manifest."""
        n = len(svd_unet_manifest(in_channels=9, with_mask_token=True))
        assert 1300 <= n <= 1550, n

    def test_roundtrip_flax_to_torch_names(self):
        """flax_to_state_dict must emit exactly the checkpoint key set."""
        from tvi.models.unet_st import UNetSpatioTemporalConditionModel

        unet = UNetSpatioTemporalConditionModel(UNetConfig())
        tree = jax.eval_shape(unet.init_params, jax.random.PRNGKey(0))
        flat = traverse_util.flatten_dict(tree, sep="/")
        fake = traverse_util.unflatten_dict(
            {k: np.empty(v.shape, np.uint8) for k, v in flat.items()}, sep="/")
        sd = flax_to_state_dict(fake)
        want = svd_unet_manifest(in_channels=9)
        assert set(sd) == set(want)


class TestVAEManifest:
    def test_vae_full_coverage(self):
        from tvi.models.vae import AutoencoderKLTemporalDecoder

        vae = AutoencoderKLTemporalDecoder(VAEConfig())
        tree = jax.eval_shape(
            lambda r, x: vae.init(r, x, 1), jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)))
        _assert_manifest_covers(svd_vae_manifest(), tree)


class TestCLIPManifest:
    def test_clip_vit_h_full_coverage(self):
        from tvi.models.clip_vision import CLIPVisionModelWithProjection

        cfg = CLIPVisionConfig()
        clip = CLIPVisionModelWithProjection(cfg)
        tree = jax.eval_shape(
            clip.init, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
        _assert_manifest_covers(clip_vit_h_manifest(), tree)


class TestControlNetManifest:
    def test_controlnet_full_coverage(self):
        from tvi.models.controlnet import ControlNetSVDModel

        cfg = ControlNetConfig(in_channels=9)
        cnet = ControlNetSVDModel(cfg)

        def init(rng):
            sample = jnp.zeros((1, 2, 8, 8, cfg.in_channels))
            ctx = (jnp.zeros((1, 2, cfg.cross_attention_dim)),
                   jnp.zeros((1, 1, cfg.cross_attention_dim)))
            cond = jnp.zeros((1, 2, 64, 64, cfg.conditioning_channels))
            return cnet.init(rng, sample, jnp.zeros((1,)), ctx,
                             jnp.zeros((1, 3)), cond)

        tree = jax.eval_shape(init, jax.random.PRNGKey(0))
        _assert_manifest_covers(controlnet_svd_manifest(in_channels=9), tree)
