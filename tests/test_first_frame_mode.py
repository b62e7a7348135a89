"""The sub-project's true 8-channel first-frame conditioning
(svd-temporal-controlnet/train_svd.py:1132-1190, run_inference.py:277-287):
first-frame latent repeated over F frames, single CLIP token, no mask
channel/token — VERDICT round 1, Missing #5.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.core.config import TINY_UNET, PipelineConfig
from tvi.pipelines.conditioning import assemble_first_frame_conditioning


class TestAssembly:
    def test_repeats_first_latent_no_mask_channel(self):
        lat = jnp.asarray(np.random.RandomState(0).rand(2, 4, 6, 4), jnp.float32)
        out = assemble_first_frame_conditioning(lat, num_frames=5)
        assert out.shape == (2, 5, 4, 6, 4)  # 4 channels: no mask channel
        for f in range(5):
            np.testing.assert_array_equal(np.asarray(out[:, f]), np.asarray(lat))


@pytest.fixture(scope="module")
def pipe8():
    from tvi.pipelines.factory import build_tiny_pipeline

    return build_tiny_pipeline(
        jax.random.PRNGKey(0), with_controlnet=True, dtype=jnp.float32,
        unet_config=TINY_UNET.replace(in_channels=8, use_mask_token=False))


class TestFirstFramePipeline:
    def test_generates_8ch_end_to_end(self, pipe8):
        f = TINY_UNET.num_frames
        cfg = PipelineConfig(height=16, width=16, num_frames=f,
                             num_inference_steps=2,
                             conditioning_mode="first_frame")
        img = np.random.RandomState(1).rand(1, 16, 16, 3).astype(np.float32)
        frames = pipe8(img, None, jax.random.PRNGKey(0), config=cfg)
        assert frames.shape == (1, f, 16, 16, 3)

    def test_conditioning_image_matters(self, pipe8):
        f = TINY_UNET.num_frames
        cfg = PipelineConfig(height=16, width=16, num_frames=f,
                             num_inference_steps=2,
                             conditioning_mode="first_frame")
        rs = np.random.RandomState(2)
        img_a = rs.rand(1, 16, 16, 3).astype(np.float32)
        img_b = rs.rand(1, 16, 16, 3).astype(np.float32)
        la = pipe8(img_a, None, jax.random.PRNGKey(0), config=cfg,
                   output_type="latent")
        lb = pipe8(img_b, None, jax.random.PRNGKey(0), config=cfg,
                   output_type="latent")
        assert not np.allclose(np.asarray(la), np.asarray(lb))

    def test_controlnet_branch_active(self, pipe8):
        f = TINY_UNET.num_frames
        cfg = PipelineConfig(height=16, width=16, num_frames=f,
                             num_inference_steps=2, with_control=True,
                             conditioning_mode="first_frame",
                             controlnet_cond_scale=0.7)
        rs = np.random.RandomState(3)
        img = rs.rand(1, 16, 16, 3).astype(np.float32)
        ch, cw = pipe8.controlnet_cond_size(16, 16)
        cond_a = rs.rand(1, f, ch, cw, 3).astype(np.float32)
        cond_b = rs.rand(1, f, ch, cw, 3).astype(np.float32)
        la = pipe8(img, None, jax.random.PRNGKey(0), config=cfg,
                   controlnet_cond=cond_a, output_type="latent")
        lb = pipe8(img, None, jax.random.PRNGKey(0), config=cfg,
                   controlnet_cond=cond_b, output_type="latent")
        # random-init ControlNet output convs are zero-init, but from_unet
        # weights make the embedding nonzero only after training; at init the
        # 1x1s are zeros so outputs must be EQUAL
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


class TestRunInferenceCLI:
    def test_tiny_end_to_end(self, tmp_path):
        import PIL.Image

        from tvi.apps.run_inference import main

        img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
        img_path = tmp_path / "img.png"
        PIL.Image.fromarray(img).save(img_path)
        cond_dir = tmp_path / "depth"
        os.makedirs(cond_dir)
        for i in range(3):
            PIL.Image.fromarray(img).save(cond_dir / f"frame_{i}.png")
        out_dir = tmp_path / "out"
        main(["--image", str(img_path), "--cond_dir", str(cond_dir),
              "--output_dir", str(out_dir), "--tiny", "--steps", "2",
              "--height", "16", "--width", "16",
              "--num_frames", str(TINY_UNET.num_frames)])
        assert (out_dir / "side_by_side.gif").exists()
        assert (out_dir / "frame_00.png").exists()
