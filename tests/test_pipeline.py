"""End-to-end pipeline tests on the tiny model zoo (random weights).

These are the golden-path equivalents of the reference's eval sweeps
(SURVEY §4): the full two-image -> video program must compile, run, and
respect the conditioning layout invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.core.config import PipelineConfig
from tvi.diffusion.edm import edm_preconditioning, rand_cosine_interpolated
from tvi.diffusion.euler import EulerDiscreteScheduler, karras_sigmas
from tvi.diffusion.guidance import frame_guidance_scale
from tvi.pipelines.conditioning import CondAblations, assemble_conditioning_latents
from tvi.pipelines.factory import build_tiny_pipeline

TINY_CFG = PipelineConfig(height=32, width=32, num_frames=4,
                          num_inference_steps=2, fps=7,
                          decode_chunk_size=2)


@pytest.fixture(scope="module")
def pipe():
    return build_tiny_pipeline(jax.random.PRNGKey(0))


class TestScheduler:
    def test_karras_sigma_table(self):
        s = karras_sigmas(25, 0.002, 700.0)
        assert s[0] == pytest.approx(700.0)
        assert s[-1] == pytest.approx(0.002)
        assert np.all(np.diff(s) < 0)

    def test_step_reaches_denoised_at_last_sigma(self):
        # with sigma_next=0, prev = x + (x - denoised)/sigma * (0 - sigma)
        #                         = denoised
        sch = EulerDiscreteScheduler()
        x = jnp.ones((2, 2)) * 3.0
        out = jnp.ones((2, 2)) * 0.5
        sigma = jnp.asarray(2.0)
        prev = sch.step(out, x, sigma, jnp.asarray(0.0))
        denoised = x / (sigma**2 + 1) + out * (-sigma / jnp.sqrt(sigma**2 + 1))
        np.testing.assert_allclose(prev, denoised, rtol=1e-6)

    def test_edm_preconditioning_identities(self):
        sigma = jnp.asarray([0.1, 1.0, 10.0])
        c_in, c_skip, c_out = edm_preconditioning(sigma)
        np.testing.assert_allclose(c_in, 1 / jnp.sqrt(sigma**2 + 1), rtol=1e-6)
        np.testing.assert_allclose(c_skip, 1 / (sigma**2 + 1), rtol=1e-6)
        np.testing.assert_allclose(c_out, -sigma * c_in, rtol=1e-6)

    def test_sigma_sampler_range(self):
        s = rand_cosine_interpolated(jax.random.PRNGKey(0), (1000,))
        assert float(s.min()) >= 0.002 - 1e-6
        assert float(s.max()) <= 700.0 + 1e-3


class TestGuidance:
    def test_linspace(self):
        g = frame_guidance_scale(14, 1.0, 3.0)
        np.testing.assert_allclose(g, np.linspace(1, 3, 14), rtol=1e-6)

    def test_middle_max_symmetric(self):
        g = np.asarray(frame_guidance_scale(14, 1.0, 3.0, middle_max=True))
        np.testing.assert_allclose(g, g[::-1], atol=1e-5)
        assert g[7] > g[0]


class TestConditioning:
    def test_layout(self):
        first = jnp.ones((1, 4, 4, 4)) * 2.0
        end = jnp.ones((1, 4, 4, 4)) * 3.0
        tok = jnp.full((4,), 7.0)
        cond = assemble_conditioning_latents(first, end, tok, 5)
        assert cond.shape == (1, 5, 4, 4, 5)
        np.testing.assert_allclose(cond[:, 0, ..., :4], first, atol=0)
        np.testing.assert_allclose(cond[:, -1, ..., :4], end, atol=0)
        np.testing.assert_allclose(cond[:, 1:4, ..., :4], 7.0, atol=0)
        # mask channel: 0 at endpoints, 1 in the middle (train.py:551-555)
        np.testing.assert_allclose(cond[:, 0, ..., 4], 0.0, atol=0)
        np.testing.assert_allclose(cond[:, -1, ..., 4], 0.0, atol=0)
        np.testing.assert_allclose(cond[:, 1:4, ..., 4], 1.0, atol=0)

    def test_channel_ablations(self):
        first = jnp.ones((1, 2, 2, 4))
        end = jnp.ones((1, 2, 2, 4)) * 2
        tok = jnp.zeros((4,))
        cond = assemble_conditioning_latents(
            first, end, tok, 4,
            CondAblations(without_front_channel=True))
        np.testing.assert_allclose(cond[:, 0, ..., :4], 0.0, atol=0)
        cond = assemble_conditioning_latents(
            first, end, tok, 4, CondAblations(channelwise_all_end=True))
        np.testing.assert_allclose(cond[:, 1:3, ..., :4], 2.0, atol=0)


class TestPipelineE2E:
    def test_full_run_shapes_and_finiteness(self, pipe):
        rng = jax.random.PRNGKey(1)
        img0 = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
        img1 = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
        frames = pipe(img0, img1, rng, TINY_CFG)
        assert frames.shape == (1, 4, 32, 32, 3)
        assert frames.dtype == np.uint8

    def test_latent_output_and_decode_chunking(self, pipe):
        rng = jax.random.PRNGKey(2)
        img = np.zeros((1, 32, 32, 3), np.float32)
        lat = pipe(img, img, rng, TINY_CFG, output_type="latent")
        assert lat.shape == (1, 4, 16, 16, 4)
        full = pipe.decode_latents(lat, 4, None)
        chunked = pipe.decode_latents(lat, 4, 2)
        assert full.shape == chunked.shape == (1, 4, 32, 32, 3)

    def test_deterministic_given_rng(self, pipe):
        img0 = np.random.RandomState(3).rand(1, 32, 32, 3).astype(np.float32)
        img1 = np.random.RandomState(4).rand(1, 32, 32, 3).astype(np.float32)
        a = pipe(img0, img1, jax.random.PRNGKey(7), TINY_CFG)
        b = pipe(img0, img1, jax.random.PRNGKey(7), TINY_CFG)
        np.testing.assert_array_equal(a, b)

    def test_guidance_off_single_batch(self, pipe):
        cfg = TINY_CFG.replace(max_guidance_scale=1.0)
        img = np.full((1, 32, 32, 3), 0.5, np.float32)
        frames = pipe(img, img, jax.random.PRNGKey(0), cfg)
        assert frames.shape == (1, 4, 32, 32, 3)
