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


class TestPipelineVariants:
    def test_do_motion_prompt_with_projector(self, rng):
        """The two projector modes need differently-shaped projectors by
        design (concat 2x-dim vs single-embedding, pipeline:440-449 — the
        reference likewise configures projector_input_dim per script), so
        each runs in its own pipeline; the context routing itself is
        asserted at the assembly level."""
        from tvi.core.config import TINY_UNET
        from tvi.pipelines.conditioning import assemble_context
        from tvi.pipelines.factory import build_tiny_pipeline

        # routing: motion prompt -> (spatial, temporal) tuple; plain
        # projector -> 2-token array of the projected END embedding
        emb_f = jax.random.normal(rng, (1, 1, 32))
        emb_e = jax.random.normal(jax.random.fold_in(rng, 1), (1, 1, 32))
        proj_2x = lambda x: x[..., :32] + x[..., 32:]
        ctx = assemble_context(emb_f, emb_e, proj_2x, do_motion_prompt=True)
        assert isinstance(ctx, tuple) and ctx[0].shape == (1, 2, 32)
        ctx = assemble_context(emb_f, emb_e, lambda x: x * 2.0,
                               do_motion_prompt=False)
        assert not isinstance(ctx, tuple) and ctx.shape == (1, 2, 32)
        np.testing.assert_allclose(ctx[:, 0], ctx[:, 1])  # proj(end) twice

        # both pipelines run end-to-end
        img = np.full((1, 32, 32, 3), 0.5, np.float32)
        pipe_motion = build_tiny_pipeline(jax.random.PRNGKey(0), with_projector=True)
        a = pipe_motion(img, img, jax.random.PRNGKey(1), TINY_CFG,
                        do_motion_prompt=True)
        pipe_single = build_tiny_pipeline(
            jax.random.PRNGKey(0), with_projector=True,
            projector_input_dim=TINY_UNET.cross_attention_dim)
        b = pipe_single(img, img, jax.random.PRNGKey(1), TINY_CFG,
                        do_motion_prompt=False)
        assert a.shape == b.shape == (1, 4, 32, 32, 3)

    @pytest.mark.parametrize("flag", [
        "without_front_channel", "without_end_channel",
        "second_channel_firstframe_condition",
        "last_channel_lastframe_condition",
        "channelwise_all_front", "channelwise_all_end",
    ])
    def test_every_channel_ablation_runs_and_differs(self, pipe, flag):
        img0 = np.random.RandomState(5).rand(1, 32, 32, 3).astype(np.float32)
        img1 = np.random.RandomState(6).rand(1, 32, 32, 3).astype(np.float32)
        base = pipe(img0, img1, jax.random.PRNGKey(2), TINY_CFG)
        out = pipe(img0, img1, jax.random.PRNGKey(2), TINY_CFG,
                   ablations=CondAblations(**{flag: True}))
        assert out.shape == base.shape
        assert not np.array_equal(out, base), flag

    @pytest.mark.parametrize("flag", ["without_front_embedding",
                                      "without_end_embedding"])
    def test_embedding_ablations_with_motion_prompt(self, flag):
        # the embedding ablations only bite when both CLIP tokens are in
        # play, i.e. the tuple (do_motion_prompt) context — in the plain
        # single-token path the end embedding is unused, faithful to
        # pipeline:436-449
        from tvi.pipelines.factory import build_tiny_pipeline

        pipe = build_tiny_pipeline(jax.random.PRNGKey(0), with_projector=True)
        img0 = np.random.RandomState(5).rand(1, 32, 32, 3).astype(np.float32)
        img1 = np.random.RandomState(6).rand(1, 32, 32, 3).astype(np.float32)
        base = pipe(img0, img1, jax.random.PRNGKey(2), TINY_CFG,
                    do_motion_prompt=True)
        out = pipe(img0, img1, jax.random.PRNGKey(2), TINY_CFG,
                   do_motion_prompt=True,
                   ablations=CondAblations(**{flag: True}))
        assert not np.array_equal(out, base), flag

    @pytest.mark.parametrize("frames", [3, 6])
    def test_frame_count_variants(self, pipe, frames):
        img = np.full((1, 32, 32, 3), 0.25, np.float32)
        out = pipe(img, img, jax.random.PRNGKey(0),
                   TINY_CFG.replace(num_frames=frames, decode_chunk_size=None))
        assert out.shape == (1, frames, 32, 32, 3)

    def test_frame_count_40_validation_geometry(self, pipe):
        """The reference validates at model_lengths=[14, 40]
        (src/train.py:741); 40 frames is the dynamic-frame-count hard case
        (SURVEY §7.3.3) — the full pipeline program must compile and run at
        F=40 with a ragged decode tail (40 % 16 != 0 chunks)."""
        img = np.full((1, 32, 32, 3), 0.25, np.float32)
        out = pipe(img, img, jax.random.PRNGKey(0),
                   TINY_CFG.replace(num_frames=40, decode_chunk_size=16))
        assert out.shape == (1, 40, 32, 32, 3)
        assert np.isfinite(out).all()

    def test_temporal_attention_bias_changes_output(self, rng):
        # the linspace bias needs >= 2 DISTINCT temporal context tokens to
        # have any effect: with 1 key the softmax is bias-invariant, and
        # with duplicated keys (the projector quirk path, pipeline:446-449)
        # v1 == v2 makes the output invariant too.  The reference's mask
        # even asserts num_kv == 2 (train_decouples.py:442).  Exercise the
        # feature at the UNet level with a plain 2-distinct-token context —
        # the configuration the decoupled trainer's --use_attentionmask
        # targets.
        from tvi.core.config import TINY_UNET
        from tvi.models.unet_st import UNetSpatioTemporalConditionModel

        m = UNetSpatioTemporalConditionModel(TINY_UNET)
        sample = jax.random.normal(rng, (1, 4, 16, 16, 9)) * 0.1
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (1, 2, 32))
        v = m.init(rng, sample, jnp.zeros((1,)), ctx, jnp.zeros((1, 3)))
        a, _ = m.apply(v, sample, jnp.zeros((1,)), ctx, jnp.zeros((1, 3)))
        b, _ = m.apply(v, sample, jnp.zeros((1,)), ctx, jnp.zeros((1, 3)),
                       use_temporal_attention_bias=True)
        assert not np.array_equal(np.asarray(a), np.asarray(b))
