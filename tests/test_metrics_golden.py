"""SSIM/PSNR metric tests + golden regression fingerprints.

The goldens pin the *numerical behavior* of the core math (scheduler table,
EDM terms, conditioning layout, tiny-pipeline latents under fixed seeds) so
later rounds can refactor kernels without silently changing semantics —
the self-made replacement for the reference's golden asset dirs (SURVEY §4.2).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.utils.metrics import psnr, ssim

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")


class TestSSIM:
    def test_identical_images(self, rng):
        a = jax.random.uniform(rng, (2, 32, 32, 3))
        assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
        assert float(psnr(a, a)) > 100

    def test_noise_lowers_ssim_monotonically(self, rng):
        a = jax.random.uniform(rng, (1, 64, 64, 3))
        vals = []
        for amp in [0.01, 0.05, 0.2]:
            b = jnp.clip(a + amp * jax.random.normal(
                jax.random.fold_in(rng, int(amp * 100)), a.shape), 0, 1)
            vals.append(float(ssim(a, b)))
        assert vals[0] > vals[1] > vals[2]
        assert vals[0] > 0.95

    def test_matches_skimage_when_available(self, rng):
        skimage = pytest.importorskip("skimage.metrics")
        a = np.asarray(jax.random.uniform(rng, (1, 48, 48, 3)))
        b = np.clip(a + 0.1 * np.random.RandomState(0).randn(*a.shape), 0, 1)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = skimage.structural_similarity(
            a[0], b[0].astype(np.float32), channel_axis=-1, gaussian_weights=True,
            use_sample_covariance=False, data_range=1.0)
        assert ours == pytest.approx(theirs, abs=5e-3)


def _fingerprints():
    """Deterministic scalars fingerprinting core numerics."""
    from tvi.diffusion.edm import rand_cosine_interpolated
    from tvi.diffusion.euler import karras_sigmas
    from tvi.ops.attention import temporal_bias_mask
    from tvi.pipelines.conditioning import assemble_conditioning_latents

    out = {}
    s = karras_sigmas(25, 0.002, 700.0)
    out["karras_sigma_sum"] = float(np.sum(s))
    out["karras_sigma_12"] = float(s[12])
    sig = rand_cosine_interpolated(jax.random.PRNGKey(7), (64,))
    out["edm_sigma_mean_log"] = float(jnp.log(sig).mean())
    first = jnp.full((1, 4, 4, 4), 0.25)
    end = jnp.full((1, 4, 4, 4), -0.5)
    cond = assemble_conditioning_latents(first, end, jnp.full((4,), 0.125), 6)
    out["conditioning_sum"] = float(cond.sum())
    out["temporal_bias_sum"] = float(temporal_bias_mask(14, 2).sum())
    return out


def _pipeline_fingerprint():
    from tvi.core.config import PipelineConfig
    from tvi.pipelines.factory import build_tiny_pipeline

    pipe = build_tiny_pipeline(jax.random.PRNGKey(0))
    cfg = PipelineConfig(height=32, width=32, num_frames=4, num_inference_steps=2)
    img0 = np.linspace(0, 1, 32 * 32 * 3, dtype=np.float32).reshape(1, 32, 32, 3)
    img1 = img0[:, ::-1].copy()
    lat = pipe(img0, img1, jax.random.PRNGKey(3), cfg, output_type="latent")
    return {"tiny_pipeline_latent_mean": float(np.asarray(lat, np.float32).mean()),
            "tiny_pipeline_latent_std": float(np.asarray(lat, np.float32).std())}


class TestGoldens:
    def test_fingerprints_stable(self):
        got = {**_fingerprints(), **_pipeline_fingerprint()}
        if not os.path.exists(GOLDEN_PATH):
            with open(GOLDEN_PATH, "w") as fh:
                json.dump(got, fh, indent=2, sort_keys=True)
            pytest.skip("goldens written on first run; rerun to compare")
        want = json.load(open(GOLDEN_PATH))
        for k, v in want.items():
            assert got[k] == pytest.approx(v, rel=2e-2, abs=1e-3), (
                f"golden drift in {k}: {got[k]} vs {v}")
