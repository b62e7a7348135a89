"""Unit tests for tvi.ops: attention (incl. bias/stats), resize, slerp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.ops.attention import dot_product_attention, temporal_bias_mask
from tvi.ops.resize import bicubic_resize, resize_with_antialiasing
from tvi.ops.slerp import slerp


class TestAttention:
    def test_matches_reference_einsum(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (2, 5, 3, 8))
        k = jax.random.normal(k2, (2, 7, 3, 8))
        v = jax.random.normal(k3, (2, 7, 3, 8))
        out = dot_product_attention(q, k, v)
        # naive reference
        scale = 8 ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        expect = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_bias_shifts_logits(self, rng):
        q = jax.random.normal(rng, (1, 4, 2, 8))
        k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 2, 2, 8))
        v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 2, 2, 8))
        bias = jnp.array([[0.0, 100.0]] * 4)  # push all mass to key 1
        out = dot_product_attention(q, k, v, bias=bias)
        expect = jnp.broadcast_to(v[:, 1:2], out.shape[:1] + (4,) + out.shape[2:])
        np.testing.assert_allclose(out, expect.reshape(out.shape), atol=1e-3)

    def test_stats_are_presoftmax_means(self, rng):
        q = jax.random.normal(rng, (3, 6, 2, 8))
        k = jax.random.normal(jax.random.fold_in(rng, 1), (3, 2, 2, 8))
        v = jnp.zeros((3, 2, 2, 8))
        _, stats = dot_product_attention(q, k, v, want_stats=True)
        scale = 8 ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        np.testing.assert_allclose(stats.first, logits[..., :1].mean(axis=(0, 1, 3)), atol=1e-5)
        np.testing.assert_allclose(stats.end, logits[..., 1:].mean(axis=(0, 1, 3)), atol=1e-5)

    def test_biased_stats_show_conditioning_direction(self, rng):
        """The reference's de-facto eval signature (SURVEY §4.3): with the
        linspace temporal bias enabled, the per-frame first-image similarity
        must FALL across frames while the end-image similarity RISES — the
        unet_cross_anal.csv trend the reference eyeballs (src/test.py:370-403
        CSVs from the patched attention)."""
        f, sk = 8, 2
        q = jax.random.normal(rng, (2, f, 2, 8)) * 0.01
        k = jax.random.normal(jax.random.fold_in(rng, 1), (2, sk, 2, 8)) * 0.01
        v = jnp.zeros((2, sk, 2, 8))
        bias = temporal_bias_mask(f, sk)
        _, stats = dot_product_attention(q, k, v, bias=bias, want_stats=True)
        first = np.asarray(stats.first)
        end = np.asarray(stats.end)
        assert np.all(np.diff(first) < 0), first
        assert np.all(np.diff(end) > 0), end
        np.testing.assert_allclose(first + end, np.ones(f), atol=0.05)

    def test_temporal_bias_mask(self):
        # reference build_temporal_attention_mask: stack([1-w, w], axis=1)
        m = temporal_bias_mask(5, 2)
        w = np.linspace(0, 1, 5)
        np.testing.assert_allclose(m[:, 0], 1 - w, atol=1e-6)
        np.testing.assert_allclose(m[:, 1], w, atol=1e-6)


class TestResize:
    def test_bicubic_identity(self, rng):
        x = jax.random.normal(rng, (1, 16, 16, 3))
        y = bicubic_resize(x, 16, 16, align_corners=True)
        np.testing.assert_allclose(y, x, atol=1e-4)

    def test_bicubic_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = np.asarray(jax.random.normal(rng, (2, 17, 23, 3)), dtype=np.float32)
        y = bicubic_resize(jnp.asarray(x), 11, 13, align_corners=True)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = torch.nn.functional.interpolate(xt, size=(11, 13), mode="bicubic",
                                             align_corners=True)
        np.testing.assert_allclose(np.asarray(y), yt.permute(0, 2, 3, 1).numpy(),
                                   atol=2e-4)

    def test_antialiased_resize_shape_and_range(self, rng):
        x = jnp.clip(jax.random.normal(rng, (1, 320, 512, 3)), -1, 1)
        y = resize_with_antialiasing(x, (224, 224))
        assert y.shape == (1, 224, 224, 3)
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_antialiased_upscale_skips_heavy_blur(self):
        # factor < 1 -> sigma clamps to 0.001, kernel 3: near-pure bicubic
        x = jnp.ones((1, 8, 8, 3))
        y = resize_with_antialiasing(x, (16, 16))
        np.testing.assert_allclose(y, jnp.ones((1, 16, 16, 3)), atol=1e-3)


class TestSlerp:
    def test_endpoints(self, rng):
        v0 = jax.random.normal(rng, (4, 4, 2))
        v1 = jax.random.normal(jax.random.fold_in(rng, 1), (4, 4, 2))
        np.testing.assert_allclose(slerp(0.0, v0, v1), v0, atol=1e-5)
        np.testing.assert_allclose(slerp(1.0, v0, v1), v1, atol=1e-5)

    def test_unit_vectors_stay_on_sphere(self):
        v0 = jnp.array([1.0, 0.0])
        v1 = jnp.array([0.0, 1.0])
        ts = jnp.linspace(0, 1, 9)
        out = slerp(ts, v0, v1)
        norms = jnp.linalg.norm(out, axis=-1)
        np.testing.assert_allclose(norms, jnp.ones(9), atol=1e-5)

    def test_parallel_vectors_fall_back_to_lerp(self):
        v0 = jnp.array([1.0, 1.0])
        out = slerp(0.5, v0, v0 * 2)
        np.testing.assert_allclose(out, v0 * 1.5, atol=1e-5)
