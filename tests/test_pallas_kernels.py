"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.ops.attention import dot_product_attention, set_flash_attention
from tvi.ops.pallas_attention import (
    flash_attention_eligible,
    flash_self_attention,
    flash_self_attention_streamed,
    flash_streamed_eligible,
)


class TestStreamedFlash:
    @pytest.mark.parametrize("sq,sk,d", [(256, 1024, 64), (128, 512, 512)])
    def test_matches_xla_reference(self, rng, sq, sk, d):
        bh = 2
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (bh, sq, d), jnp.float32)
        k = jax.random.normal(k2, (bh, sk, d), jnp.float32)
        v = jax.random.normal(k3, (bh, sk, d), jnp.float32)
        scale = d ** -0.5
        out = flash_self_attention_streamed(q, k, v, scale, block_q=128,
                                            block_k=512, interpret=True)
        logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        expect = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(logits, -1), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=3e-5, rtol=3e-5)

    def test_eligibility(self):
        # VAE decoder attention (1 head, d=512, 9216 tokens) fits the
        # resident kernel since the 64MB VMEM budget; the streamed kernel
        # covers K/V beyond that (e.g. 4x the tokens)
        assert flash_attention_eligible(9216, 9216, 512, False, False)
        assert not flash_attention_eligible(36864, 36864, 512, False, False)
        assert flash_streamed_eligible(36864, 36864, 512, False, False)
        assert not flash_streamed_eligible(100, 9216, 512, False, False)


class TestFlashAttention:
    @pytest.mark.parametrize("sq,sk", [(256, 256), (512, 512), (512, 256)])
    def test_matches_xla_reference(self, rng, sq, sk):
        d = 64
        bh = 3
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (bh, sq, d), jnp.float32)
        k = jax.random.normal(k2, (bh, sk, d), jnp.float32)
        v = jax.random.normal(k3, (bh, sk, d), jnp.float32)
        scale = d ** -0.5
        out = flash_self_attention(q, k, v, scale, block_q=256, interpret=True)
        logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        expect = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(logits, -1), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16_inputs(self, rng):
        d, sq = 64, 256
        q = jax.random.normal(rng, (2, sq, d)).astype(jnp.bfloat16)
        out = flash_self_attention(q, q, q, d ** -0.5, interpret=True)
        assert out.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    def test_eligibility_rules(self):
        # bias / stats / small or ragged seqs fall back
        assert not flash_attention_eligible(256, 256, 64, True, False)
        assert not flash_attention_eligible(256, 256, 64, False, True)
        assert not flash_attention_eligible(100, 100, 64, False, False)
        assert not flash_attention_eligible(40, 40, 64, False, False)
        # headline geometry is eligible
        assert flash_attention_eligible(9216, 9216, 64, False, False)
        # absurd K/V that exceeds VMEM is not
        assert not flash_attention_eligible(65536, 65536, 64, False, False)

    def test_dispatch_through_dot_product_attention(self, rng):
        """Force the flash path in interpret mode and compare with the XLA
        path through the public op."""
        d, s, h = 64, 256, 2
        q = jax.random.normal(rng, (2, s, h, d))
        import tvi.ops.pallas_attention as pa

        orig = pa.flash_self_attention
        calls = []

        def spy(q_, k_, v_, scale, **kw):
            calls.append(q_.shape)
            return orig(q_, k_, v_, scale, interpret=True)

        pa.flash_self_attention = spy
        set_flash_attention(True)
        try:
            out_flash = dot_product_attention(q, q, q)
        finally:
            set_flash_attention(False)
            pa.flash_self_attention = orig
        assert calls, "flash path was not taken"
        assert calls[0] == (2 * h, s, d)
        out_ref = dot_product_attention(q, q, q)
        np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_ref),
                                   atol=2e-5, rtol=2e-5)


class TestBoundShiftSoftmax:
    """The fused Cauchy-Schwarz shift (default) must match the row-max
    softmax exactly up to fp rounding — including at adversarially large
    operand magnitudes where a shiftless exp2 would overflow."""

    @pytest.mark.parametrize("mag", [1.0, 30.0])
    def test_bound_matches_row_shift(self, rng, mag):
        d, s, bh = 64, 256, 2
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (bh, s, d)) * mag
        k = jax.random.normal(k2, (bh, s, d)) * mag
        v = jax.random.normal(k3, (bh, s, d))
        scale = d ** -0.5
        row = flash_self_attention(q, k, v, scale, interpret=True, shift="row")
        bound = flash_self_attention(q, k, v, scale, interpret=True,
                                     shift="bound")
        assert bool(jnp.all(jnp.isfinite(bound)))
        np.testing.assert_allclose(np.asarray(bound), np.asarray(row),
                                   atol=3e-5, rtol=3e-5)

    def test_in_kernel_guard_recovers_underflow_tiles(self, rng):
        """At magnitudes where the Cauchy-Schwarz shift drives every exp2 to
        zero, the guarded kernel's per-tile row-max fallback must produce
        the exact row-max result; the explicit unguarded variant degrades
        (documents why 'bound' stays the default)."""
        d, s, bh = 64, 256, 2
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (bh, s, d)) * 120.0
        k = jax.random.normal(k2, (bh, s, d)) * 120.0
        v = jax.random.normal(k3, (bh, s, d))
        scale = d ** -0.5
        row = flash_self_attention(q, k, v, scale, interpret=True, shift="row")
        guarded = flash_self_attention(q, k, v, scale, interpret=True,
                                       shift="bound")
        assert bool(jnp.all(jnp.isfinite(guarded)))
        np.testing.assert_allclose(np.asarray(guarded), np.asarray(row),
                                   atol=3e-5, rtol=3e-5)
        unguarded = flash_self_attention(q, k, v, scale, interpret=True,
                                         shift="bound_unguarded")
        assert not bool(jnp.all(jnp.isfinite(unguarded)))

    def test_bound_ragged_masking(self, rng):
        # padded keys produce p = 2^-shift (not -inf logits): the bound
        # kernel must still zero them
        d, s = 64, 300
        q = jax.random.normal(rng, (1, s, d))
        out = flash_self_attention(q, q, q, d ** -0.5, interpret=True,
                                   shift="bound")
        ref = flash_self_attention(q, q, q, d ** -0.5, interpret=True,
                                   shift="row")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)


class TestRaggedFlash:
    @pytest.mark.parametrize("sq,sk", [(576, 576), (144, 144), (300, 300)])
    def test_padded_masked_matches_reference(self, rng, sq, sk):
        d, bh = 64, 2
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (bh, sq, d), jnp.float32)
        k = jax.random.normal(k2, (bh, sk, d), jnp.float32)
        v = jax.random.normal(k3, (bh, sk, d), jnp.float32)
        scale = d ** -0.5
        out = flash_self_attention(q, k, v, scale, block_q=128, interpret=True)
        assert out.shape == (bh, sq, d)
        logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        expect = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(logits, -1), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=2e-5, rtol=2e-5)

    def test_eligibility_now_covers_ragged(self):
        assert flash_attention_eligible(576, 576, 64, False, False)
        assert flash_attention_eligible(144, 144, 64, False, False)
        assert not flash_attention_eligible(100, 100, 64, False, False)


class TestGegluKernel:
    @pytest.mark.parametrize("m,k,n", [
        (300, 128, 256),    # ragged M exercises the pad path
        (512, 320, 1280),   # real SVD FF shape: n not a multiple of 512
        (256, 128, 640),    # n in (512, 1024) regression for unwritten cols
    ])
    def test_parity_with_flax_geglu(self, rng, m, k, n):
        import flax.linen as nn

        from tvi.ops.pallas_geglu import geglu_project

        x = jax.random.normal(rng, (m, k))
        w = jax.random.normal(jax.random.fold_in(rng, 1), (k, 2 * n)) * 0.05
        b = jax.random.normal(jax.random.fold_in(rng, 2), (2 * n,)) * 0.1
        out = geglu_project(x, w, b, interpret=True)
        h, g = jnp.split(x @ w + b, 2, axis=-1)
        expect = h * nn.gelu(g, approximate=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=3e-5, rtol=3e-5)

    def test_eligibility(self):
        from tvi.ops.pallas_geglu import geglu_eligible

        assert geglu_eligible(460800, 320, 2560)      # res0 FF
        assert not geglu_eligible(100, 320, 2560)     # tiny M
        assert not geglu_eligible(460800, 100, 2560)  # ragged K


class TestTemporalRowsKernel:
    @pytest.mark.parametrize("r,f", [(300, 25), (512, 14)])
    def test_parity(self, rng, r, f):
        from tvi.ops.pallas_temporal_attention import temporal_rows_attention

        h, d = 2, 64
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (r, f, h, d))
        k = jax.random.normal(k2, (r, f, h, d))
        v = jax.random.normal(k3, (r, f, h, d))
        scale = d ** -0.5
        out = temporal_rows_attention(q, k, v, scale, interpret=True)
        logits = jnp.einsum("rqhd,rkhd->rhqk", q, k) * scale
        expect = jnp.einsum("rhqk,rkhd->rqhd", jax.nn.softmax(logits, -1), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=3e-5, rtol=3e-5)

    def test_eligibility(self):
        from tvi.ops.pallas_temporal_attention import temporal_rows_eligible

        assert temporal_rows_eligible(18432, 25, 64)   # headline temporal
        assert not temporal_rows_eligible(18432, 100, 64)  # too many frames
        assert not temporal_rows_eligible(100, 25, 64)     # too few rows
        assert not temporal_rows_eligible(18432, 25, 40)  # ragged head dim


class TestFusedTemporalSelfAttention:
    @pytest.mark.parametrize("r,f,c,heads", [(300, 25, 128, 2), (512, 14, 256, 4)])
    @pytest.mark.parametrize("flat", ["0", "1"])
    def test_parity_with_unfused(self, rng, r, f, c, heads, flat, monkeypatch):
        monkeypatch.setenv("TVI_TEMPORAL_FLAT", flat)
        from tvi.ops.pallas_fused_temporal import fused_temporal_self_attention

        d = c // heads
        ks = jax.random.split(rng, 6)
        x = jax.random.normal(ks[0], (r, f, c))
        wq = jax.random.normal(ks[1], (c, c)) * c ** -0.5
        wk = jax.random.normal(ks[2], (c, c)) * c ** -0.5
        wv = jax.random.normal(ks[3], (c, c)) * c ** -0.5
        wo = jax.random.normal(ks[4], (c, c)) * c ** -0.5
        bo = jax.random.normal(ks[5], (c,))
        scale = d ** -0.5
        out = fused_temporal_self_attention(x, wq, wk, wv, wo, bo,
                                            heads=heads, scale=scale,
                                            block_r=128, interpret=True)
        q = (x @ wq).reshape(r, f, heads, d)
        k = (x @ wk).reshape(r, f, heads, d)
        v = (x @ wv).reshape(r, f, heads, d)
        logits = jnp.einsum("rqhd,rkhd->rhqk", q, k) * scale
        attn = jnp.einsum("rhqk,rkhd->rqhd", jax.nn.softmax(logits, -1), v)
        expect = attn.reshape(r, f, c) @ wo + bo
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=2e-4, rtol=2e-4)


    @pytest.mark.parametrize("flat", [False, True])
    def test_ln_residual_folded(self, rng, flat, monkeypatch):
        """norm1 + residual folded in-kernel (TemporalBasicTransformerBlock
        attn1) vs the functional composition, both padded-F and flat-F."""
        from tvi.models.layers import layer_norm
        from tvi.ops.pallas_fused_temporal import (
            fused_temporal_reference,
            fused_temporal_self_attention,
        )
        if flat:
            monkeypatch.setenv("TVI_TEMPORAL_FLAT", "1")
        r, f, c, heads = 512, 10, 64, 1
        ks = jax.random.split(rng, 7)
        x = jax.random.normal(ks[0], (r, f, c))
        lns = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
        lnb = jax.random.normal(ks[2], (c,)) * 0.2
        wq = jax.random.normal(ks[3], (c, c)) * c ** -0.5
        wk = jax.random.normal(ks[4], (c, c)) * c ** -0.5
        wv = jax.random.normal(ks[5], (c, c)) * c ** -0.5
        wo = jax.random.normal(ks[6], (c, c)) * c ** -0.5
        bo = jnp.zeros((c,))
        scale = (c // heads) ** -0.5
        got = fused_temporal_self_attention(
            x, wq, wk, wv, wo, bo, heads=heads, scale=scale,
            lns=lns, lnb=lnb, residual=True, block_r=128, interpret=True)
        xn = layer_norm(x, lns, lnb)
        want = fused_temporal_reference(xn, None, None, wq, wk, wv, wo, bo,
                                        heads=heads, scale=scale) + x
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)

    @pytest.mark.parametrize("flat", ["0", "1"])
    def test_ffin_prologue(self, rng, flat, monkeypatch):
        """ff_in (norm_in + GEGLU + residual) folded as the kernel's
        prologue vs the unfused ff_in -> LN -> attention -> residual chain
        (both the padded-F and flat-F kernel variants)."""
        monkeypatch.setenv("TVI_TEMPORAL_FLAT", flat)
        from tvi.models.layers import layer_norm
        from tvi.ops.pallas_fused_ff import fused_ff_reference
        from tvi.ops.pallas_fused_temporal import (
            fused_temporal_reference,
            fused_temporal_self_attention,
        )
        r, f, c, heads = 256, 10, 64, 1
        f_inner = 4 * c
        ks = jax.random.split(rng, 11)
        x = jax.random.normal(ks[0], (r, f, c))
        fls = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
        flb = jnp.zeros((c,))
        fw1 = jax.random.normal(ks[2], (c, 2 * f_inner)) * c ** -0.5
        fb1 = jax.random.normal(ks[3], (2 * f_inner,)) * 0.1
        fw2 = jax.random.normal(ks[4], (f_inner, c)) * f_inner ** -0.5
        fb2 = jnp.zeros((c,))
        lns = jax.random.normal(ks[5], (c,)) * 0.2 + 1.0
        lnb = jnp.zeros((c,))
        wq = jax.random.normal(ks[6], (c, c)) * c ** -0.5
        wk = jax.random.normal(ks[7], (c, c)) * c ** -0.5
        wv = jax.random.normal(ks[8], (c, c)) * c ** -0.5
        wo = jax.random.normal(ks[9], (c, c)) * c ** -0.5
        bo = jnp.zeros((c,))
        scale = (c // heads) ** -0.5

        got = fused_temporal_self_attention(
            x, wq, wk, wv, wo, bo, heads=heads, scale=scale,
            lns=lns, lnb=lnb, residual=True,
            ffin_params=(fls, flb, fw1, fb1, fw2, fb2),
            block_r=64, interpret=True)
        t1 = fused_ff_reference(x.reshape(r * f, c), fls, flb, fw1, fb1,
                                fw2, fb2, residual=True).reshape(r, f, c)
        xn = layer_norm(t1, lns, lnb)
        want = fused_temporal_reference(xn, None, None, wq, wk, wv, wo, bo,
                                        heads=heads, scale=scale) + t1
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-4)

    def test_ffin_prologue_grad(self, rng):
        from tvi.ops.pallas_fused_temporal import fused_temporal_self_attention
        r, f, c = 128, 8, 64
        ks = jax.random.split(rng, 8)
        x = jax.random.normal(ks[0], (r, f, c))
        fw1 = jax.random.normal(ks[1], (c, 8 * c)) * 0.1
        fb1 = jnp.zeros((8 * c,))
        fw2 = jax.random.normal(ks[2], (4 * c, c)) * 0.1
        fb2 = jnp.zeros((c,))
        ones, zeros = jnp.ones((c,)), jnp.zeros((c,))
        wq = jax.random.normal(ks[3], (c, c)) * 0.1
        wk = jax.random.normal(ks[4], (c, c)) * 0.1
        wv = jax.random.normal(ks[5], (c, c)) * 0.1
        wo = jax.random.normal(ks[6], (c, c)) * 0.1
        bo = jnp.zeros((c,))

        def loss(fw1_, x_):
            out = fused_temporal_self_attention(
                x_, wq, wk, wv, wo, bo, heads=1, scale=c ** -0.5,
                lns=ones, lnb=zeros, residual=True,
                ffin_params=(ones, zeros, fw1_, fb1, fw2, fb2),
                block_r=64, interpret=True)
            return jnp.sum(out ** 2)

        gw, gx = jax.grad(loss, argnums=(0, 1))(fw1, x)
        assert np.isfinite(np.asarray(gw)).all()
        assert np.isfinite(np.asarray(gx)).all()
        assert float(jnp.abs(gw).max()) > 0

    @pytest.mark.parametrize("with_ffin", [False, True])
    def test_4d_untransposed_input(self, rng, with_ffin):
        """4D variant: untransposed (B, F, S, C) input + frame-pos emb
        consumed in-kernel (emb-add + relayout absorbed) vs the
        materialized chain."""
        from tvi.ops.pallas_fused_temporal import (
            fused_temporal_self_attention_4d,
            temporal_block_4d_reference,
        )
        b, f, s, c, heads = 2, 10, 128, 64, 1
        f_inner = 4 * c
        ks = jax.random.split(rng, 12)
        x4 = jax.random.normal(ks[0], (b, f, s, c))
        emb4 = jax.random.normal(ks[1], (b, f, 1, c)) * 0.3
        lns = jax.random.normal(ks[2], (c,)) * 0.2 + 1.0
        lnb = jnp.zeros((c,))
        wq = jax.random.normal(ks[3], (c, c)) * c ** -0.5
        wk = jax.random.normal(ks[4], (c, c)) * c ** -0.5
        wv = jax.random.normal(ks[5], (c, c)) * c ** -0.5
        wo = jax.random.normal(ks[6], (c, c)) * c ** -0.5
        bo = jnp.zeros((c,))
        ffin = None
        fls = flb = fw1 = fb1 = fw2 = fb2 = None
        if with_ffin:
            fls = jax.random.normal(ks[7], (c,)) * 0.2 + 1.0
            flb = jnp.zeros((c,))
            fw1 = jax.random.normal(ks[8], (c, 2 * f_inner)) * c ** -0.5
            fb1 = jax.random.normal(ks[9], (2 * f_inner,)) * 0.1
            fw2 = jax.random.normal(ks[10], (f_inner, c)) * f_inner ** -0.5
            fb2 = jnp.zeros((c,))
            ffin = (fls, flb, fw1, fb1, fw2, fb2)
        scale = (c // heads) ** -0.5

        got = fused_temporal_self_attention_4d(
            x4, emb4, wq, wk, wv, wo, bo, heads=heads, scale=scale,
            lns=lns, lnb=lnb, residual=True, ffin_params=ffin,
            interpret=True)
        want = temporal_block_4d_reference(
            x4, emb4, fls, flb, lns, lnb, wq, wk, wv, wo, bo,
            fw1, fb1, fw2, fb2, heads=heads, scale=scale, residual=True)
        assert got.shape == (b * s, f, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-4)

    def test_attention_module_param_tree_unchanged(self, rng):
        """The _DenseParams refactor must keep the exact nn.Dense param tree
        (to_q/kernel etc.) AND the same init values (same RNG paths)."""
        from tvi.models.layers import Attention

        m = Attention(heads=2, dim_head=16)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 32))
        params = m.init(rng, x)["params"]
        assert set(params.keys()) == {"to_q", "to_k", "to_v", "to_out"}
        assert set(params["to_q"].keys()) == {"kernel"}
        assert set(params["to_out"].keys()) == {"kernel", "bias"}
        assert params["to_q"]["kernel"].shape == (32, 32)

    def test_eligibility(self):
        from tvi.ops.pallas_fused_temporal import fused_temporal_eligible

        # headline temporal self-attn shapes (R=B*H*W, F=25)
        assert fused_temporal_eligible(18432, 25, 320, 320, 320, False)
        assert fused_temporal_eligible(4608, 25, 640, 640, 640, False)
        assert fused_temporal_eligible(1152, 25, 1280, 1280, 1280, False)
        assert not fused_temporal_eligible(18432, 100, 320, 320, 320, False)  # big F
        assert not fused_temporal_eligible(100, 25, 320, 320, 320, False)     # tiny R
        assert not fused_temporal_eligible(18432, 25, 320, 320, 320, True)    # qkv bias
        assert not fused_temporal_eligible(18432, 25, 320, 300, 320, False)   # ragged


class TestFusedFeedForward:
    """Whole-FF kernel (LN + GEGLU + out-proj + residual) vs the unfused
    reference math (tvi/ops/pallas_fused_ff.py)."""

    @pytest.mark.parametrize("c,inner,residual,with_ln", [
        (320, 1280, True, True),
        (128, 512, True, False),
        (256, 1024, False, True),
    ])
    def test_matches_unfused(self, c, inner, residual, with_ln):
        from tvi.ops.pallas_fused_ff import fused_feedforward

        rng = jax.random.PRNGKey(0)
        ks = jax.random.split(rng, 6)
        m = 512
        x = jax.random.normal(ks[0], (m, c), jnp.float32)
        lns = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0 if with_ln else None
        lnb = jax.random.normal(ks[2], (c,)) * 0.2 if with_ln else None
        w1 = jax.random.normal(ks[3], (c, 2 * inner)) * c ** -0.5
        b1 = jax.random.normal(ks[4], (2 * inner,)) * 0.1
        w2 = jax.random.normal(ks[5], (inner, c)) * inner ** -0.5
        b2 = jnp.zeros((c,))

        h = x
        if with_ln:
            import flax.linen as nn
            mean = h.mean(-1, keepdims=True)
            var = ((h - mean) ** 2).mean(-1, keepdims=True)
            h = (h - mean) / jnp.sqrt(var + 1e-5) * lns + lnb
        pre = h @ w1 + b1
        val, gate = pre[:, :inner], pre[:, inner:]
        gated = val * jax.nn.gelu(gate, approximate=False)
        want = gated @ w2 + b2
        if residual:
            want = want + x

        got = fused_feedforward(x, lns, lnb, w1, b1, w2, b2,
                                residual=residual, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)

    def test_ragged_rows(self):
        from tvi.ops.pallas_fused_ff import fused_feedforward
        c, inner = 128, 512
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (300, c), jnp.float32)  # not a BM multiple
        w1 = jax.random.normal(rng, (c, 2 * inner)) * 0.05
        b1 = jnp.zeros((2 * inner,))
        w2 = jax.random.normal(rng, (inner, c)) * 0.05
        b2 = jnp.zeros((c,))
        got = fused_feedforward(x, None, None, w1, b1, w2, b2,
                                residual=True, interpret=True)
        pre = x @ w1
        val, gate = pre[:, :inner], pre[:, inner:]
        want = val * jax.nn.gelu(gate, approximate=False) @ w2 + x
        assert got.shape == (300, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)


class TestFusedCrossAttention:
    """Small-context cross-attention kernel (LN + q-proj + attn + out-proj
    + residual) vs unfused reference math (tvi/ops/pallas_fused_cross.py)."""

    @pytest.mark.parametrize("g,rpg,c,heads,s_ctx,with_ln,residual", [
        (4, 256, 320, 5, 3, True, True),     # spatial attn2-like
        (2, 512, 128, 2, 2, True, True),     # temporal attn2-like
        (3, 128, 64, 1, 1, False, False),    # single-token context
    ])
    def test_matches_unfused(self, g, rpg, c, heads, s_ctx, with_ln, residual):
        from tvi.ops.pallas_fused_cross import (
            fused_cross_attention,
            to_head_major_ctx,
        )
        d = 64
        inner = heads * d
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        m = g * rpg
        x = jax.random.normal(ks[0], (m, c), jnp.float32)
        lns = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0 if with_ln else None
        lnb = jax.random.normal(ks[2], (c,)) * 0.2 if with_ln else None
        wq = jax.random.normal(ks[3], (c, inner)) * c ** -0.5
        ck = jax.random.normal(ks[4], (g, s_ctx, inner))
        cv = jax.random.normal(ks[5], (g, s_ctx, inner))
        wo = jax.random.normal(ks[6], (inner, c)) * inner ** -0.5
        bo = jax.random.normal(ks[7], (c,)) * 0.1

        h = x
        if with_ln:
            mean = h.mean(-1, keepdims=True)
            var = ((h - mean) ** 2).mean(-1, keepdims=True)
            h = (h - mean) / jnp.sqrt(var + 1e-5) * lns + lnb
        q = (h @ wq).reshape(g, rpg, heads, d)
        kh = ck.reshape(g, s_ctx, heads, d)
        vh = cv.reshape(g, s_ctx, heads, d)
        logits = jnp.einsum("grhd,gshd->ghrs", q, kh) * d ** -0.5
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("ghrs,gshd->grhd", p, vh).reshape(m, inner)
        want = o @ wo + bo
        if residual:
            want = want + x

        got = fused_cross_attention(
            x, lns, lnb, wq, to_head_major_ctx(ck, heads),
            to_head_major_ctx(cv, heads), wo, bo, heads=heads,
            scale=d ** -0.5, rows_per_group=rpg, residual=residual,
            bm=min(128, rpg), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)


class TestFlashAttentionOut:
    """Spatial self-attention v4: head-looped bound-shift flash with the
    out-projection + bias + residual fused into the epilogue
    (tvi/ops/pallas_attention_out.py)."""

    @pytest.mark.parametrize("b,s,heads,c_out,residual", [
        (2, 512, 2, 128, True),      # even blocks
        (2, 576, 5, 320, True),      # Sk % 128 != 0 -> pad + mask, BQ=192
        (1, 256, 2, 128, False),
    ])
    def test_parity_with_reference(self, rng, b, s, heads, c_out, residual):
        from tvi.ops.pallas_attention_out import (
            attention_out_reference,
            flash_attention_out,
        )
        d = 64
        inner = heads * d
        ks = jax.random.split(rng, 6)
        q = jax.random.normal(ks[0], (b, s, inner))
        k = jax.random.normal(ks[1], (b, s, inner))
        v = jax.random.normal(ks[2], (b, s, inner))
        x_res = jax.random.normal(ks[3], (b, s, c_out))
        wo = jax.random.normal(ks[4], (inner, c_out)) * inner ** -0.5
        bo = jax.random.normal(ks[5], (c_out,)) * 0.1
        scale = d ** -0.5
        got = flash_attention_out(q, k, v, x_res, wo, bo, heads=heads,
                                  scale=scale, residual=residual,
                                  interpret=True)
        want = attention_out_reference(q, k, v, x_res, wo, bo, heads=heads,
                                       scale=scale, residual=residual)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)

    def test_grad_flows(self, rng):
        from tvi.ops.pallas_attention_out import flash_attention_out
        b, s, heads, c_out = 1, 256, 2, 128
        inner = heads * 64
        ks = jax.random.split(rng, 6)
        q = jax.random.normal(ks[0], (b, s, inner))
        k = jax.random.normal(ks[1], (b, s, inner))
        v = jax.random.normal(ks[2], (b, s, inner))
        x_res = jax.random.normal(ks[3], (b, s, c_out))
        wo = jax.random.normal(ks[4], (inner, c_out)) * inner ** -0.5
        bo = jnp.zeros((c_out,))

        def loss(wo):
            out = flash_attention_out(q, k, v, x_res, wo, bo, heads=heads,
                                      scale=64 ** -0.5, interpret=True)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(wo)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_eligibility(self):
        from tvi.ops.pallas_attention_out import attention_out_eligible
        assert attention_out_eligible(50, 9216, 9216, 320, 320, 5)
        assert attention_out_eligible(50, 2304, 2304, 640, 640, 10)
        assert attention_out_eligible(50, 576, 576, 1280, 1280, 20)
        assert not attention_out_eligible(50, 9216, 9216, 320, 320, 4)  # d!=64
        assert not attention_out_eligible(50, 100, 100, 320, 320, 5)    # tiny S

    @pytest.mark.parametrize("b,s,heads,c", [
        (2, 512, 2, 128),
        (2, 576, 5, 320),     # odd-S pick (bm=576), level-0 widths
        (1, 768, 5, 320),
    ])
    def test_ln_qkv_split_parity(self, rng, b, s, heads, c):
        """LN + fused-QKV + split + k-norm streaming kernel vs its XLA
        reference (tvi/ops/pallas_attention_out.py::ln_qkv_split)."""
        from tvi.ops.pallas_attention_out import (
            _ln_qkv_split_fwd,
            ln_qkv_reference,
        )
        inner = heads * 64
        ks = jax.random.split(rng, 6)
        x = jax.random.normal(ks[0], (b, s, c))
        lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
        lnb = 0.1 * jax.random.normal(ks[2], (c,))
        mk = lambda i: jax.random.normal(ks[i], (c, inner)) * c ** -0.5
        wq, wk, wv = mk(3), mk(4), mk(5)
        got = _ln_qkv_split_fwd(x, lns, lnb, wq, wk, wv, heads=heads,
                                interpret=True)
        want = ln_qkv_reference(x, lns, lnb, wq, wk, wv, heads=heads)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=2e-5, rtol=2e-5)

    def test_ln_qkv_split_feeds_attention(self, rng):
        """External knorm path: flash_attention_out(knorm=...) must match
        the internally-reduced knorm bit-for-bit."""
        from tvi.ops.pallas_attention_out import (
            flash_attention_out,
            ln_qkv_split,
        )
        b, s, heads, c = 1, 512, 2, 128
        inner = heads * 64
        ks = jax.random.split(rng, 7)
        x = jax.random.normal(ks[0], (b, s, c))
        lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
        lnb = 0.1 * jax.random.normal(ks[2], (c,))
        mk = lambda i: jax.random.normal(ks[i], (c, inner)) * c ** -0.5
        wq, wk, wv = mk(3), mk(4), mk(5)
        wo = jax.random.normal(ks[6], (inner, c)) * inner ** -0.5
        bo = jnp.zeros((c,))
        q, k, v, kn = ln_qkv_split(x, lns, lnb, wq, wk, wv, heads=heads,
                                   interpret=True)
        ext = flash_attention_out(q, k, v, x, wo, bo, heads=heads,
                                  scale=64 ** -0.5, knorm=kn, interpret=True)
        internal = flash_attention_out(q, k, v, x, wo, bo, heads=heads,
                                       scale=64 ** -0.5, interpret=True)
        np.testing.assert_array_equal(np.asarray(ext), np.asarray(internal))

    def test_ln_qkv_split_grads_match_reference(self, rng):
        from tvi.ops.pallas_attention_out import (
            ln_qkv_reference,
            ln_qkv_split,
        )
        b, s, heads, c = 1, 256, 2, 128
        inner = heads * 64
        ks = jax.random.split(rng, 6)
        x = jax.random.normal(ks[0], (b, s, c))
        lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
        lnb = 0.1 * jax.random.normal(ks[2], (c,))
        mk = lambda i: jax.random.normal(ks[i], (c, inner)) * c ** -0.5
        wq, wk, wv = mk(3), mk(4), mk(5)

        def loss(fn):
            def inner_loss(x, lns, wq, wk):
                q, k, v, _ = fn(x, lns, lnb, wq, wk, wv)
                return jnp.sum(q ** 2 + 0.5 * k ** 2 - v)
            return inner_loss

        fn_fused = lambda *a: ln_qkv_split(*a, heads=heads, interpret=True)
        fn_ref = lambda *a: ln_qkv_reference(*a, heads=heads)
        g_fused = jax.grad(loss(fn_fused), argnums=(0, 1, 2, 3))(
            x, lns, wq, wk)
        g_ref = jax.grad(loss(fn_ref), argnums=(0, 1, 2, 3))(x, lns, wq, wk)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=1e-5, rtol=1e-5)

    def test_ln_qkv_eligibility(self):
        from tvi.ops.pallas_attention_out import ln_qkv_eligible
        assert ln_qkv_eligible(50, 9216, 320, 320, 5)    # level 0
        assert ln_qkv_eligible(50, 2304, 640, 640, 10)   # level 1
        assert ln_qkv_eligible(50, 576, 1280, 1280, 20)  # level 2
        assert ln_qkv_eligible(2, 2560, 320, 320, 5)     # train geometry
        assert not ln_qkv_eligible(50, 9216, 320, 320, 4)   # d != 64
        assert not ln_qkv_eligible(50, 9217, 320, 320, 5)   # no block pick

    @pytest.mark.parametrize("b,s,heads,c", [
        (2, 512, 2, 128),
        (2, 576, 5, 320),     # level-2 S with level-0 widths
        (1, 768, 5, 320),
    ])
    def test_ln_qkv_projin_parity(self, rng, b, s, heads, c):
        """GN-affine + proj_in prologue variant vs its XLA reference
        (tvi/ops/pallas_attention_out.py::ln_qkv_projin)."""
        from tvi.ops.pallas_attention_out import (
            _ln_qkv_projin_fwd,
            ln_qkv_projin_reference,
        )
        inner = heads * 64
        ks = jax.random.split(rng, 10)
        x = jax.random.normal(ks[0], (b, s, c))
        ga = 1.0 + 0.1 * jax.random.normal(ks[1], (b, 1, c))
        gb = 0.1 * jax.random.normal(ks[2], (b, 1, c))
        win = jax.random.normal(ks[3], (c, c)) * c ** -0.5
        bin_ = 0.1 * jax.random.normal(ks[4], (c,))
        lns = 1.0 + 0.1 * jax.random.normal(ks[5], (c,))
        lnb = 0.1 * jax.random.normal(ks[6], (c,))
        mk = lambda i: jax.random.normal(ks[i], (c, inner)) * c ** -0.5
        wq, wk, wv = mk(7), mk(8), mk(9)
        got = _ln_qkv_projin_fwd(x, ga, gb, win, bin_, lns, lnb, wq, wk, wv,
                                 heads=heads, interpret=True)
        want = ln_qkv_projin_reference(x, ga, gb, win, bin_, lns, lnb,
                                       wq, wk, wv, heads=heads)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=2e-5, rtol=2e-5)

    def test_ln_qkv_projin_matches_split_after_functional_projin(self, rng):
        """ln_qkv_projin == (GN affine -> proj_in) applied functionally then
        ln_qkv_split — the dispatch-equivalence the model relies on."""
        from tvi.ops.pallas_attention_out import (
            _ln_qkv_projin_fwd,
            _ln_qkv_split_fwd,
        )
        b, s, heads, c = 1, 512, 2, 128
        inner = heads * 64
        ks = jax.random.split(rng, 10)
        x = jax.random.normal(ks[0], (b, s, c))
        ga = 1.0 + 0.1 * jax.random.normal(ks[1], (b, 1, c))
        gb = 0.1 * jax.random.normal(ks[2], (b, 1, c))
        win = jax.random.normal(ks[3], (c, c)) * c ** -0.5
        bin_ = 0.1 * jax.random.normal(ks[4], (c,))
        lns = 1.0 + 0.1 * jax.random.normal(ks[5], (c,))
        lnb = 0.1 * jax.random.normal(ks[6], (c,))
        mk = lambda i: jax.random.normal(ks[i], (c, inner)) * c ** -0.5
        wq, wk, wv = mk(7), mk(8), mk(9)
        y, q, k, v, kn = _ln_qkv_projin_fwd(
            x, ga, gb, win, bin_, lns, lnb, wq, wk, wv,
            heads=heads, interpret=True)
        xg = (x.astype(jnp.float32) * ga + gb).astype(x.dtype)
        y_fn = (jnp.einsum("bsc,cd->bsd", xg, win,
                           preferred_element_type=jnp.float32)
                + bin_.astype(jnp.float32)).astype(x.dtype)
        q2, k2, v2, kn2 = _ln_qkv_split_fwd(y_fn, lns, lnb, wq, wk, wv,
                                            heads=heads, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_fn),
                                   atol=2e-5, rtol=2e-5)
        for g, w in zip((q, k, v, kn), (q2, k2, v2, kn2)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=5e-5, rtol=5e-5)

    def test_ln_qkv_projin_grads_match_reference(self, rng):
        from tvi.ops.pallas_attention_out import (
            ln_qkv_projin,
            ln_qkv_projin_reference,
        )
        b, s, heads, c = 1, 256, 2, 128
        inner = heads * 64
        ks = jax.random.split(rng, 10)
        x = jax.random.normal(ks[0], (b, s, c))
        ga = 1.0 + 0.1 * jax.random.normal(ks[1], (b, 1, c))
        gb = 0.1 * jax.random.normal(ks[2], (b, 1, c))
        win = jax.random.normal(ks[3], (c, c)) * c ** -0.5
        bin_ = 0.1 * jax.random.normal(ks[4], (c,))
        lns = 1.0 + 0.1 * jax.random.normal(ks[5], (c,))
        lnb = 0.1 * jax.random.normal(ks[6], (c,))
        mk = lambda i: jax.random.normal(ks[i], (c, inner)) * c ** -0.5
        wq, wk, wv = mk(7), mk(8), mk(9)

        def loss(fn):
            def inner_loss(x, win, wq):
                y, q, k, v, _ = fn(x, ga, gb, win, bin_, lns, lnb, wq, wk, wv)
                return jnp.sum(y ** 2 + q ** 2 + 0.5 * k ** 2 - v)
            return inner_loss

        fn_fused = lambda *a: ln_qkv_projin(*a, heads=heads, interpret=True)
        fn_ref = lambda *a: ln_qkv_projin_reference(*a, heads=heads)
        g_fused = jax.grad(loss(fn_fused), argnums=(0, 1, 2))(x, win, wq)
        g_ref = jax.grad(loss(fn_ref), argnums=(0, 1, 2))(x, win, wq)
        for gf, gr in zip(g_fused, g_ref):
            # the cotangents are computed from the kernel's primal (one
            # extra fp32 dot's accumulation order vs the reference)
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=1e-4, rtol=2e-3)

    def test_ln_qkv_projin_eligibility(self):
        from tvi.ops.pallas_attention_out import ln_qkv_projin_eligible
        assert ln_qkv_projin_eligible(50, 9216, 320, 320, 320, 5)
        assert ln_qkv_projin_eligible(50, 2304, 640, 640, 640, 10)
        assert ln_qkv_projin_eligible(50, 576, 1280, 1280, 1280, 20)
        assert not ln_qkv_projin_eligible(50, 9216, 320, 320, 320, 4)
        assert not ln_qkv_projin_eligible(50, 9217, 320, 320, 320, 5)

    @pytest.mark.parametrize("b,s,heads,c_out", [(2, 512, 2, 128),
                                                 (1, 256, 5, 320)])
    def test_packed_matches_split(self, rng, b, s, heads, c_out):
        from tvi.ops.pallas_attention_out import (
            attention_out_reference,
            flash_attention_out_packed,
        )
        d = 64
        inner = heads * d
        ks = jax.random.split(rng, 4)
        qkv = jax.random.normal(ks[0], (b, s, 3 * inner))
        x_res = jax.random.normal(ks[1], (b, s, c_out))
        wo = jax.random.normal(ks[2], (inner, c_out)) * inner ** -0.5
        bo = jax.random.normal(ks[3], (c_out,)) * 0.1
        scale = d ** -0.5
        got = flash_attention_out_packed(qkv, x_res, wo, bo, heads=heads,
                                         scale=scale, block_q=128,
                                         interpret=True)
        q, k, v = (qkv[..., :inner], qkv[..., inner:2 * inner],
                   qkv[..., 2 * inner:])
        want = attention_out_reference(q, k, v, x_res, wo, bo, heads=heads,
                                       scale=scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)


    def test_ff_epilogue(self, rng):
        """norm3 + GEGLU FF folded into the cross kernel's epilogue vs the
        unfused cross -> FF chain (tvi/ops/pallas_fused_cross.py)."""
        from tvi.ops.pallas_fused_cross import (
            fused_cross_attention,
            fused_cross_reference,
            to_head_major_ctx,
        )
        from tvi.ops.pallas_fused_ff import fused_ff_reference

        g, rpg, c, heads, s_ctx = 2, 256, 128, 2, 3
        inner = heads * 64
        f_inner = 4 * c
        m = g * rpg
        ks = jax.random.split(rng, 10)
        x2 = jax.random.normal(ks[0], (m, c))
        lns = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
        lnb = jnp.zeros((c,))
        wq = jax.random.normal(ks[2], (c, inner)) * c ** -0.5
        ck = jax.random.normal(ks[3], (g, s_ctx, inner))
        cv = jax.random.normal(ks[4], (g, s_ctx, inner))
        wo = jax.random.normal(ks[5], (inner, c)) * inner ** -0.5
        bo = jnp.zeros((c,))
        fls = jax.random.normal(ks[6], (c,)) * 0.2 + 1.0
        flb = jnp.zeros((c,))
        fw1 = jax.random.normal(ks[7], (c, 2 * f_inner)) * c ** -0.5
        fb1 = jax.random.normal(ks[8], (2 * f_inner,)) * 0.1
        fw2 = jax.random.normal(ks[9], (f_inner, c)) * f_inner ** -0.5
        fb2 = jnp.zeros((c,))
        scale = 64 ** -0.5
        ckh = to_head_major_ctx(ck, heads)
        cvh = to_head_major_ctx(cv, heads)

        got = fused_cross_attention(
            x2, lns, lnb, wq, ckh, cvh, wo, bo, heads=heads, scale=scale,
            rows_per_group=rpg, residual=True,
            ff_params=(fls, flb, fw1, fb1, fw2, fb2), bm=128, interpret=True)
        y = fused_cross_reference(x2, lns, lnb, wq, ckh, cvh, wo, bo,
                                  heads=heads, scale=scale,
                                  rows_per_group=rpg, residual=True)
        want = fused_ff_reference(y, fls, flb, fw1, fb1, fw2, fb2,
                                  residual=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)

    def test_ff_epilogue_grad(self, rng):
        from tvi.ops.pallas_fused_cross import (
            fused_cross_attention,
            to_head_major_ctx,
        )
        g, rpg, c, heads, s_ctx = 2, 128, 64, 1, 2
        inner = heads * 64
        m = g * rpg
        ks = jax.random.split(rng, 8)
        x2 = jax.random.normal(ks[0], (m, c))
        wq = jax.random.normal(ks[1], (c, inner)) * 0.1
        ck = to_head_major_ctx(jax.random.normal(ks[2], (g, s_ctx, inner)),
                               heads)
        cv = to_head_major_ctx(jax.random.normal(ks[3], (g, s_ctx, inner)),
                               heads)
        wo = jax.random.normal(ks[4], (inner, c)) * 0.1
        bo = jnp.zeros((c,))
        fw1 = jax.random.normal(ks[5], (c, 8 * c)) * 0.1
        fb1 = jnp.zeros((8 * c,))
        fw2 = jax.random.normal(ks[6], (4 * c, c)) * 0.1
        fb2 = jnp.zeros((c,))
        lns, lnb = jnp.ones((c,)), jnp.zeros((c,))

        def loss(fw1_, x_):
            out = fused_cross_attention(
                x_, lns, lnb, wq, ck, cv, wo, bo, heads=heads,
                scale=64 ** -0.5, rows_per_group=rpg, residual=True,
                ff_params=(lns, lnb, fw1_, fb1, fw2, fb2), bm=64,
                interpret=True)
            return jnp.sum(out ** 2)

        gw, gx = jax.grad(loss, argnums=(0, 1))(fw1, x2)
        assert np.isfinite(np.asarray(gw)).all()
        assert np.isfinite(np.asarray(gx)).all()
        assert float(jnp.abs(gw).max()) > 0


    @pytest.mark.parametrize("b,f,s", [(2, 10, 64), (1, 25, 128)])
    def test_out4d_final_output(self, rng, b, f, s):
        """out4d variant: attn2+FF + alpha blend + proj_out + outer
        residual in one kernel, output written in the (B, F, S, C) spatial
        view — vs the materialized reference chain.  F=25 covers the
        non-tile-aligned frame count (padded to the 16-sublane tile in
        VMEM; the flat-block layout real Mosaic rejected in round 4)."""
        from tvi.ops.pallas_fused_cross import (
            cross_ff_out4d_reference,
            fused_cross_ff_out4d,
            to_head_major_ctx,
        )
        c, heads, s_ctx = 64, 1, 2
        inner = heads * 64
        f_inner = 4 * c
        ks = jax.random.split(rng, 14)
        x2 = jax.random.normal(ks[0], (b * s * f, c))
        lns = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
        lnb = jnp.zeros((c,))
        wq = jax.random.normal(ks[2], (c, inner)) * c ** -0.5
        ck = to_head_major_ctx(jax.random.normal(ks[3], (b, s_ctx, inner)),
                               heads)
        cv = to_head_major_ctx(jax.random.normal(ks[4], (b, s_ctx, inner)),
                               heads)
        wo = jax.random.normal(ks[5], (inner, c)) * inner ** -0.5
        bo = jnp.zeros((c,))
        fls = jax.random.normal(ks[6], (c,)) * 0.2 + 1.0
        flb = jnp.zeros((c,))
        fw1 = jax.random.normal(ks[7], (c, 2 * f_inner)) * c ** -0.5
        fb1 = jax.random.normal(ks[8], (2 * f_inner,)) * 0.1
        fw2 = jax.random.normal(ks[9], (f_inner, c)) * f_inner ** -0.5
        fb2 = jnp.zeros((c,))
        wpo = jax.random.normal(ks[10], (c, c)) * c ** -0.5
        bpo = jax.random.normal(ks[11], (c,)) * 0.1
        alpha = jax.nn.sigmoid(jnp.full((1,), 0.5))
        spatial4 = jax.random.normal(ks[12], (b, f, s, c))
        res4 = jax.random.normal(ks[13], (b, f, s, c))
        ffp = (fls, flb, fw1, fb1, fw2, fb2)
        scale = 64 ** -0.5

        got = fused_cross_ff_out4d(x2, lns, lnb, wq, ck, cv, wo, bo, ffp,
                                   wpo, bpo, alpha, spatial4, res4,
                                   heads=heads, scale=scale, interpret=True)
        want = cross_ff_out4d_reference(
            x2, lns, lnb, wq, ck, cv, wo, bo, *ffp, wpo, bpo, alpha,
            spatial4, res4, heads=heads, scale=scale,
            rows_per_group=s * f)
        assert got.shape == (b, f, s, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3, rtol=1e-3)

    def test_out4d_grad_finite(self, rng):
        from tvi.ops.pallas_fused_cross import (
            fused_cross_ff_out4d,
            to_head_major_ctx,
        )
        b, f, s, c, heads, s_ctx = 1, 8, 32, 64, 1, 2
        inner = 64
        ks = jax.random.split(rng, 10)
        x2 = jax.random.normal(ks[0], (b * s * f, c))
        ones, zeros = jnp.ones((c,)), jnp.zeros((c,))
        wq = jax.random.normal(ks[1], (c, inner)) * 0.1
        ck = to_head_major_ctx(jax.random.normal(ks[2], (b, s_ctx, inner)), 1)
        cv = to_head_major_ctx(jax.random.normal(ks[3], (b, s_ctx, inner)), 1)
        wo = jax.random.normal(ks[4], (inner, c)) * 0.1
        fw1 = jax.random.normal(ks[5], (c, 8 * c)) * 0.1
        fw2 = jax.random.normal(ks[6], (4 * c, c)) * 0.1
        wpo = jax.random.normal(ks[7], (c, c)) * 0.1
        spatial4 = jax.random.normal(ks[8], (b, f, s, c))
        res4 = jax.random.normal(ks[9], (b, f, s, c))
        alpha = jax.nn.sigmoid(jnp.full((1,), 0.5))
        ffp = (ones, zeros, fw1, jnp.zeros((8 * c,)), fw2, zeros)

        def loss(wpo_, x_):
            out = fused_cross_ff_out4d(
                x_, ones, zeros, wq, ck, cv, wo, zeros, ffp, wpo_, zeros,
                alpha, spatial4, res4, heads=1, scale=0.125, interpret=True)
            return jnp.sum(out ** 2)

        gw, gx = jax.grad(loss, argnums=(0, 1))(wpo, x2)
        assert np.isfinite(np.asarray(gw)).all()
        assert np.isfinite(np.asarray(gx)).all()
        assert float(jnp.abs(gw).max()) > 0


class TestLnAttentionOutV5:
    """v5 whole-sublayer kernel (LN + QKV + flash + out-proj + residual)
    vs the unfused XLA composition (tvi/ops/pallas_attention_v5.py)."""

    @pytest.mark.parametrize("b,s,c,heads,residual", [
        (2, 512, 128, 2, True),      # level-like small shape
        (1, 1024, 320, 5, True),     # level-0-like channel count
        (2, 576, 256, 2, True),      # S not 128-aligned (level-1280-like)
        (2, 512, 128, 2, False),
    ])
    def test_matches_unfused(self, rng, b, s, c, heads, residual):
        from tvi.models.layers import layer_norm
        from tvi.ops.pallas_attention_out import attention_out_reference
        from tvi.ops.pallas_attention_v5 import (
            fused_ln_attention_out,
            ln_attention_out_eligible,
        )
        d = 64
        inner = heads * d
        ks = jax.random.split(rng, 6)
        x = jax.random.normal(ks[0], (b, s, c))
        lns = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
        lnb = jax.random.normal(ks[2], (c,)) * 0.2
        wq = jax.random.normal(ks[3], (c, inner)) * c ** -0.5
        wkv = jax.random.normal(ks[4], (c, 2 * inner)) * c ** -0.5
        wo = jax.random.normal(ks[5], (inner, c)) * inner ** -0.5
        bo = jnp.arange(c, dtype=jnp.float32) * 1e-3
        scale = d ** -0.5
        assert ln_attention_out_eligible(b, s, c, inner, c, heads)

        got = fused_ln_attention_out(x, lns, lnb, wq, wkv, wo, bo,
                                     heads=heads, scale=scale,
                                     residual=residual,
                                     block_q=128 if s % 128 == 0 else 0,
                                     interpret=True)
        xn = layer_norm(x, lns, lnb)
        want = attention_out_reference(xn @ wq, xn @ wkv[:, :inner],
                                       xn @ wkv[:, inner:], x, wo, bo,
                                       heads=heads, scale=scale,
                                       residual=residual)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)

    def test_gradient_finite(self, rng):
        from tvi.ops.pallas_attention_v5 import fused_ln_attention_out
        b, s, c, heads = 1, 256, 128, 2
        inner = heads * 64
        ks = jax.random.split(rng, 5)
        x = jax.random.normal(ks[0], (b, s, c))
        lns, lnb = jnp.ones((c,)), jnp.zeros((c,))
        wq = jax.random.normal(ks[1], (c, inner)) * 0.05
        wkv = jax.random.normal(ks[2], (c, 2 * inner)) * 0.05
        wo = jax.random.normal(ks[3], (inner, c)) * 0.05
        bo = jnp.zeros((c,))

        def loss(wq_, x_):
            out = fused_ln_attention_out(x_, lns, lnb, wq_, wkv, wo, bo,
                                         heads=heads, scale=64 ** -0.5,
                                         block_q=128, interpret=True)
            return jnp.sum(out ** 2)

        gw, gx = jax.grad(loss, argnums=(0, 1))(wq, x)
        assert np.isfinite(np.asarray(gw)).all()
        assert np.isfinite(np.asarray(gx)).all()
        assert float(jnp.abs(gx).max()) > 0

    def test_eligibility(self):
        from tvi.ops.pallas_attention_v5 import ln_attention_out_eligible
        assert ln_attention_out_eligible(50, 9216, 320, 320, 320, 5)
        assert ln_attention_out_eligible(50, 2304, 640, 640, 640, 10)
        # 1280 level: S=576 handled via in-kernel K/V padding + col mask
        assert ln_attention_out_eligible(50, 576, 1280, 1280, 1280, 20)
        assert not ln_attention_out_eligible(50, 9216, 320, 320, 320, 4)

    def test_gn_in_proj_variant(self, rng):
        """GroupNorm affine + proj_in + LN + attention in one kernel vs the
        XLA composition GN -> proj -> LN -> attn -> out + xp residual."""
        from tvi.models.layers import layer_norm
        from tvi.ops.groupnorm import group_norm_affine_params
        from tvi.ops.pallas_attention_out import attention_out_reference
        from tvi.ops.pallas_attention_v5 import fused_ln_attention_out
        b, s, c, heads = 2, 512, 128, 2
        inner = heads * 64
        ks = jax.random.split(rng, 9)
        x = jax.random.normal(ks[0], (b, s, c))
        gs = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
        gb = jax.random.normal(ks[2], (c,)) * 0.2
        ga, gab = group_norm_affine_params(x, gs, gb, 4, eps=1e-6)
        w_in = jax.random.normal(ks[3], (c, c)) * c ** -0.5
        b_in = jax.random.normal(ks[4], (c,)) * 0.1
        lns = jax.random.normal(ks[5], (c,)) * 0.2 + 1.0
        lnb = jnp.zeros((c,))
        wq = jax.random.normal(ks[6], (c, inner)) * c ** -0.5
        wkv = jax.random.normal(ks[7], (c, 2 * inner)) * c ** -0.5
        wo = jax.random.normal(ks[8], (inner, c)) * inner ** -0.5
        bo = jnp.zeros((c,))
        scale = 64 ** -0.5

        got = fused_ln_attention_out(x, lns, lnb, wq, wkv, wo, bo, w_in,
                                     b_in, ga[:, None, :], gab[:, None, :],
                                     heads=heads, scale=scale, block_q=128,
                                     interpret=True)
        xg = x * ga[:, None, :] + gab[:, None, :]
        xp = xg @ w_in + b_in
        xn = layer_norm(xp, lns, lnb)
        want = attention_out_reference(xn @ wq, xn @ wkv[:, :inner],
                                       xn @ wkv[:, inner:], xp, wo, bo,
                                       heads=heads, scale=scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)

    def test_dispatch_through_attention_module(self, rng, monkeypatch):
        """Force the flash path with the v5 kernel in interpret mode and
        compare against the pure-XLA Attention path (flash disabled) —
        validates the layers.py gating, wkv concat order, eps and the
        residual semantics at the dispatch site."""
        import tvi.ops.pallas_attention_v5 as v5
        from tvi.models.layers import Attention

        monkeypatch.setenv("TVI_ATTN_SHIFT", "bound_unguarded")
        monkeypatch.setenv("TVI_ATTN_V5", "1")  # opt-in since round 4
        b, s, c, heads = 2, 512, 128, 2
        x = jax.random.normal(rng, (b, s, c))
        lns = jax.random.normal(jax.random.PRNGKey(7), (c,)) * 0.2 + 1.0
        lnb = jax.random.normal(jax.random.PRNGKey(8), (c,)) * 0.2
        attn = Attention(heads=heads, dim_head=64, dtype=jnp.float32)
        params = attn.init(jax.random.PRNGKey(1), x, pre_ln=(lns, lnb),
                           residual_add=True)
        out_ref = attn.apply(params, x, pre_ln=(lns, lnb), residual_add=True)

        orig = v5.fused_ln_attention_out
        calls = []

        def spy(*args, **kw):
            calls.append(args[0].shape)
            kw["interpret"] = True
            return orig(*args, **kw)

        monkeypatch.setattr(v5, "fused_ln_attention_out", spy)
        set_flash_attention(True)
        try:
            out_v5 = attn.apply(params, x, pre_ln=(lns, lnb),
                                residual_add=True)
        finally:
            set_flash_attention(False)
        assert calls, "v5 path was not taken"
        assert calls[0] == (b, s, c)
        np.testing.assert_allclose(np.asarray(out_v5), np.asarray(out_ref),
                                   atol=3e-4, rtol=3e-4)

    def test_in_proj_variant(self, rng):
        """proj_in absorbed into the kernel (xp scratch) vs the XLA
        composition proj -> LN -> attention -> out + xp residual."""
        from tvi.models.layers import layer_norm
        from tvi.ops.pallas_attention_out import attention_out_reference
        from tvi.ops.pallas_attention_v5 import fused_ln_attention_out
        b, s, c_in, c, heads = 2, 512, 192, 128, 2
        inner = heads * 64
        ks = jax.random.split(rng, 7)
        x = jax.random.normal(ks[0], (b, s, c_in))
        w_in = jax.random.normal(ks[1], (c_in, c)) * c_in ** -0.5
        b_in = jax.random.normal(ks[2], (c,)) * 0.1
        lns = jax.random.normal(ks[3], (c,)) * 0.2 + 1.0
        lnb = jnp.zeros((c,))
        wq = jax.random.normal(ks[4], (c, inner)) * c ** -0.5
        wkv = jax.random.normal(ks[5], (c, 2 * inner)) * c ** -0.5
        wo = jax.random.normal(ks[6], (inner, c)) * inner ** -0.5
        bo = jnp.zeros((c,))
        scale = 64 ** -0.5

        got = fused_ln_attention_out(x, lns, lnb, wq, wkv, wo, bo, w_in, b_in,
                                     heads=heads, scale=scale, block_q=128,
                                     interpret=True)
        xp = x @ w_in + b_in
        xn = layer_norm(xp, lns, lnb)
        want = attention_out_reference(xn @ wq, xn @ wkv[:, :inner],
                                       xn @ wkv[:, inner:], xp, wo, bo,
                                       heads=heads, scale=scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)

    def test_proj_in_dispatch_through_transformer(self, rng, monkeypatch):
        """TransformerSpatioTemporalModel hands proj_in's weights to the
        first block; forced-flash v5 (interpret) must match the XLA path."""
        import tvi.ops.pallas_attention_v5 as v5
        from tvi.models.transformer_temporal import (
            TransformerSpatioTemporalModel,
        )

        monkeypatch.setenv("TVI_ATTN_SHIFT", "bound_unguarded")
        monkeypatch.setenv("TVI_ATTN_V5", "1")      # opt-in since round 4
        monkeypatch.setenv("TVI_V5_PROJIN", "1")    # proj_in fold opt-in too
        # only the v5 kernel is monkeypatched to interpret mode: keep the
        # other fused kernels (temporal sublayer, cross, whole-FF/GEGLU)
        # on their XLA fallbacks for this CPU test
        monkeypatch.setenv("TVI_DISABLE_FUSED_TEMPORAL", "1")
        monkeypatch.setenv("TVI_DISABLE_FUSED_CROSS", "1")
        monkeypatch.setenv("TVI_DISABLE_FUSED_GEGLU", "1")
        monkeypatch.setenv("TVI_FUSED_FF", "0")
        monkeypatch.setenv("TVI_DISABLE_ATTN_PACKED", "1")
        heads, dim_head, c = 2, 64, 128
        b, f, h, w = 1, 2, 16, 32     # S = 512 (>= 2 q-blocks)
        m = TransformerSpatioTemporalModel(heads=heads, dim_head=dim_head,
                                           dtype=jnp.float32)
        x = jax.random.normal(rng, (b * f, h, w, c))
        ctx = (jnp.ones((b, 2, 32)), jnp.ones((b, 1, 32)))
        params = m.init(jax.random.PRNGKey(1), x, f, ctx)
        out_ref = m.apply(params, x, f, ctx)

        orig = v5.fused_ln_attention_out
        calls = []

        def spy(*args, **kw):
            calls.append(args[7] is not None)   # w_in operand present?
            kw["interpret"] = True
            return orig(*args, **kw)

        monkeypatch.setattr(v5, "fused_ln_attention_out", spy)
        # attn2's unfused fallback also reaches a flash kernel: interpret it
        import tvi.ops.pallas_attention as pa

        orig_flash = pa.flash_self_attention
        monkeypatch.setattr(
            pa, "flash_self_attention",
            lambda *a, **kw: orig_flash(*a, **{**kw, "interpret": True}))
        import tvi.ops.pallas_temporal_attention as pta

        orig_rows = pta.temporal_rows_attention
        monkeypatch.setattr(
            pta, "temporal_rows_attention",
            lambda *a, **kw: orig_rows(*a, **{**kw, "interpret": True}))
        set_flash_attention(True)
        try:
            out_v5 = m.apply(params, x, f, ctx)
        finally:
            set_flash_attention(False)
        assert calls and calls[0], "v5 in_proj path was not taken"
        np.testing.assert_allclose(np.asarray(out_v5), np.asarray(out_ref),
                                   atol=2e-3, rtol=2e-3)
