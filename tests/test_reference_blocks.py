"""Golden-activation parity: the reference's OWN vendored torch blocks
executed on CPU (via tests/diffusers_shim.py) vs the flax rebuild with
converted weights (VERDICT r2 item 6 — the missing middle of the test
pyramid, SURVEY §7.2.2).

Anchors the *model semantics* — block wiring, tuple-context split,
first-frame time context, frame-position embedding, alpha blending — to
the reference files themselves:
  - BasicTransformerBlock            reference src/models/attention.py:84
  - TemporalBasicTransformerBlock    reference src/models/attention.py:351
  - SpatioTemporalResBlock           (shim impl, diffusers semantics)
  - TransformerSpatioTemporalModel   reference src/models/transformer_temporal.py:207-356

All comparisons run fp32 at tiny configs; weights are converted with the
production converter (tvi.io.hf_weights.state_dict_to_flax), so these tests
also pin the key translation + layout transforms against live torch code.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")

import diffusers_shim  # noqa: E402

diffusers_shim.install()

import models.attention as ref_attention  # noqa: E402  (reference code)
import models.transformer_temporal as ref_tt  # noqa: E402

from tvi.io.hf_weights import state_dict_to_flax  # noqa: E402
from tvi.models.resnet import SpatioTemporalResBlock  # noqa: E402
from tvi.models.transformer_temporal import (  # noqa: E402
    BasicTransformerBlock,
    TemporalBasicTransformerBlock,
    TransformerSpatioTemporalModel,
)

DIM, HEADS, HEAD_DIM, CTX = 32, 2, 16, 24
ATOL = 2e-5


def _to_flax(module: torch.nn.Module) -> dict:
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    return state_dict_to_flax(sd)


def _np(t):
    return t.detach().numpy()


@pytest.fixture(autouse=True)
def _seed():
    torch.manual_seed(0)


def test_basic_transformer_block_matches_reference():
    ref = ref_attention.BasicTransformerBlock(
        DIM, HEADS, HEAD_DIM, cross_attention_dim=CTX).eval()
    x = torch.randn(3, 10, DIM)
    ctx = torch.randn(3, 4, CTX)
    with torch.no_grad():
        want = ref(x, encoder_hidden_states=ctx)

    blk = BasicTransformerBlock(heads=HEADS, dim_head=HEAD_DIM)
    got = blk.apply(_to_flax(ref), jnp.asarray(_np(x)), jnp.asarray(_np(ctx)))
    np.testing.assert_allclose(np.asarray(got), _np(want), atol=ATOL, rtol=1e-4)


def test_temporal_basic_transformer_block_matches_reference():
    b, f, s = 2, 4, 6
    ref = ref_attention.TemporalBasicTransformerBlock(
        DIM, DIM, HEADS, HEAD_DIM, cross_attention_dim=CTX).eval()
    x_bf = torch.randn(b * f, s, DIM)          # reference layout (BF, S, C)
    ctx_bs = torch.randn(b * s, 2, CTX)        # per-pixel-row context
    with torch.no_grad():
        want = ref(x_bf, num_frames=f, encoder_hidden_states=ctx_bs)

    # flax block consumes the frame-major layout the reference builds
    # internally: (BF, S, C) -> (B*S, F, C)
    x_bs = _np(x_bf).reshape(b, f, s, DIM).transpose(0, 2, 1, 3).reshape(
        b * s, f, DIM)
    blk = TemporalBasicTransformerBlock(heads=HEADS, dim_head=HEAD_DIM)
    got_bs = blk.apply(_to_flax(ref), jnp.asarray(x_bs),
                       jnp.asarray(_np(ctx_bs)))
    got = np.asarray(got_bs).reshape(b, s, f, DIM).transpose(0, 2, 1, 3).reshape(
        b * f, s, DIM)
    np.testing.assert_allclose(got, _np(want), atol=ATOL, rtol=1e-4)


def test_spatio_temporal_res_block_matches_shim():
    b, f, c, h, w, temb_c = 1, 4, DIM, 6, 8, 16
    ref = diffusers_shim.SpatioTemporalResBlock(
        in_channels=c, out_channels=c, temb_channels=temb_c, eps=1e-5).eval()
    x = torch.randn(b * f, c, h, w)
    temb = torch.randn(b * f, temb_c)
    ioi = torch.zeros(b, f)
    with torch.no_grad():
        want = ref(x, temb=temb, image_only_indicator=ioi)

    blk = SpatioTemporalResBlock(out_channels=c, eps=1e-5)
    x_nhwc = jnp.asarray(_np(x).transpose(0, 2, 3, 1))
    got = blk.apply(_to_flax(ref), x_nhwc, jnp.asarray(_np(temb)),
                    num_frames=f)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               _np(want), atol=ATOL, rtol=1e-4)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_transformer_spatio_temporal_model_matches_reference(num_layers):
    """The flagship wiring target (reference transformer_temporal.py:253-356):
    tuple context split, FIRST-frame temporal context, frame-position
    embedding added before the temporal block, shared AlphaBlender across
    layers, proj_out + residual."""
    b, f, h, w = 1, 3, 4, 8
    ref = ref_tt.TransformerSpatioTemporalModel(
        num_attention_heads=HEADS, attention_head_dim=HEAD_DIM,
        in_channels=DIM, num_layers=num_layers,
        cross_attention_dim=CTX).eval()
    x = torch.randn(b * f, DIM, h, w)
    # per-batch contexts, repeated per frame for the torch call (the
    # pipeline feeds frame-repeated context; the flax model takes the
    # per-batch tensor and broadcasts internally)
    sp_b = torch.randn(b, 3, CTX)
    tm_b = torch.randn(b, 2, CTX)
    sp_bf = sp_b.repeat_interleave(f, dim=0)
    tm_bf = tm_b.repeat_interleave(f, dim=0)
    ioi = torch.zeros(b, f)
    with torch.no_grad():
        want = ref(x, encoder_hidden_states=(sp_bf, tm_bf),
                   image_only_indicator=ioi, return_dict=False)[0]

    model = TransformerSpatioTemporalModel(heads=HEADS, dim_head=HEAD_DIM,
                                           num_layers=num_layers)
    x_nhwc = jnp.asarray(_np(x).transpose(0, 2, 3, 1))
    got = model.apply(_to_flax(ref), x_nhwc, f,
                      (jnp.asarray(_np(sp_b)), jnp.asarray(_np(tm_b))))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               _np(want), atol=5e-5, rtol=1e-4)


def test_reference_temporal_context_row_order_quirk_documented():
    """At batch_size > 1 the reference broadcasts the temporal context
    PIXEL-major (reshape(H*W*B, ...) at transformer_temporal.py:297) while
    TemporalBasicTransformerBlock reshapes hidden states BATCH-major
    (attention.py:438-440) — so with a CFG pair whose cond/uncond contexts
    differ, hidden row (b, pixel p) attends to context[(b*S + p) % B], i.e.
    alternating cond/uncond context per pixel.  The flax rebuild uses the
    consistent batch-major pairing.  This test pins the quirk so the
    divergence is a DOCUMENTED deliberate fix (PARITY.md), not drift."""
    b, s, f = 2, 4, 2
    ctx0 = torch.zeros(1, 2, CTX)
    ctx1 = torch.ones(1, 2, CTX)
    # pixel-major broadcast as the reference builds it: (S*B, 2, CTX)
    per_batch = torch.cat([ctx0, ctx1])                    # (B, 2, CTX)
    ref_rows = per_batch[None].broadcast_to(s, b, 2, CTX).reshape(s * b, 2, CTX)
    # batch-major pairing the flax rebuild uses: row b*S + p -> ctx[b]
    flax_rows = per_batch[:, None].broadcast_to(b, s, 2, CTX).reshape(
        b * s, 2, CTX)
    # row 1 (b=0, p=1) gets ctx[1] under the reference's ordering:
    assert torch.equal(ref_rows[1], ctx1[0])
    assert torch.equal(flax_rows[1], ctx0[0])
