"""int8 W8A8 matmul numerics (serving-mode building blocks)."""

import jax
import jax.numpy as jnp
import numpy as np

from tvi.ops.quant import (
    dense_w8a8,
    int8_matmul,
    quantize_cols,
    quantize_param_tree,
    quantize_rows,
)


def test_row_quant_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64)) * 3.0
    xi, s = quantize_rows(x)
    assert xi.dtype == jnp.int8 and s.shape == (8, 1)
    rec = xi.astype(jnp.float32) * s
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                               atol=float(jnp.max(jnp.abs(x))) / 127 + 1e-6)


def test_w8a8_matmul_close_to_fp():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (32, 256))
    w = jax.random.normal(k2, (256, 128)) * 0.05
    want = np.asarray(x @ w)
    wi, ws = quantize_cols(w)
    xi, sx = quantize_rows(x)
    got = np.asarray(int8_matmul(xi, sx, wi, ws, out_dtype=jnp.float32))
    # W8A8 with per-row/per-col symmetric scales: ~1% mean relative error,
    # few-percent tails (standard serving-quality quantization)
    denom = np.maximum(np.abs(want), np.abs(want).std())
    rel = np.abs(got - want) / denom
    assert rel.mean() < 0.02 and rel.max() < 0.08


def test_dense_w8a8_bias_and_batch_dims():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (2, 5, 64), jnp.bfloat16)
    w = jax.random.normal(k2, (64, 32)) * 0.1
    b = jnp.linspace(-1, 1, 32)
    wi, ws = quantize_cols(w)
    got = dense_w8a8(x, wi, ws, bias=b)
    assert got.shape == (2, 5, 32) and got.dtype == jnp.bfloat16
    want = np.asarray(x.astype(jnp.float32) @ w + b)
    assert np.max(np.abs(np.asarray(got, np.float32) - want)) < 0.2


def test_serving_mode_unet_close_and_tree_unchanged(monkeypatch):
    """TVI_SERVE_INT8 routes transformer matmuls through W8A8: outputs stay
    close to the bf16 path on a tiny UNet, params identical."""
    from tvi.core.config import TINY_UNET
    from tvi.models.unet_st import UNetSpatioTemporalConditionModel

    m = UNetSpatioTemporalConditionModel(TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16, 9)) * 0.3
    ctx = (jnp.ones((1, 2, 32)), jnp.ones((1, 1, 32)))
    args = (x, jnp.zeros((1,)), ctx, jnp.zeros((1, 3)))
    v = m.init(jax.random.PRNGKey(1), *args)
    want = m.apply(v, *args)[0]

    monkeypatch.setenv("TVI_SERVE_INT8", "1")
    v2 = m.init(jax.random.PRNGKey(1), *args)
    got = m.apply(v2, *args)[0]

    assert jax.tree.structure(v) == jax.tree.structure(v2)
    diff = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.std(want)) + 1e-6
    assert 0 < diff / scale < 0.35, (diff, scale)
    # quantization error must be visible but small in aggregate
    assert float(jnp.mean(jnp.abs(got - want))) / scale < 0.05


def test_quantize_param_tree_selective():
    params = {
        "blk": {"to_q": {"kernel": jnp.ones((8, 8)), "bias": jnp.zeros((8,))},
                "conv": {"kernel": jnp.ones((3, 3, 4, 4))}},
    }
    out = quantize_param_tree(params, lambda p, w: "to_q" in p)
    assert "kernel_i8" in out["blk"]["to_q"]
    assert "kernel_scale" in out["blk"]["to_q"]
    assert "kernel" not in out["blk"]["to_q"]
    assert out["blk"]["conv"]["kernel"].shape == (3, 3, 4, 4)
