"""Conditioning projectors.

- FeatureProjector (reference src/models/feature_projector.py:6-43, and the
  inline VAEFeatureProjector twins at train_decouples.py:547-585 /
  test.py:487-529): Linear(input_dim -> 1024) + LayerNorm, producing the
  *temporal* conditioning token from concat([CLIP(first), CLIP(end)]).
- MotionEncoder (reference ``SimpleEncoder`` at train_decouples.py:349-368):
  strided conv stack + global average pool + Linear(64 -> 1024) over
  single-channel motion maps.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FeatureProjector(nn.Module):
    output_dim: int = 1024
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.output_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="norm")(x)


class MotionEncoder(nn.Module):
    """Conv2d(1->16->32->64, stride 2, ReLU) + global avg pool + Dense(1024)
    (train_decouples.py:349-368).  Input NHWC (B, H, W, 1)."""

    output_dim: int = 1024
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, ch in enumerate((16, 32, 64)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = x.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc")(x)
