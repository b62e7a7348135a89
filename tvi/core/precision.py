"""Mixed-precision policy for TPU: fp32 params, bf16 compute.

The reference relies on accelerate fp16/bf16 autocasting
(src/train.py:269-273, 1028-1037).  On TPU the native fast dtype is bf16;
we keep parameters in fp32 (optimizer master copies) and cast to bf16 at
module boundaries, letting the MXU consume bf16 operands with fp32
accumulation (preferred_element_type)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.bfloat16

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32, output_dtype=jnp.float32)
