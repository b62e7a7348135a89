"""GroupNorm(+SiLU) reformulated for TPU NHWC layouts.

Why: flax ``nn.GroupNorm`` reshapes the channel (lane) dimension into
(groups, C/group) before reducing — on TPU that splits the 128-wide lane
tiling and forces relayouts; ablation showed GroupNorm alone costs 1.08 s of
the 2.80 s VAE decode at the headline geometry (scripts/perf_lab.py
round2b: dec_base 2803 ms vs dec_nogn 1719 ms).

This formulation never splits lanes on the big tensor:
  1. per-CHANNEL sum/sumsq reduced over the spatial dims (lane-aligned,
     one pass, multi-output fusion),
  2. group combine + affine fold on the tiny (N, C) stats,
  3. one fused elementwise pass y = silu(x * scale_c + bias_c) with
     per-channel (lane-uniform) operands.

Matches flax ``nn.GroupNorm`` (use_fast_variance=True default: var =
E[x^2] - E[x]^2 in fp32) to fp32 rounding; reference GN sites:
diffusers ResnetBlock2D norm1/norm2 + SiLU (via src/models/unet_3d_blocks.py
resnets), TransformerSpatioTemporalModel.norm
(src/models/transformer_temporal.py:228), VAE conv_norm_out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm_stats(x: jax.Array, num_groups: int):
    """x: (N, ..., C) -> per-group (mean, rstd-ready var) of shape (N, G)."""
    n = x.shape[0]
    c = x.shape[-1]
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(n, -1, c)
    cnt = xf.shape[1] * cg
    s = jnp.sum(xf, axis=1)                    # (N, C) — lane-aligned pass
    s2 = jnp.sum(jnp.square(xf), axis=1)
    gs = s.reshape(n, num_groups, cg).sum(-1)  # tiny group combine
    gs2 = s2.reshape(n, num_groups, cg).sum(-1)
    mean = gs / cnt
    var = gs2 / cnt - jnp.square(mean)
    return mean, var


def group_norm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    num_groups: int, eps: float = 1e-5,
                    apply_silu: bool = True) -> jax.Array:
    """Fused GroupNorm(+SiLU).  x: (N, ..., C); scale/bias: (C,).

    The streaming Pallas kernel pair (tvi.ops.pallas_groupnorm) is OPT-IN
    via TVI_PALLAS_GN=1 (read at trace time): despite the XLA formulation's
    mediocre isolated bandwidth (~320 GB/s), the Pallas version REGRESSES
    end-to-end (decode 3475 vs 2820 ms; the standalone kernel forces
    materialization boundaries where XLA fuses the apply pass into
    neighboring ops, and the kernel itself measured only ~180 GB/s —
    PERF.md round-2 session 2 post-mortem).
    """
    import os

    if (jax.default_backend() not in ("cpu",)
            and os.environ.get("TVI_PALLAS_GN")):
        from tvi.ops.pallas_groupnorm import (
            pallas_gn_eligible,
            pallas_group_norm_silu,
        )

        bs = pallas_gn_eligible(x.shape, num_groups)
        if bs:
            return pallas_group_norm_silu(x, scale, bias, num_groups,
                                          eps=eps, apply_silu=apply_silu,
                                          block_rows=bs)
    n = x.shape[0]
    c = x.shape[-1]
    cg = c // num_groups
    mean, var = group_norm_stats(x, num_groups)
    rstd = jax.lax.rsqrt(var + eps)                       # (N, G)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)                # (N, C)
    mean_c = jnp.repeat(mean, cg, axis=-1)
    sc = rstd_c * scale.astype(jnp.float32)[None]
    bi = bias.astype(jnp.float32)[None] - mean_c * sc
    shape = (n,) + (1,) * (x.ndim - 2) + (c,)
    y = x.astype(jnp.float32) * sc.reshape(shape) + bi.reshape(shape)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def group_norm_affine_params(x: jax.Array, scale: jax.Array, bias: jax.Array,
                             num_groups: int, eps: float = 1e-5):
    """Per-instance affine form of GroupNorm: returns fp32 (a, b) of shape
    (N, C) with  GN(x) == x * a + b  (a = rstd * gamma broadcast over the
    group, b = beta - mean * a).  Used to fold the GN APPLY pass into a
    Pallas consumer (the v5 spatial kernel's proj_in prologue) while the
    cheap stats reduction stays in XLA."""
    c = x.shape[-1]
    cg = c // num_groups
    mean, var = group_norm_stats(x, num_groups)
    rstd = jax.lax.rsqrt(var + eps)                      # (N, G)
    a = jnp.repeat(rstd, cg, axis=-1) * scale.astype(jnp.float32)[None]
    b = (bias.astype(jnp.float32)[None]
         - jnp.repeat(mean, cg, axis=-1) * a)
    return a, b
