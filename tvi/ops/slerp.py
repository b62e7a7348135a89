"""Spherical linear interpolation between latents.

Reconstructs the 0-byte ``frame_slerp_interp.py`` per the driver spec
(BASELINE.json config 1): VAE-encode 2 keyframes, SLERP 8 intermediate
latents, decode at 256x256.  Standard latent-slerp formulation: flatten,
measure the angle between the two latent vectors, interpolate along the
great circle, falling back to lerp when the vectors are nearly parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DOT_THRESHOLD = 0.9995


def slerp(t, v0: jax.Array, v1: jax.Array) -> jax.Array:
    """Spherical interpolation of v0 -> v1 at fraction(s) t.

    t: scalar or (T,) array in [0,1].  v0/v1: arbitrary equal shapes.
    Returns shape t.shape + v0.shape (leading T axis iff t is an array).
    """
    t = jnp.asarray(t, dtype=jnp.float32)
    scalar_t = t.ndim == 0
    t = jnp.atleast_1d(t)

    f0 = v0.astype(jnp.float32).reshape(-1)
    f1 = v1.astype(jnp.float32).reshape(-1)
    n0 = f0 / jnp.linalg.norm(f0)
    n1 = f1 / jnp.linalg.norm(f1)
    dot = jnp.clip(jnp.sum(n0 * n1), -1.0, 1.0)

    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    tt = t.reshape(-1, 1)
    # slerp weights, guarded against sin(theta) ~ 0
    safe_sin = jnp.where(jnp.abs(sin_theta) < 1e-6, 1.0, sin_theta)
    w0_s = jnp.sin((1.0 - tt) * theta) / safe_sin
    w1_s = jnp.sin(tt * theta) / safe_sin
    use_lerp = jnp.abs(dot) > _DOT_THRESHOLD
    w0 = jnp.where(use_lerp, 1.0 - tt, w0_s)
    w1 = jnp.where(use_lerp, tt, w1_s)

    out = w0 * f0[None, :] + w1 * f1[None, :]
    out = out.reshape((t.shape[0],) + v0.shape).astype(v0.dtype)
    return out[0] if scalar_t else out
