"""EDM training math: cosine-interpolated sigma sampling, preconditioning,
loss weighting.

Faithful functional port of the reference's k-diffusion-derived helpers
(src/train.py:131-170 ``stratified_uniform`` / ``rand_cosine_interpolated``)
and the in-loop EDM terms (src/train.py:592-607):
    c_out  = -sigma / sqrt(sigma^2 + 1)
    c_skip = 1 / (sigma^2 + 1)
    denoised = model_pred * c_out + c_skip * noisy
    weight = (1 + sigma^2) / sigma^2
    timestep = 0.25 * log(sigma)          (src/train.py:530)
Constants (src/train.py:49-54): min 0.002, max 700, image_d 64,
noise_d_low 32, noise_d_high 64, sigma_data 0.5.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class EDMConstants(NamedTuple):
    min_value: float = 0.002
    max_value: float = 700.0
    image_d: float = 64.0
    noise_d_low: float = 32.0
    noise_d_high: float = 64.0
    sigma_data: float = 0.5


def stratified_uniform(rng: jax.Array, shape) -> jax.Array:
    """Stratified U(0,1) samples along the last axis (train.py:131-141)."""
    n = shape[-1]
    offsets = jnp.arange(n, dtype=jnp.float32)
    u = jax.random.uniform(rng, shape, dtype=jnp.float32)
    return (offsets + u) / n


def sigma_from_u(u: jax.Array, c: EDMConstants = EDMConstants()) -> jax.Array:
    """Deterministic u in [0,1) -> sigma transform of the interpolated
    cosine logSNR schedule (train.py:144-170), factored out so tests can
    anchor it point-for-point against the reference torch code."""

    def logsnr_schedule_cosine(t, logsnr_min, logsnr_max):
        t_min = math.atan(math.exp(-0.5 * logsnr_max))
        t_max = math.atan(math.exp(-0.5 * logsnr_min))
        return -2.0 * jnp.log(jnp.tan(t_min + t * (t_max - t_min)))

    def shifted(t, noise_d, logsnr_min, logsnr_max):
        shift = 2.0 * math.log(noise_d / c.image_d)
        return logsnr_schedule_cosine(t, logsnr_min - shift, logsnr_max - shift) + shift

    logsnr_min = -2.0 * math.log(c.min_value / c.sigma_data)
    logsnr_max = -2.0 * math.log(c.max_value / c.sigma_data)
    logsnr_low = shifted(u, c.noise_d_low, logsnr_min, logsnr_max)
    logsnr_high = shifted(u, c.noise_d_high, logsnr_min, logsnr_max)
    logsnr = logsnr_low + u * (logsnr_high - logsnr_low)  # torch.lerp
    return jnp.exp(-logsnr / 2.0) * c.sigma_data


def rand_cosine_interpolated(rng: jax.Array, shape, c: EDMConstants = EDMConstants()) -> jax.Array:
    """Sigma samples from the interpolated cosine logSNR schedule
    (simple-diffusion; train.py:144-170)."""
    return sigma_from_u(stratified_uniform(rng, shape), c)


def sigma_to_timestep(sigma: jax.Array) -> jax.Array:
    """Continuous EDM timestep t = 0.25 * log(sigma) (train.py:530)."""
    return 0.25 * jnp.log(sigma)


def edm_preconditioning(sigma: jax.Array):
    """Returns (c_in, c_skip, c_out): model input scaling and denoiser
    combination (train.py:531,598-601)."""
    c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
    c_skip = 1.0 / (sigma ** 2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma ** 2 + 1.0)
    return c_in, c_skip, c_out


def edm_loss_weight(sigma: jax.Array) -> jax.Array:
    """EDM MSE weight (1 + sigma^2) / sigma^2 (train.py:602)."""
    return (1.0 + sigma ** 2) * sigma ** -2.0
