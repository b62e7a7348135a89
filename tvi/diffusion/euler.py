"""EulerDiscreteScheduler — SVD flavor (karras sigmas, continuous timesteps,
v-prediction EDM step).

Functional rebuild of the HF scheduler the reference loads at
src/train.py:246-250 and drives from the pipeline
(pipeline_stable_video_diffusion_efficient_interp.py:490,542-543,569):
  - ``set_timesteps``: Karras rho-7 ramp from sigma_max (700) to sigma_min
    (0.002), a trailing 0 sigma, timesteps t = 0.25*log(sigma)
  - ``scale_model_input``: x / sqrt(sigma^2 + 1)
  - ``step``: Euler ODE step with the v-prediction denoiser
        denoised = c_skip * x + c_out * model_output
  - ``init_noise_sigma``: sqrt(sigma_max^2 + 1) ('leading' spacing)

Designed for jit: the schedule is a static (n+1,) sigma table computed in
Python; ``step``/``scale_model_input`` take a traced step index so the whole
denoise loop compiles into one ``lax.fori_loop``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tvi.core.config import SchedulerConfig


def karras_sigmas(n: int, sigma_min: float, sigma_max: float, rho: float = 7.0) -> np.ndarray:
    ramp = np.linspace(0, 1, n)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho


@dataclass(frozen=True)
class EulerDiscreteScheduler:
    config: SchedulerConfig = SchedulerConfig()

    @property
    def init_noise_sigma(self) -> float:
        return float(np.sqrt(self.config.sigma_max ** 2 + 1.0))

    def set_timesteps(self, num_inference_steps: int):
        """Returns (sigmas, timesteps): sigmas has a trailing 0."""
        s = karras_sigmas(num_inference_steps, self.config.sigma_min,
                          self.config.sigma_max, self.config.rho)
        sigmas = jnp.asarray(np.concatenate([s, [0.0]]), dtype=jnp.float32)
        timesteps = 0.25 * jnp.log(jnp.asarray(s, dtype=jnp.float32))
        return sigmas, timesteps

    def scale_model_input(self, sample: jax.Array, sigma: jax.Array) -> jax.Array:
        return sample / jnp.sqrt(sigma ** 2 + 1.0).astype(sample.dtype)

    def step(self, model_output: jax.Array, sample: jax.Array,
             sigma: jax.Array, sigma_next: jax.Array) -> jax.Array:
        """One Euler step x_t -> x_{t-1} (v-prediction)."""
        sigma = sigma.astype(jnp.float32)
        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        denoised = x / (sigma ** 2 + 1.0) + out * (-sigma / jnp.sqrt(sigma ** 2 + 1.0))
        derivative = (x - denoised) / sigma
        prev = x + derivative * (sigma_next.astype(jnp.float32) - sigma)
        return prev.astype(sample.dtype)
