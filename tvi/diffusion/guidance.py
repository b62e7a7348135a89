"""Per-frame classifier-free guidance scales.

Reference pipeline:523-532: guidance = linspace(min, max, F); with
``middle_max_guidance`` the ramp is mirrored (low at both endpoints, max in
the middle) via cat+flip and linear re-interpolation to F samples.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def frame_guidance_scale(num_frames: int, min_scale: float, max_scale: float,
                         middle_max: bool = False) -> jnp.ndarray:
    g = np.linspace(min_scale, max_scale, num_frames, dtype=np.float32)
    if middle_max:
        # torch: cat([g, flip(g)]) then F.interpolate(size=F, mode='linear',
        # align_corners=False) — exact half-pixel resampling of the 2F ramp.
        g2 = np.concatenate([g, g[::-1]])
        src = (np.arange(num_frames) + 0.5) * (len(g2) / num_frames) - 0.5
        i0 = np.clip(np.floor(src).astype(int), 0, len(g2) - 1)
        i1 = np.clip(i0 + 1, 0, len(g2) - 1)
        frac = np.clip(src - i0, 0.0, 1.0)
        g = (1 - frac) * g2[i0] + frac * g2[i1]
    return jnp.asarray(g, dtype=jnp.float32)
