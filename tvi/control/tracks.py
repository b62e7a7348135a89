"""Point-track utilities: PCHIP trajectory interpolation and diffusion-
feature point tracking.

- ``interpolate_trajectory``: reference sift_match.py:166-199 — monotone
  cubic (PCHIP) interpolation of sparse track points to ``num_frames``.
- ``point_tracking``: reference sift_match.py:203-239 — nearest-neighbor
  search of a source feature vector in a (2*track_dist+1)^2 neighborhood of
  the current estimate, used by ``sift_track_update`` during denoising.
  Implemented in JAX (jit + vmap over points) since it consumes on-device
  UNet intermediate features.
- ``load_track_file``: src/test.py:552-582 — parse track.txt (2 or 4 lines
  of 'x,y') into PCHIP-interpolated (F, N, 2) tracks.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.interpolate import PchipInterpolator


def interpolate_trajectory(points: np.ndarray, num_frames: int,
                           t: Optional[np.ndarray] = None) -> np.ndarray:
    """points: (f, n, 2) sparse track (f >= 2) -> (num_frames, n, 2)."""
    points = np.asarray(points, dtype=np.float64)
    f, n = points.shape[:2]
    if t is None:
        t = np.linspace(0, 1, f)
    new_t = np.linspace(0, 1, num_frames)
    out = np.empty((num_frames, n, 2), np.float32)
    for i in range(n):
        out[:, i, 0] = PchipInterpolator(t, points[:, i, 0])(new_t)
        out[:, i, 1] = PchipInterpolator(t, points[:, i, 1])(new_t)
    return out


def load_track_file(path: str, width: int, height: int, num_frames: int,
                    orig_width: Optional[int] = None,
                    orig_height: Optional[int] = None) -> np.ndarray:
    """Parse test.py-style track.txt: lines 'x,y'; lines (0,1) are the first
    track's start/end, lines (2,3) a second track (src/test.py:552-582).
    Coordinates are rescaled to (width, height) and PCHIP-interpolated.
    Returns (num_frames, n_tracks, 2)."""
    lines = [l.strip() for l in open(path) if l.strip()]
    pts = [tuple(float(v.strip()) for v in l.split(",")) for l in lines]
    pairs = [pts[i:i + 2] for i in range(0, len(pts) - 1, 2)]
    ow = orig_width or width
    oh = orig_height or height
    tracks = []
    for (sx, sy), (ex, ey) in pairs:
        sx, ex = sx * width / ow, ex * width / ow
        sy, ey = sy * height / oh, ey * height / oh
        if (sx, sy) == (ex, ey):  # stationary point convention (test.py:576)
            ex, ey = sx + 1, sy + 1
        tracks.append([[sx, sy], [ex, ey]])
    sparse = np.asarray(tracks, np.float32).transpose(1, 0, 2)  # (2, n, 2)
    return interpolate_trajectory(sparse, num_frames)


@functools.partial(jax.jit, static_argnames=("track_dist",))
def point_tracking(
    f0: jax.Array,               # (C, H, W) reference features
    f1: jax.Array,               # (C, H, W) current features
    handle_points: jax.Array,    # (N, 2) xy current estimates
    handle_points_init: jax.Array,  # (N, 2) xy initial points
    track_dist: int = 5,
) -> jax.Array:
    """L1 nearest-neighbor feature tracking (sift_match.py:203-239).
    Coordinates are (x, y); features are indexed [C, y, x] like the
    reference after its row/col swap."""
    c, max_r, max_c = f0.shape
    win = 2 * track_dist + 1

    def track_one(pi, pi0):
        y0 = jnp.clip(pi0[1].astype(jnp.int32), 0, max_r - 1)
        x0 = jnp.clip(pi0[0].astype(jnp.int32), 0, max_c - 1)
        src = f0[:, y0, x0]                                   # (C,)
        r1 = jnp.clip(pi[1].astype(jnp.int32) - track_dist, 0, max_r - win)
        c1 = jnp.clip(pi[0].astype(jnp.int32) - track_dist, 0, max_c - win)
        neigh = jax.lax.dynamic_slice(f1, (0, r1, c1), (c, win, win))
        dist = jnp.abs(src[:, None, None] - neigh).sum(axis=0)  # (win, win)
        flat = jnp.argmin(dist)
        row, col = flat // win, flat % win
        return jnp.stack([(c1 + col).astype(jnp.float32),
                          (r1 + row).astype(jnp.float32)])

    return jax.vmap(track_one)(handle_points, handle_points_init)
