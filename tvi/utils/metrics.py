"""Quality metrics: SSIM + PSNR (jitted) and a frame-folder comparison CLI.

The rebuild's fidelity gate is >=0.99 SSIM vs reference output frames
(BASELINE.md).  ``ssim`` follows Wang et al. 2004 with the standard
11x11 Gaussian window (sigma 1.5), K1=0.01, K2=0.03 — matching
skimage.metrics.structural_similarity(gaussian_weights=True,
use_sample_covariance=False) on [0,1] images.

    python -m tvi.utils.metrics dirA dirB        # compare frame folders
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filter_sep(img: jax.Array, win: jnp.ndarray) -> jax.Array:
    """Valid-mode separable filter, NHWC."""
    c = img.shape[-1]
    k = win.shape[0]

    def conv(x, axis):
        rhs = win.reshape((k, 1, 1, 1) if axis == 1 else (1, k, 1, 1))
        rhs = jnp.broadcast_to(rhs, rhs.shape[:2] + (1, c)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, rhs, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    return conv(conv(img, 1), 2)


@functools.partial(jax.jit, static_argnames=("win_size",))
def ssim(a: jax.Array, b: jax.Array, win_size: int = 11) -> jax.Array:
    """a, b: (N, H, W, C) in [0, 1].  Returns scalar mean SSIM."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    win = _gaussian_window(win_size)
    mu_a = _filter_sep(a, win)
    mu_b = _filter_sep(b, win)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = _filter_sep(a * a, win) - mu_aa
    s_bb = _filter_sep(b * b, win) - mu_bb
    s_ab = _filter_sep(a * b, win) - mu_ab
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return (num / den).mean()


@jax.jit
def psnr(a: jax.Array, b: jax.Array) -> jax.Array:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def compare_frame_dirs(dir_a: str, dir_b: str) -> dict:
    import os

    import PIL.Image

    import re

    def numkey(name):
        # numeric-aware ordering: '2.png' < '10.png', 'frame_2' < 'frame_10'
        return [int(t) if t.isdigit() else t
                for t in re.split(r"(\d+)", name)]

    def load(d):
        files = sorted((f for f in os.listdir(d)
                        if f.lower().endswith((".png", ".jpg"))), key=numkey)
        return np.stack([np.asarray(PIL.Image.open(os.path.join(d, f))
                                    .convert("RGB"), dtype=np.float32) / 255.0
                         for f in files]), files

    a, files_a = load(dir_a)
    b, files_b = load(dir_b)
    n = min(len(a), len(b))
    if len(a) != len(b):
        print(f"[metrics] frame count mismatch: {len(a)} vs {len(b)}; "
              f"comparing first {n}", file=sys.stderr)
    return {
        "frames": n,
        "ssim": float(ssim(jnp.asarray(a[:n]), jnp.asarray(b[:n]))),
        "psnr": float(psnr(jnp.asarray(a[:n]), jnp.asarray(b[:n]))),
    }


def main(argv=None):
    import json

    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        raise SystemExit("usage: python -m tvi.utils.metrics <frames_dir_a> <frames_dir_b>")
    print(json.dumps(compare_frame_dirs(argv[0], argv[1])))


if __name__ == "__main__":
    main()
