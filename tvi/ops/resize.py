"""Antialiased resize, reproducing the reference's CLIP-input path.

Reference: ``_resize_with_antialiasing`` + ``_gaussian_blur2d`` + ``_filter2d``
(pipeline_stable_video_diffusion_efficient_interp.py:48-152): a separable
Gaussian blur with skimage-style sigma = max((factor-1)/2, 0.001), kernel
size = int(max(4*sigma, 3)) rounded up to odd, reflect padding, followed by
bicubic interpolation with ``align_corners=True``.  CLIP-input parity gates
SSIM (SURVEY §7.3.1), so the sigma/kernel math is reproduced exactly.

Layout: NHWC (TPU-native).  All ops jit-compile to fused XLA convs.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(window_size: int, sigma: float) -> jnp.ndarray:
    """Normalized 1-D Gaussian (reference `_gaussian`, pipeline:185-198)."""
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    if window_size % 2 == 0:
        x = x + 0.5
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


def _reflect_pad_hw(x: jax.Array, pad_h: Tuple[int, int], pad_w: Tuple[int, int]) -> jax.Array:
    return jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)), mode="reflect")


def _sep_filter(x: jax.Array, ky: jnp.ndarray, kx: jnp.ndarray) -> jax.Array:
    """Separable depthwise filter, NHWC, reflect-padded like the reference's
    `_filter2d` (pipeline:141-179: x-pass then y-pass)."""
    c = x.shape[-1]

    def conv1d(inp, kernel, axis):
        ksize = kernel.shape[0]
        pad_front = (ksize - 1) // 2
        pad_rear = (ksize - 1) - pad_front
        if axis == 1:  # H
            inp = _reflect_pad_hw(inp, (pad_front, pad_rear), (0, 0))
            rhs = kernel.reshape(ksize, 1, 1, 1)
        else:  # W
            inp = _reflect_pad_hw(inp, (0, 0), (pad_front, pad_rear))
            rhs = kernel.reshape(1, ksize, 1, 1)
        rhs = jnp.broadcast_to(rhs, rhs.shape[:2] + (1, c)).astype(inp.dtype)
        return jax.lax.conv_general_dilated(
            inp, rhs, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    x = conv1d(x, kx.astype(x.dtype), axis=2)
    x = conv1d(x, ky.astype(x.dtype), axis=1)
    return x


def _cubic_weight(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Keys cubic kernel with a=-0.75 (torch bicubic)."""
    at = jnp.abs(t)
    at2, at3 = at ** 2, at ** 3
    w1 = (a + 2) * at3 - (a + 3) * at2 + 1
    w2 = a * at3 - 5 * a * at2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))


def _interp_axis_matrix(in_size: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    """Dense (out, in) bicubic interpolation matrix — small, computed once at
    trace time; the resize becomes two MXU matmuls."""
    if align_corners and out_size > 1:
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    i0 = jnp.floor(src).astype(jnp.int32)
    frac = src - i0
    # 4 taps at offsets -1..2
    cols = jnp.arange(in_size)
    mat = jnp.zeros((out_size, in_size), dtype=jnp.float32)
    for off in range(-1, 3):
        idx = jnp.clip(i0 + off, 0, in_size - 1)
        w = _cubic_weight(frac - off)
        mat = mat + w[:, None] * (cols[None, :] == idx[:, None]).astype(jnp.float32)
    return mat


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "align_corners"))
def bicubic_resize(x: jax.Array, out_h: int, out_w: int, align_corners: bool = True) -> jax.Array:
    """Bicubic resize, NHWC, matching torch F.interpolate(mode='bicubic')."""
    _, h, w, _ = x.shape
    mh = _interp_axis_matrix(h, out_h, align_corners).astype(x.dtype)
    mw = _interp_axis_matrix(w, out_w, align_corners).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("ow,bhwc->bhoc", mw, x, preferred_element_type=jnp.float32)
    return x.astype(mh.dtype)


def resize_with_antialiasing(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Gaussian blur + bicubic(align_corners=True), exactly mirroring
    pipeline:48-83.  x: NHWC in [-1, 1]; size: (H, W)."""
    h, w = x.shape[1], x.shape[2]
    factors = (h / size[0], w / size[1])
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = int(max(2.0 * 2 * sigmas[0], 3)), int(max(2.0 * 2 * sigmas[1], 3))
    ks = (ks[0] + 1 if ks[0] % 2 == 0 else ks[0], ks[1] + 1 if ks[1] % 2 == 0 else ks[1])
    ky = _gaussian_kernel1d(ks[0], sigmas[0])
    kx = _gaussian_kernel1d(ks[1], sigmas[1])
    x = _sep_filter(x, ky, kx)
    return bicubic_resize(x, size[0], size[1], align_corners=True)
