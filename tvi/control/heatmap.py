"""Gaussian-heatmap rasterization of point trajectories — the ControlNet
conditioning video (reference src/models/utils.py:7-75; duplicated in
app_org.py:81-163).

The reference's per-frame/per-point Python+cv2 loop becomes a vectorized
numpy renderer (host-side — it feeds the input pipeline, not the hot loop):
a 200x200 sigma-40 circle-masked Gaussian template max-blitted at each
track point, resized to a (2*side)^2 box.  Template math is bit-equivalent
to ``gen_gaussian_heatmap`` (peak-normalized to uint8).
"""

from __future__ import annotations

import numpy as np

_TEMPLATE_SIZE = 200
_SIGMA = 40.0


def gaussian_heatmap_template(img_size: int = _TEMPLATE_SIZE) -> np.ndarray:
    """(img_size, img_size) uint8, exact reference math (utils.py:7-23)."""
    i = np.arange(img_size, dtype=np.float32)
    yy, xx = np.meshgrid(i, i, indexing="ij")
    g = (1 / (2 * np.pi * _SIGMA ** 2) *
         np.exp(-0.5 * (((yy - img_size / 2) ** 2 +
                         (xx - img_size / 2) ** 2) / _SIGMA ** 2)))
    circle = ((yy - img_size // 2) ** 2 + (xx - img_size // 2) ** 2
              <= (img_size // 2) ** 2).astype(np.float32)
    g = g * circle
    g = g / g.max()
    return (g * 255).astype(np.uint8)


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """cv2.resize(..., INTER_LINEAR) equivalent (half-pixel sampling)."""
    in_h, in_w = img.shape
    ys = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, in_w - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    img = img.astype(np.float32)
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def render_heatmap_video(
    tracks: np.ndarray,            # (F, N, 2) xy pixel coords
    width: int,
    height: int,
    side: int = 20,
    visibility: np.ndarray = None,  # (F, N) bool
) -> np.ndarray:
    """Returns (F, H, W, 3) float32 in [0,1] — the ControlNet conditioning
    video (reference ``generate_gassian_heatmap``, utils.py:45-75; grayscale
    replicated to 3 channels).  Out-of-bounds points are skipped; the blit
    clamps to the image like ``draw_heatmap`` (utils.py:27-42)."""
    template = gaussian_heatmap_template()
    num_frames, num_points = tracks.shape[:2]
    video = np.zeros((num_frames, height, width), np.float32)
    for f in range(num_frames):
        img = video[f]
        for p in range(num_points):
            px, py = float(tracks[f, p, 0]), float(tracks[f, p, 1])
            if px < 0 or py < 0 or px >= width or py >= height:
                continue
            if visibility is not None and not visibility[f, p]:
                continue
            x1 = max(int(px - side), 1)
            x2 = min(int(px + side), width - 1)
            y1 = max(int(py - side), 1)
            y2 = min(int(py + side), height - 1)
            if (x2 - x1) < 1 or (y2 - y1) < 1:
                continue
            patch = _resize_bilinear(template, y2 - y1, x2 - x1)
            # reference assigns (overwrites) the patch region (utils.py:39)
            img[y1:y2, x1:x2] = patch
    video = video.astype(np.uint8).astype(np.float32) / 255.0
    return np.repeat(video[..., None], 3, axis=-1)
