"""Host-side image helpers: PIL <-> NHWC arrays, VAE-range preprocessing,
frame postprocessing (the VaeImageProcessor surface the reference uses at
pipeline:456-462 and ``tensor2vid``/postprocess at pipeline:32-44)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

try:  # PIL is present in the image; degrade gracefully if not
    import PIL.Image

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False


def pil_to_array(image, height: int = None, width: int = None) -> np.ndarray:
    """PIL -> (1, H, W, 3) float32 in [0, 1], optional resize (the
    VaeImageProcessor.preprocess resize step)."""
    if height is not None and width is not None and image.size != (width, height):
        image = image.resize((width, height), PIL.Image.LANCZOS)
    arr = np.asarray(image.convert("RGB"), dtype=np.float32) / 255.0
    return arr[None]


def to_vae_range(pixels01: np.ndarray) -> np.ndarray:
    """[0,1] -> [-1,1] (VaeImageProcessor.normalize)."""
    return pixels01 * 2.0 - 1.0


def postprocess_frames(frames: np.ndarray) -> np.ndarray:
    """Decoded frames (F, H, W, 3) in [-1,1] -> uint8 (F, H, W, 3)
    (VaeImageProcessor.postprocess: (x/2+0.5).clamp(0,1))."""
    x = np.clip(np.asarray(frames, dtype=np.float32) / 2.0 + 0.5, 0.0, 1.0)
    return (x * 255.0).round().astype(np.uint8)


def frames_to_pil(frames_uint8: np.ndarray) -> List["PIL.Image.Image"]:
    return [PIL.Image.fromarray(f) for f in frames_uint8]


def save_gif(frames_uint8: np.ndarray, path: str, duration_ms: int = 100):
    """Save frames as GIF (reference test.py:622-623 uses duration=100)."""
    pil = frames_to_pil(frames_uint8)
    pil[0].save(path, save_all=True, append_images=pil[1:], loop=0,
                duration=duration_ms)


def save_mp4(frames_uint8: np.ndarray, path: str, fps: int = 7) -> str:
    """Save frames as MP4 via imageio/ffmpeg when available; falls back to
    an animated GIF at '<path>.gif' otherwise (ffmpeg is not in this image;
    app_org.py writes both formats, :487-494).  Returns the path actually
    written."""
    try:
        import imageio.v2 as imageio

        writer = imageio.get_writer(path, fps=fps)
        for f in frames_uint8:
            writer.append_data(f)
        writer.close()
        return path
    except Exception:
        fallback = path + ".gif"
        save_gif(frames_uint8, fallback, duration_ms=int(1000 / fps))
        return fallback
