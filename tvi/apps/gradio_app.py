"""Interactive drag-to-interpolate app — parity with src/app_org.py.

``Drag`` (reference app_org.py:301-496) is fully usable headless: two
images + optional user trajectories (or the SIFT autopilot,
app_org.py:389-414) -> PCHIP tracks -> heatmap video -> pipeline ->
side-by-side GIF + MP4 + point_tracks .npy (app_org.py:487-494; verified
output shape (F, N, 2) float16).

``main`` launches the Gradio UI when the ``gradio`` package is available
(click-to-add track points, sliders for controlnet scale and motion bucket,
app_org.py:660-783); otherwise it explains how to use the headless API.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import numpy as np

from tvi.core.config import PipelineConfig
from tvi.control.heatmap import render_heatmap_video
from tvi.control.sift import sift_match
from tvi.control.tracks import interpolate_trajectory
from tvi.utils.images import save_gif, save_mp4


@dataclass
class Drag:
    """Loads models once, then interpolates per request (app_org.py:301)."""

    height: int = 320
    width: int = 512
    num_frames: int = 14
    tiny: bool = False
    model_dir: Optional[str] = None
    seed: int = 42
    pipe: object = field(default=None, repr=False)

    def __post_init__(self):
        from tvi.pipelines.factory import build_pipeline, build_tiny_pipeline

        rng = jax.random.PRNGKey(self.seed)
        if self.pipe is None:
            if self.tiny:
                self.pipe = build_tiny_pipeline(rng, with_controlnet=True)
            else:
                params = None
                if self.model_dir:
                    from tvi.io.orbax_ckpt import load_pipeline_params

                    params = load_pipeline_params(self.model_dir)
                self.pipe = build_pipeline(rng, with_controlnet=True, params=params)

    def get_tracks(self, first_u8: np.ndarray, end_u8: np.ndarray,
                   user_tracks: Optional[List[List[List[float]]]] = None,
                   sift_topk: int = 5, sift_method: str = "max_dist"):
        """user_tracks: list of polylines [[x,y], ...]; SIFT autopilot when
        None/empty (app_org.py:382-429).  Returns (F, N, 2) or None."""
        if user_tracks:
            sparse = []
            for line in user_tracks:
                if len(line) == 1:  # stationary point convention
                    line = [line[0], [line[0][0] + 1, line[0][1] + 1]]
                sparse.append(interpolate_trajectory(
                    np.asarray(line, np.float32)[:, None, :], self.num_frames)[:, 0])
            return np.stack(sparse, axis=1)
        pts = sift_match(first_u8, end_u8, topk=sift_topk, method=sift_method)
        if pts is None:
            return None
        return interpolate_trajectory(pts, self.num_frames)

    def run(self, first_u8: np.ndarray, end_u8: np.ndarray,
            user_tracks=None, controlnet_cond_scale: float = 1.0,
            motion_bucket_id: int = 100, steps: int = 30,
            output_dir: str = "outputs", seed: int = 42):
        """Returns (frames_u8 (F,H,W,3), tracks or None, output paths)."""
        os.makedirs(output_dir, exist_ok=True)
        tracks = self.get_tracks(first_u8, end_u8, user_tracks)
        cn_cond = None
        heat = None
        if tracks is not None:
            ch, cw = self.pipe.controlnet_cond_size(self.height, self.width)
            scaled = tracks * np.asarray([cw / self.width, ch / self.height],
                                         np.float32)
            heat = render_heatmap_video(scaled, cw, ch)
            cn_cond = heat[None]

        cfg = PipelineConfig(
            height=self.height, width=self.width, num_frames=self.num_frames,
            num_inference_steps=steps, motion_bucket_id=motion_bucket_id,
            with_control=cn_cond is not None,
            controlnet_cond_scale=controlnet_cond_scale)
        img0 = first_u8[None].astype(np.float32) / 255.0
        img1 = end_u8[None].astype(np.float32) / 255.0
        frames = self.pipe(img0, img1, jax.random.PRNGKey(seed), cfg,
                           controlnet_cond=cn_cond)[0]

        ts = int(time.time())
        paths = {}
        # side-by-side heatmap|generation gif + mp4 + tracks npy
        # (app_org.py:166-272,487-494)
        if heat is None:
            vis = frames
        else:
            heat_u8 = (heat * 255).astype(np.uint8)
            if heat_u8.shape[1:3] != frames.shape[1:3]:
                import PIL.Image as _I
                heat_u8 = np.stack([
                    np.asarray(_I.fromarray(h).resize(
                        (frames.shape[2], frames.shape[1]))) for h in heat_u8])
            vis = np.concatenate([heat_u8, frames], axis=2)
        paths["gif"] = os.path.join(output_dir, f"temp_0_{ts}.gif")
        save_gif(vis, paths["gif"])
        paths["mp4"] = os.path.join(output_dir, f"temp_0_{ts}.mp4")
        save_mp4(vis, paths["mp4"])
        if tracks is not None:
            paths["npy"] = os.path.join(output_dir, f"temp_0_{ts}.npy")
            np.save(paths["npy"], tracks[:, :1, :].astype(np.float16))
        frame_dir = os.path.join(output_dir, f"temp_0_{ts}_frames")
        os.makedirs(frame_dir, exist_ok=True)
        try:
            import PIL.Image

            for i, f in enumerate(frames):
                PIL.Image.fromarray(f).save(os.path.join(frame_dir, f"{i:02d}.png"))
        except Exception:
            pass
        return frames, tracks, paths


def build_demo(drag: Drag):
    """Gradio Blocks UI (app_org.py:660-783), only when gradio exists."""
    import gradio as gr

    state_tracks = gr.State([])

    with gr.Blocks() as demo:
        gr.Markdown("## Framer-TPU: interactive two-frame interpolation")
        with gr.Row():
            first_img = gr.Image(label="first frame")
            end_img = gr.Image(label="end frame")
            out_gif = gr.Image(label="result")
        with gr.Row():
            cond_scale = gr.Slider(0.0, 2.0, value=1.0, label="controlnet scale")
            motion = gr.Slider(1, 255, value=100, step=1, label="motion bucket id")
            run_btn = gr.Button("Run")

        def _run(first, end, scale, bucket, tracks):
            frames, _, paths = drag.run(
                np.asarray(first, np.uint8), np.asarray(end, np.uint8),
                user_tracks=tracks or None, controlnet_cond_scale=scale,
                motion_bucket_id=int(bucket))
            return paths["gif"]

        def _add_point(tracks, evt: "gr.SelectData"):
            tracks = list(tracks or [])
            if not tracks or len(tracks[-1]) >= 2:
                tracks.append([])
            tracks[-1].append([evt.index[0], evt.index[1]])
            return tracks

        first_img.select(_add_point, [state_tracks], [state_tracks])
        run_btn.click(_run, [first_img, end_img, cond_scale, motion, state_tracks],
                      [out_gif])
    return demo


def main():
    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this image; use the headless API:\n"
            "  from tvi.apps.gradio_app import Drag\n"
            "  Drag(tiny=True).run(first_u8, end_u8)")
    drag = Drag()
    build_demo(drag).launch(server_name="0.0.0.0", server_port=7860)


if __name__ == "__main__":
    main()
