"""Interactive drag-to-interpolate app — parity with src/app_org.py.

``Drag`` (reference app_org.py:301-496) is fully usable headless: two
images + optional user trajectories (or the SIFT autopilot,
app_org.py:389-414) -> PCHIP tracks -> heatmap video -> pipeline ->
outputs matching save_gifs_side_by_side (app_org.py:166-272):
temp_0_<ts>.{gif,mp4,npy} + frame dir = the JET-colormapped heatmap
visualization video, temp_1_<ts>.* = the generation, vis_gif.gif = the
side-by-side combination.

The UI reproduces the reference's feature set (app_org.py:660-783):
upload start/end image (resized to 512x320, app_org.py:507-530),
click-to-add trajectory points with red polyline+arrowhead overlays drawn
onto BOTH images (add_tracking_points, :603-646), "Add New Drag
Trajectory", "Delete last drag" / "Delete last step" (:544-600), "Reset",
Control Scale (0-10) and Motion Bucket (1-180) sliders, and the usage
instruction block (:668-680).  All handlers are pure functions over plain
list state so they are testable headless (gradio is not installed in this
image).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import numpy as np

from tvi.core.config import PipelineConfig
from tvi.control.heatmap import render_heatmap_video
from tvi.control.sift import sift_match
from tvi.control.tracks import interpolate_trajectory
from tvi.utils.images import save_gif, save_mp4

USAGE_MD = """## Usage: <br>
1. Upload images<br>
&ensp;  1.1  Upload the start image via the "Upload Start Image" button.<br>
&ensp;  1.2. Upload the end image via the "Upload End Image" button.<br>
2. (Optional) Draw some drags.<br>
&ensp;  2.1. Click "Add Drag Trajectory" to add the motion trajectory.<br>
&ensp;  2.2. You can click several points on either start or end image to forms a path.<br>
&ensp;  2.3. Click "Delete last drag" to delete the whole lastest path.<br>
&ensp;  2.4. Click "Delete last step" to delete the lastest clicked control point.<br>
3. Interpolate the images (according the path) with a click on "Run" button. <br>"""


# ------------------------------------------------------- overlay rendering

def draw_trajectory_overlay(image_u8: np.ndarray,
                            tracks: List[List[List[int]]]) -> np.ndarray:
    """Draw the clicked trajectories onto an image: red polyline per drag
    with an arrowhead on the final segment, a filled circle for a
    single-point drag (reference add_tracking_points/delete_* handlers,
    app_org.py:544-646, drawn on an RGBA layer then alpha-composited)."""
    import cv2

    h, w = image_u8.shape[:2]
    layer = np.zeros((h, w, 4), np.float64)
    for track in tracks:
        if not track:
            continue
        pts = [(int(p[0]), int(p[1])) for p in track]
        if len(pts) == 1:
            cv2.circle(layer, pts[0], 5, (255, 0, 0, 255), -1)
            continue
        for i in range(len(pts) - 1):
            vx = pts[i + 1][0] - pts[i][0]
            vy = pts[i + 1][1] - pts[i][1]
            arrow_length = max(float(np.hypot(vx, vy)), 1e-6)
            if i == len(pts) - 2:
                cv2.arrowedLine(layer, pts[i], pts[i + 1], (255, 0, 0, 255),
                                2, tipLength=8 / arrow_length)
            else:
                cv2.line(layer, pts[i], pts[i + 1], (255, 0, 0, 255), 2)
    alpha = (layer[..., 3:] / 255.0) * 0.99  # alpha_coef, app_org.py:639
    rgb = layer[..., :3]
    out = image_u8.astype(np.float64) * (1 - alpha) + rgb * alpha
    return out.astype(np.uint8)


def heatmap_vis_video(tracks: np.ndarray, width: int, height: int) -> np.ndarray:
    """JET-colormapped Gaussian-heatmap video, the temp_0 visualization
    (reference get_vis_image + the colormap at app_org.py:478-480)."""
    import cv2

    gray = (render_heatmap_video(tracks, width, height)[..., 0] * 255
            ).astype(np.uint8)
    frames = [cv2.cvtColor(cv2.applyColorMap(g, cv2.COLORMAP_JET),
                           cv2.COLOR_BGR2RGB) for g in gray]
    return np.stack(frames)


# ------------------------------------------------------------ UI handlers
# Plain-list state (modern gradio passes values, and tests can drive these
# headless).  Each returns (state, start_overlay, end_overlay).

def add_drag(tracks: list) -> list:
    tracks = [list(t) for t in (tracks or [])]
    tracks.append([])
    return tracks


def add_tracking_point(tracks: list, xy: Tuple[int, int],
                       first_u8: np.ndarray, end_u8: np.ndarray):
    tracks = [list(t) for t in (tracks or [])]
    if not tracks:
        tracks.append([])
    tracks[-1].append([int(xy[0]), int(xy[1])])
    return (tracks, draw_trajectory_overlay(first_u8, tracks),
            draw_trajectory_overlay(end_u8, tracks))


def delete_last_drag(tracks: list, first_u8: np.ndarray, end_u8: np.ndarray):
    tracks = [list(t) for t in (tracks or [])]
    if tracks:
        tracks.pop()
    return (tracks, draw_trajectory_overlay(first_u8, tracks),
            draw_trajectory_overlay(end_u8, tracks))


def delete_last_step(tracks: list, first_u8: np.ndarray, end_u8: np.ndarray):
    tracks = [list(t) for t in (tracks or [])]
    if tracks and tracks[-1]:
        tracks[-1].pop()
    return (tracks, draw_trajectory_overlay(first_u8, tracks),
            draw_trajectory_overlay(end_u8, tracks))


def preprocess_upload(path: str, width: int = 512, height: int = 320,
                      output_dir: Optional[str] = None,
                      prefix: str = "first_frame") -> Tuple[np.ndarray, str]:
    """Resize an uploaded image to the working geometry (bilinear, reference
    preprocess_image app_org.py:507-519) and persist it; returns (u8 array,
    saved path)."""
    import uuid

    import PIL.Image

    img = PIL.Image.open(path).convert("RGB").resize(
        (width, height), PIL.Image.BILINEAR)
    saved = ""
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        saved = os.path.join(output_dir, f"{prefix}_{str(uuid.uuid4())[:4]}.png")
        img.save(saved)
    return np.asarray(img, np.uint8), saved


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
                   sift_topk: int = 5, sift_method: str = "random"):
        """user_tracks: list of polylines [[x,y], ...]; SIFT autopilot when
        None/empty (app_org.py:382-429).  Returns ((F, N, 2) or None,
        sift_track_update flag, anchor flags or None)."""
        user_tracks = [t for t in (user_tracks or []) if t]
        if user_tracks:
            sparse = []
            for line in user_tracks:
                if len(line) == 1:  # stationary point convention (:424)
                    line = [line[0], [line[0][0] + 1, line[0][1] + 1]]
                sparse.append(interpolate_trajectory(
                    np.asarray(line, np.float32)[:, None, :], self.num_frames)[:, 0])
            return np.stack(sparse, axis=1), False, None
        pts = sift_match(first_u8, end_u8, thr=0.5, topk=sift_topk,
                         method=sift_method)
        if pts is None:
            return None, False, None
        tracks = interpolate_trajectory(pts, self.num_frames)
        anchors = np.zeros(tracks.shape[1], bool)  # all free; frames 0/F-1
        return tracks, True, anchors               # anchored via flags (:409-412)

    def run(self, first_u8: np.ndarray, end_u8: np.ndarray,
            user_tracks=None, controlnet_cond_scale: float = 1.0,
            motion_bucket_id: int = 100, steps: int = 30,
            output_dir: str = "outputs", seed: int = 42):
        """Returns (frames_u8 (F,H,W,3), tracks or None, output paths)."""
        os.makedirs(output_dir, exist_ok=True)
        tracks, sift_update, anchors = self.get_tracks(first_u8, end_u8, user_tracks)
        if sift_update:
            controlnet_cond_scale = 0.5  # SIFT autopilot default (:393)
        cn_cond = None
        heat_vis = None
        if tracks is not None:
            ch, cw = self.pipe.controlnet_cond_size(self.height, self.width)
            scaled = tracks * np.asarray([cw / self.width, ch / self.height],
                                         np.float32)
            cn_cond = render_heatmap_video(scaled, cw, ch)[None]
            heat_vis = heatmap_vis_video(tracks, self.width, self.height)

        cfg = PipelineConfig(
            height=self.height, width=self.width, num_frames=self.num_frames,
            num_inference_steps=steps, motion_bucket_id=motion_bucket_id,
            with_control=cn_cond is not None,
            controlnet_cond_scale=controlnet_cond_scale)
        img0 = first_u8[None].astype(np.float32) / 255.0
        img1 = end_u8[None].astype(np.float32) / 255.0
        frames = self.pipe(img0, img1, jax.random.PRNGKey(seed), cfg,
                           controlnet_cond=cn_cond)[0]

        # outputs mirror save_gifs_side_by_side (app_org.py:166-272):
        # temp_0 = heatmap visualization, temp_1 = generation, each with
        # .gif/.mp4/.npy + a frame dir; vis_gif.gif = side-by-side combo
        ts = time.strftime("%Y%m%d-%H%M%S")
        paths = {}
        videos = [("temp_0", heat_vis if heat_vis is not None
                   else np.zeros_like(frames)),
                  ("temp_1", frames)]
        for name, video in videos:
            base = os.path.join(output_dir, f"{name}_{ts}")
            save_gif(video, base + ".gif")
            paths[f"{name}_gif"] = base + ".gif"
            paths[f"{name}_mp4"] = save_mp4(video, base + ".mp4")
            os.makedirs(base, exist_ok=True)
            import PIL.Image

            for i, f in enumerate(video):
                PIL.Image.fromarray(f).save(os.path.join(base, f"{i}.png"))
            if tracks is not None:
                np.save(base + ".npy", tracks.astype(np.float16))
                paths[f"{name}_npy"] = base + ".npy"
        combined = np.concatenate([videos[0][1], videos[1][1]], axis=2)
        paths["gif"] = os.path.join(output_dir, "vis_gif.gif")
        save_gif(combined, paths["gif"])
        return frames, tracks, paths


def build_demo(drag: Drag, output_dir: str = "outputs"):
    """Gradio Blocks UI — full app_org.py:660-783 feature set."""
    import gradio as gr

    with gr.Blocks() as demo:
        gr.Markdown("""<h1 align="center">Framer (TPU): Interactive Frame """
                    """Interpolation</h1><br>""")
        gr.Markdown(USAGE_MD)

        first_state = gr.State(None)   # working-size u8 arrays
        end_state = gr.State(None)
        tracking_points = gr.State([])

        with gr.Row():
            with gr.Column(scale=1):
                image_upload_button = gr.UploadButton(
                    label="Upload Start Image", file_types=["image"])
                image_end_upload_button = gr.UploadButton(
                    label="Upload End Image", file_types=["image"])
                add_drag_button = gr.Button(value="Add New Drag Trajectory")
                reset_button = gr.Button(value="Reset")
                run_button = gr.Button(value="Run")
                delete_last_drag_button = gr.Button(value="Delete last drag")
                delete_last_step_button = gr.Button(value="Delete last step")
            with gr.Column(scale=7):
                with gr.Row():
                    input_image = gr.Image(label="start frame", height=drag.height,
                                           width=drag.width, sources=[])
                    input_image_end = gr.Image(label="end frame", height=drag.height,
                                               width=drag.width, sources=[])
        with gr.Row():
            with gr.Column(scale=1):
                controlnet_cond_scale = gr.Slider(
                    label="Control Scale", minimum=0.0, maximum=10, step=0.1,
                    value=1.0)
                motion_bucket_id = gr.Slider(
                    label="Motion Bucket", minimum=1, maximum=180, step=1,
                    value=100)
            with gr.Column(scale=5):
                output_video = gr.Image(label="Output Video",
                                        height=drag.height, width=2 * drag.width)

        def _upload(file, prefix):
            arr, _ = preprocess_upload(file.name, drag.width, drag.height,
                                       output_dir, prefix)
            return arr, arr, []

        image_upload_button.upload(
            lambda f: _upload(f, "first_frame"), image_upload_button,
            [input_image, first_state, tracking_points])
        image_end_upload_button.upload(
            lambda f: _upload(f, "last_frame"), image_end_upload_button,
            [input_image_end, end_state, tracking_points])

        add_drag_button.click(add_drag, tracking_points, tracking_points)

        delete_last_drag_button.click(
            delete_last_drag, [tracking_points, first_state, end_state],
            [tracking_points, input_image, input_image_end])
        delete_last_step_button.click(
            delete_last_step, [tracking_points, first_state, end_state],
            [tracking_points, input_image, input_image_end])

        def _reset(first, end):
            return [], first, end

        reset_button.click(_reset, [first_state, end_state],
                           [tracking_points, input_image, input_image_end])

        def _click(tracks, first, end, evt: gr.SelectData):
            return add_tracking_point(tracks, evt.index, first, end)

        input_image.select(_click, [tracking_points, first_state, end_state],
                           [tracking_points, input_image, input_image_end])
        input_image_end.select(_click, [tracking_points, first_state, end_state],
                               [tracking_points, input_image, input_image_end])

        def _run(first, end, tracks, scale, bucket):
            _, _, paths = drag.run(first, end, user_tracks=tracks or None,
                                   controlnet_cond_scale=scale,
                                   motion_bucket_id=int(bucket),
                                   output_dir=output_dir)
            return paths["gif"]

        run_button.click(_run, [first_state, end_state, tracking_points,
                                controlnet_cond_scale, motion_bucket_id],
                         output_video)
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
