"""Gradio drag app parity (app_org.py:301-783) — headless: state handlers
(add/delete drag, delete step, click-to-add with overlays), trajectory
overlay rendering, upload preprocessing, and the full Drag.run output
contract (temp_0/temp_1 gif+mp4+npy+frame dirs, vis_gif.gif)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from tvi.apps.gradio_app import (
    Drag,
    add_drag,
    add_tracking_point,
    delete_last_drag,
    delete_last_step,
    draw_trajectory_overlay,
    heatmap_vis_video,
    preprocess_upload,
)


@pytest.fixture()
def imgs():
    rs = np.random.RandomState(0)
    return (rs.randint(0, 255, (320, 512, 3), np.uint8),
            rs.randint(0, 255, (320, 512, 3), np.uint8))


class TestHandlers:
    def test_add_and_click_updates_both_overlays(self, imgs):
        first, end = imgs
        tracks = add_drag([])
        assert tracks == [[]]
        tracks, ov1, ov2 = add_tracking_point(tracks, (100, 50), first, end)
        assert tracks == [[[100, 50]]]
        # single point draws a filled red circle on both images
        assert not np.array_equal(ov1, first)
        assert not np.array_equal(ov2, end)
        assert ov1[50, 100, 0] > ov1[50, 100, 1]  # red dominant

        tracks, ov1, _ = add_tracking_point(tracks, (200, 80), first, end)
        assert tracks == [[[100, 50], [200, 80]]]
        # a line segment now exists between the points
        mid = ov1[65, 150]
        assert mid[0] > mid[1]

    def test_delete_last_step_and_drag(self, imgs):
        first, end = imgs
        tracks = [[[10, 10], [50, 50]], [[100, 100]]]
        tracks2, _, _ = delete_last_step(tracks, first, end)
        assert tracks2 == [[[10, 10], [50, 50]], []]
        tracks3, ov, _ = delete_last_drag(tracks2, first, end)
        assert tracks3 == [[[10, 10], [50, 50]]]
        # deleting everything restores the clean image
        tracks4, ov, _ = delete_last_drag(tracks3, first, end)
        assert tracks4 == []
        np.testing.assert_array_equal(ov, first)

    def test_handlers_do_not_mutate_input_state(self, imgs):
        first, end = imgs
        state = [[[1, 2]]]
        add_tracking_point(state, (5, 6), first, end)
        delete_last_step(state, first, end)
        delete_last_drag(state, first, end)
        assert state == [[[1, 2]]]

    def test_preprocess_upload_resizes_and_saves(self, tmp_path):
        import PIL.Image

        src = tmp_path / "in.png"
        PIL.Image.fromarray(np.zeros((64, 100, 3), np.uint8)).save(src)
        arr, saved = preprocess_upload(str(src), 512, 320, str(tmp_path),
                                       "first_frame")
        assert arr.shape == (320, 512, 3)
        assert os.path.basename(saved).startswith("first_frame_")
        assert os.path.exists(saved)

    def test_heatmap_vis_is_jet_colormapped(self):
        tracks = np.tile(np.asarray([[64.0, 32.0]]), (4, 1, 1))
        vis = heatmap_vis_video(tracks, 128, 64)
        assert vis.shape == (4, 64, 128, 3)
        # JET maps zeros to blue, peak to red-ish: the frame must be colored
        assert vis[0, :, :, 2].max() > 0

    def test_overlay_arrowhead_on_last_segment(self, imgs):
        first, _ = imgs
        ov = draw_trajectory_overlay(first, [[[10, 10], [60, 10], [110, 10]]])
        assert not np.array_equal(ov, first)


class TestDragRun:
    @pytest.fixture(scope="class")
    def drag(self):
        from tvi.core.config import TINY_UNET

        return Drag(height=16, width=16, num_frames=TINY_UNET.num_frames,
                    tiny=True)

    def test_run_with_user_tracks_writes_reference_artifacts(self, drag, tmp_path):
        rs = np.random.RandomState(1)
        first = rs.randint(0, 255, (16, 16, 3), np.uint8)
        end = rs.randint(0, 255, (16, 16, 3), np.uint8)
        frames, tracks, paths = drag.run(
            first, end, user_tracks=[[[4, 4], [10, 10]]], steps=2,
            output_dir=str(tmp_path))
        assert frames.shape[0] == drag.num_frames
        assert tracks.shape == (drag.num_frames, 1, 2)
        for key in ("temp_0_gif", "temp_0_mp4", "temp_0_npy",
                    "temp_1_gif", "temp_1_mp4", "temp_1_npy", "gif"):
            assert key in paths and os.path.exists(paths[key]), key
        # frame dirs exist with per-frame PNGs (reference create_gif)
        frame_dir = paths["temp_1_gif"][:-len(".gif")]
        assert os.path.exists(os.path.join(frame_dir, "0.png"))
        # npy holds (F, N, 2) float16 like the committed reference outputs
        npy = np.load(paths["temp_1_npy"])
        assert npy.dtype == np.float16 and npy.shape == (drag.num_frames, 1, 2)

    def test_run_without_tracks_falls_back(self, drag, tmp_path):
        # flat images -> SIFT finds nothing -> no control branch
        img = np.full((16, 16, 3), 127, np.uint8)
        frames, tracks, paths = drag.run(img, img, steps=2,
                                         output_dir=str(tmp_path))
        assert frames.shape[0] == drag.num_frames
        assert tracks is None
        assert os.path.exists(paths["gif"])
