"""Tests for the control module (heatmaps, tracks, point tracking, SIFT)
and the app entry points."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.control.heatmap import gaussian_heatmap_template, render_heatmap_video
from tvi.control.tracks import interpolate_trajectory, load_track_file, point_tracking


class TestHeatmap:
    def test_template_matches_reference_math(self):
        t = gaussian_heatmap_template()
        assert t.shape == (200, 200)
        assert t.dtype == np.uint8
        assert t[100, 100] == 255           # peak at center
        assert t[0, 0] == 0                 # circle-masked corner
        # radial monotonicity along the axis
        row = t[100].astype(int)
        assert row[100] >= row[120] >= row[140] >= row[160]

    def test_render_video(self):
        tracks = np.asarray([[[10, 10]], [[20, 15]], [[30, 20]]], np.float32)
        video = render_heatmap_video(tracks, 64, 48, side=8)
        assert video.shape == (3, 48, 64, 3)
        # brightest spot follows the track
        for f, (x, y) in enumerate([(10, 10), (20, 15), (30, 20)]):
            yy, xx = np.unravel_index(video[f, ..., 0].argmax(),
                                      video[f, ..., 0].shape)
            assert abs(xx - x) <= 2 and abs(yy - y) <= 2

    def test_out_of_bounds_points_skipped(self):
        tracks = np.asarray([[[-5, 10]], [[100, 10]]], np.float32)
        video = render_heatmap_video(tracks, 64, 48)
        assert float(video.max()) == 0.0


class TestTracks:
    def test_pchip_endpoints_and_monotone(self):
        sparse = np.asarray([[[0, 0]], [[10, 20]]], np.float32)
        out = interpolate_trajectory(sparse, 7)
        assert out.shape == (7, 1, 2)
        np.testing.assert_allclose(out[0, 0], [0, 0], atol=1e-5)
        np.testing.assert_allclose(out[-1, 0], [10, 20], atol=1e-5)
        assert np.all(np.diff(out[:, 0, 0]) >= -1e-6)

    def test_track_file(self, tmp_path):
        p = tmp_path / "track.txt"
        p.write_text("10,10\n50,20\n5,5\n6,6\n")
        tracks = load_track_file(str(p), 100, 100, 14)
        assert tracks.shape == (14, 2, 2)
        np.testing.assert_allclose(tracks[0, 0], [10, 10], atol=1e-4)
        np.testing.assert_allclose(tracks[-1, 0], [50, 20], atol=1e-4)

    def test_point_tracking_finds_moved_feature(self, rng):
        c, h, w = 8, 32, 32
        f0 = jax.random.normal(rng, (c, h, w))
        # shift features right by 3: the point at (x=10,y=12) in f0 appears
        # at (x=13,y=12) in f1
        f1 = jnp.roll(f0, 3, axis=2)
        pts = jnp.asarray([[10.0, 12.0]])
        out = point_tracking(f0, f1, pts, pts, track_dist=5)
        np.testing.assert_allclose(np.asarray(out), [[13.0, 12.0]], atol=0)


class TestSift:
    def test_sift_on_structured_images(self):
        cv2 = pytest.importorskip("cv2")
        from tvi.control.sift import sift_match

        rs = np.random.RandomState(0)
        img = (rs.rand(128, 128, 3) * 255).astype(np.uint8)
        img = cv2.GaussianBlur(img, (5, 5), 1)
        shifted = np.roll(img, 7, axis=1)
        pts = sift_match(img, shifted, topk=3)
        if pts is not None:  # SIFT may find nothing on synthetic noise
            assert pts.shape[0] == 2 and pts.shape[2] == 2

    def test_sift_none_on_flat_images(self):
        from tvi.control.sift import sift_match

        img = np.zeros((64, 64, 3), np.uint8)
        assert sift_match(img, img) is None


class TestSlerpApp:
    def test_cli(self, tmp_path):
        import PIL.Image

        from tvi.apps.slerp_interp import main

        a = tmp_path / "a.png"
        b = tmp_path / "b.png"
        PIL.Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(a)
        PIL.Image.fromarray(np.full((32, 32, 3), 255, np.uint8)).save(b)
        out = tmp_path / "out"
        main(["--image_0", str(a), "--image_1", str(b), "--output_dir",
              str(out), "--tiny", "--size", "32", "--num_intermediate", "3"])
        assert sorted(os.listdir(out)) == [
            "frame_00.png", "frame_01.png", "frame_02.png", "frame_03.png",
            "frame_04.png", "slerp.gif"]


class TestAttnCsv:
    def test_csv_schema(self, tmp_path):
        from tvi.apps.test_sweep import write_attn_csvs

        records = [{"mod_a": (np.asarray([1.0, 2.0]), np.asarray([3.0, 4.0])),
                    "mod_b": (np.asarray([5.0, 6.0]), np.asarray([7.0, 8.0]))}]
        write_attn_csvs(records, str(tmp_path))
        lines = open(tmp_path / "unet_cross_anal.csv").read().splitlines()
        assert lines[0] == "frame_idx,FirstFrame_sim,EndFrame_sim"
        assert len(lines) == 3
        total = open(tmp_path / "unet_cross_anal_total.csv").read().splitlines()
        assert total[0] == "module_name,FirstFrame_sim,EndFrame_sim"
        assert len(total) == 3
